"""Marginal-cost stage breakdown of the LINEAR (standard-zlib) encoder.

probe_floor.py measured the full encode leg at 46 ms marginal (16 MiB,
0.364 GB/s) — the headline bottleneck.  This probe times cumulative stage
prefixes with the same in-program-repetition methodology to find where
the 46 ms lives.  Suspects: the four [B, N] scans (cummax/cummin run
segmentation, cumsum bit positions, cummin chunk index) each lower to
~log2(N) full passes, and the two segment-sum scatters.

Run: python bench/probe_encmarg.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("FDN_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from fdeflate_tpu.ops import ultrafast_kernel as UK
from fdeflate_tpu.models.ultrafast import STREAM_HEADER_BITS

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


def main():
    B = int(os.environ.get("PB_B", "16"))
    N = int(os.environ.get("PB_N", str(1 << 20)))
    C = int(os.environ.get("PB_C", "512"))
    S = N // C
    reps = int(os.environ.get("PB_REPS", "8"))
    import importlib.util as _u

    spec = _u.spec_from_file_location("benchmod", "/root/repo/bench.py")
    bm = _u.module_from_spec(spec)
    spec.loader.exec_module(bm)
    data = bm.make_idat_corpus(B, N)
    d = jax.device_put(jnp.asarray(data))
    lengths = jax.device_put(jnp.asarray(np.full(B, N, np.int32)))
    stamp(f"backend={jax.default_backend()} B={B} N={N} C={C} reps={reps}")

    def fold(x):
        x = x.astype(jnp.int32).reshape(-1)
        return jnp.sum(x[:: 997])

    def wall(f, *args):
        _ = int(np.asarray(f(*args)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(np.asarray(f(*args)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def marg(name, leg):
        def make(r):
            @jax.jit
            def g(d, lengths):
                def body(k, acc):
                    d2 = d.at[0, 0].add((acc & 1).astype(d.dtype))
                    return acc + leg(d2, lengths)

                return jax.lax.fori_loop(0, r, body, jnp.int32(0))

            return g

        t1 = wall(make(1), d, lengths)
        tR = wall(make(reps), d, lengths)
        m = (tR - t1) / (reps - 1)
        stamp(f"{name}: marginal {m*1e3:7.2f} ms  ({B*N/m/1e9:5.2f} GB/s)")

    i32, u32 = jnp.int32, jnp.uint32

    def leg_assign(d2, ln):
        v, nb, at_extra, aligned = UK._assign_tokens(d2, ln, True, S)
        return fold(v) + fold(nb) + fold(at_extra)

    def leg_cumsum(d2, ln):
        v, nb, at_extra, aligned = UK._assign_tokens(d2, ln, True, S)
        cum = jnp.cumsum(nb, axis=1)
        return fold(v) + fold(cum) + fold(at_extra)

    def leg_scatter(d2, ln):
        v, nb, at_extra, aligned = UK._assign_tokens(d2, ln, True, S)
        cum = jnp.cumsum(nb, axis=1)
        v0 = v[:, 0::2].astype(u32)
        v1 = v[:, 1::2].astype(u32)
        n0 = nb[:, 0::2]
        n1 = nb[:, 1::2]
        vp = (v0 | (v1 << n0.astype(u32))).astype(u32)
        npair = n0 + n1
        positions = STREAM_HEADER_BITS + cum[:, 1::2] - npair
        W = (13 * N + STREAM_HEADER_BITS + 16 + 31) // 32 + 2
        wi = positions >> 5
        sh = (positions & 31).astype(u32)
        lo = (vp << sh).astype(u32)
        hi = ((vp >> 1) >> (31 - sh).astype(u32)).astype(u32)
        valid = npair > 0
        Np = N // 2
        row = jax.lax.broadcasted_iota(i32, (B, Np), 0)
        flat = row * W + wi
        words = jax.ops.segment_sum(
            jnp.where(valid, lo.astype(i32), 0).reshape(-1),
            flat.reshape(-1), num_segments=B * W, indices_are_sorted=True)
        words = words + jax.ops.segment_sum(
            jnp.where(valid, hi.astype(i32), 0).reshape(-1),
            (flat + 1).reshape(-1), num_segments=B * W,
            indices_are_sorted=True)
        return fold(words)

    def leg_full(d2, ln):
        w, bits, adler, starts, eof = UK.encode_ultrafast_batch(
            d2, ln, num_chunks=C, fixed_geometry=True, return_eof=True)
        return (fold(w) + jnp.sum(bits) + jnp.sum(adler.astype(i32))
                + jnp.sum(starts[:, -1]))

    def leg_noindex(d2, ln):
        w, bits, adler = UK.encode_ultrafast_batch(d2, ln)
        return fold(w) + jnp.sum(bits) + jnp.sum(adler.astype(i32))

    def leg_adler(d2, ln):
        return fold(UK.adler32_batch(d2, ln))

    def leg_blocked_kernel(d2, ln):
        win, bits, adler = UK.encode_ultrafast_blocked(
            d2, ln, C, kernel_pack=True)
        return fold(win) + jnp.sum(bits) + jnp.sum(adler.astype(i32))

    def leg_blocked_xla(d2, ln):
        win, bits, adler = UK.encode_ultrafast_blocked(
            d2, ln, C, kernel_pack=False)
        return fold(win) + jnp.sum(bits) + jnp.sum(adler.astype(i32))

    marg("assign_tokens        ", leg_assign)
    marg("+cumsum              ", leg_cumsum)
    marg("+pair+scatter        ", leg_scatter)
    marg("adler alone          ", leg_adler)
    marg("full (no index)      ", leg_noindex)
    marg("full (+chunk index)  ", leg_full)
    marg("blocked kernel-pack  ", leg_blocked_kernel)
    marg("blocked xla-pack     ", leg_blocked_xla)


if __name__ == "__main__":
    main()
