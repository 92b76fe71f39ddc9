"""Split s3 of the ROUND-3 encode pipeline (slab-relative pack).

probe_encstages attributes ~23.4 ms of the 28.8 ms encode to
"corner turn + DMA combine"; this probe separates the two and sweeps the
output-width hint (the combine grid is one cell per output slab, and the
default W is the 13-bits/byte worst case -> 6660 slabs at the bench
geometry while the real payload is ~4x smaller).

Run: python bench/probe_turncombine.py
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
from fdeflate_tpu.ops.pallas_assign import assign_tokens_blocked
from fdeflate_tpu.ops.pallas_pack import pack_blocked_pallas_v2
from fdeflate_tpu.ops.pallas_decode2 import corner_turn
from fdeflate_tpu.ops.repack import linear_from_rows

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


def main():
    B = int(os.environ.get("PB_B", "16"))
    N = int(os.environ.get("PB_N", str(1 << 20)))
    C = int(os.environ.get("PB_C", "512"))
    reps = int(os.environ.get("PB_REPS", "8"))
    S = N // C

    import importlib.util as _u

    spec = _u.spec_from_file_location("benchmod", "/root/repo/bench.py")
    bm = _u.module_from_spec(spec)
    spec.loader.exec_module(bm)
    data = bm.make_idat_corpus(B, N)
    d = jax.device_put(jnp.asarray(data))
    lengths = jax.device_put(jnp.asarray(np.full(B, N, np.int32)))
    stamp(f"backend={jax.default_backend()} B={B} N={N} C={C} S={S}")

    def fold(*xs):
        acc = jnp.int32(0)
        for x in xs:
            acc = acc + jnp.sum(x.astype(jnp.int32).reshape(-1)[::997])
        return acc

    def marg(name, body_fn):
        def make(r):
            @jax.jit
            def g(d, lengths):
                def body(k, acc):
                    d2 = d.at[0, 0].add((acc & 1).astype(d.dtype))
                    return acc + body_fn(d2, lengths)

                return jax.lax.fori_loop(0, r, body, jnp.int32(0))

            return g

        def wall(f):
            _ = int(np.asarray(f(d, lengths)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _ = int(np.asarray(f(d, lengths)))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1 = wall(make(1))
        tR = wall(make(reps))
        m = (tR - t1) / (reps - 1)
        stamp(f"{name}: wall(1) {t1*1e3:7.1f} ms  marginal {m*1e3:7.2f} ms"
              f"  ({B*N/m/1e9:5.2f} GB/s)")
        return m

    L = B * C
    LB = -(-L // 1024)
    Lp = LB * 1024
    i32 = jnp.int32

    def prefix(d2, ln):
        """assign + pack -> (rows after corner turn inputs)."""
        tok, relp, npair, chunk_bits = assign_tokens_blocked(d2, ln, C)
        csum = jnp.cumsum(chunk_bits, axis=1)
        pos0 = UK.STREAM_HEADER_BITS + csum - chunk_bits
        orig = (pos0 >> 15) << 15
        off = (pos0 - orig).reshape(-1)
        if Lp > L:
            off = jnp.concatenate([off, jnp.zeros((Lp - L,), i32)])
        offr = off.reshape(LB, 8, 128)[:, None]
        win = pack_blocked_pallas_v2(tok, relp + offr, npair, 2048)
        return win, orig

    def s_pack(d2, ln):
        win, orig = prefix(d2, ln)
        return fold(win, orig)

    def s_turn(d2, ln):
        win, orig = prefix(d2, ln)
        rows = corner_turn(win)
        return fold(rows, orig)

    def make_combine(W):
        Wpad = W + (-W) % 1024
        nslabs = Wpad // 1024

        def s_comb(d2, ln):
            win, orig = prefix(d2, ln)
            rows = corner_turn(win).reshape(Lp, 2048)
            slab0 = (jnp.arange(B, dtype=i32)[:, None] * nslabs
                     + (orig >> 15)).reshape(-1)
            if Lp > L:
                slab0 = jnp.concatenate(
                    [slab0, jnp.full((Lp - L,), B * nslabs, i32)])
            out = linear_from_rows(rows, slab0, B * nslabs,
                                   H=2048 // 1024)
            return fold(out)

        return s_comb

    W_worst = (13 * N + UK.STREAM_HEADER_BITS + UK._EOF_BITS + 31) // 32 + 2
    marg("assign+pack (s2 ref)    ", s_pack)
    marg("+corner_turn            ", s_turn)
    marg(f"+combine W=worst({W_worst//1024}K) ", make_combine(W_worst))
    for bpb in (8, 6):
        W = (bpb * N + UK.STREAM_HEADER_BITS + UK._EOF_BITS + 31) // 32 + 2
        marg(f"+combine W={bpb}bpb({W//1024}K)   ", make_combine(W))


if __name__ == "__main__":
    main()
