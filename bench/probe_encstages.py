"""Stage-marginal breakdown of the whole-kernel linear encode path.

The assign+pack encode measured 29.26 ms marginal per 16 MiB on hardware
(bench/probe_assign.py, 0.57 GB/s); this probe attributes that time to the
pipeline's stages so the next cut targets the real cost:

  s0  blocked_input                 (XLA: pad + corner-turn to lane rows)
  s1  + assign kernel               (pallas_assign)
  s2  + pack kernel                 (pallas_pack v2, slab-relative)
  s3  + corner turn + DMA combine   (repack.linear_from_rows)
  s4  + framing + adler             (= full _encode_linear_assign)

Each stage's fori-loop body folds a strided sample of every live output so
XLA cannot dead-code-eliminate the stage under test (the round-3 bench
lesson, bench/probe_encmarg.py).

Run: python bench/probe_encstages.py
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
from fdeflate_tpu.ops.pallas_assign import (
    assign_blocked_pallas,
    blocked_input,
)
from fdeflate_tpu.ops.ultrafast_kernel import adler32_batch

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

    def s0(d2, ln):
        in_words, meta = blocked_input(d2, ln, C)
        return fold(in_words, meta)

    def s1(d2, ln):
        in_words, meta = blocked_input(d2, ln, C)
        tok, relp, npair, bits = assign_blocked_pallas(in_words, meta, S)
        return fold(tok, relp, npair, bits)

    def s2(d2, ln):
        from fdeflate_tpu.ops.pallas_pack import pack_blocked_pallas_v2

        in_words, meta = blocked_input(d2, ln, C)
        tok, relp, npair, bits = assign_blocked_pallas(in_words, meta, S)
        win = pack_blocked_pallas_v2(tok, relp, npair, UK._PACK_WWIN)
        return fold(win, bits)

    def s3(d2, ln):
        # Everything except framing/adler: reproduce _encode_linear_assign
        # through _pack_linear_words (near-chunk-relative pack + log
        # word-shift + combine).
        from fdeflate_tpu.ops.pallas_assign import assign_tokens_blocked

        i32 = jnp.int32
        tok, relp, npair, chunk_bits = assign_tokens_blocked(d2, ln, C)
        csum = jnp.cumsum(chunk_bits, axis=1)
        pos0 = UK.STREAM_HEADER_BITS + csum - chunk_bits
        W = (13 * N + UK.STREAM_HEADER_BITS + UK._EOF_BITS + 31) // 32 + 2
        orig = (pos0 >> 15) << 15
        off = pos0 - orig
        subb = (off & 255).reshape(-1)
        L = B * C
        LB = -(-L // 1024)
        Lp = LB * 1024
        if Lp > L:
            subb = jnp.concatenate([subb, jnp.zeros((Lp - L,), i32)])
        subr = subb.reshape(LB, 8, 128)[:, None]
        words = UK._pack_linear_words(tok, relp + subr, npair, orig,
                                      (off >> 8) << 3, B, W)
        return fold(words, csum)

    def s4(d2, ln):
        w, bits, adler, starts, eof = UK.encode_ultrafast_batch(
            d2, ln, num_chunks=C, fixed_geometry=True, return_eof=True)
        return fold(w, bits, adler.astype(jnp.int32), starts)

    def s_adler(d2, ln):
        return fold(adler32_batch(d2, ln).astype(jnp.int32))

    marg("s0 blocked_input        ", s0)
    marg("s1 +assign kernel       ", s1)
    marg("s2 +pack kernel         ", s2)
    marg("s3 +turn+DMA combine    ", s3)
    marg("s4 full (frame+adler)   ", s4)
    marg("adler32_batch alone     ", s_adler)


if __name__ == "__main__":
    main()
