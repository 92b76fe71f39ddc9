"""Hardware validation + marginal timing of the sep-tree decode pipeline.

Encodes the bench corpus with the class-separated throughput tree
(ops/septree), checks one stream with zlib.decompress, runs the sep decode
kernel (repack -> _kernel_sep -> bpos + Adler verify on device), and times
both decode kernels marginally at the bench geometry.  Also reports the
size delta vs the trained tree.

Run: python bench/probe_sep.py
"""

from __future__ import annotations

import os
import sys
import time
import zlib

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("FDN_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from fdeflate_tpu.ops.repack import stage_wwin
from fdeflate_tpu.ops.septree import sep_profile
from fdeflate_tpu.ops.ultrafast_kernel import finalize_streams
from fdeflate_tpu.parallel.device_pipeline import (
    zlib_decode_step,
    zlib_encode_step,
)

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


def main():
    B = int(os.environ.get("PB_B", "16"))
    N = int(os.environ.get("PB_N", str(1 << 20)))
    C = int(os.environ.get("PB_C", "512"))
    reps = int(os.environ.get("PB_REPS", "8"))
    R = int(os.environ.get("PB_R", "4"))
    S = N // C

    import importlib.util as _u

    spec = _u.spec_from_file_location("benchmod", "/root/repo/bench.py")
    bm = _u.module_from_spec(spec)
    spec.loader.exec_module(bm)
    data = bm.make_idat_corpus(B, N)
    d = jax.device_put(jnp.asarray(data))
    lengths = jax.device_put(jnp.asarray(np.full(B, N, np.int32)))
    stamp(f"backend={jax.default_backend()} B={B} N={N} C={C} R={R}")

    tree = sep_profile()
    enc_sep = jax.jit(zlib_encode_step(C, tree=tree))
    enc_std = jax.jit(zlib_encode_step(C))

    out_sep = [jax.block_until_ready(x) for x in enc_sep(d, lengths)]
    out_std = [jax.block_until_ready(x) for x in enc_std(d, lengths)]
    bits_sep = np.asarray(out_sep[1]).astype(np.int64)
    bits_std = np.asarray(out_std[1]).astype(np.int64)
    stamp(f"size delta sep vs trained: "
          f"{(bits_sep.sum() / bits_std.sum() - 1) * 100:+.2f}% "
          f"({bits_sep.sum()//8} vs {bits_std.sum()//8} bytes)")

    s0 = finalize_streams(np.asarray(out_sep[0][:1]),
                          np.asarray(out_sep[1][:1]),
                          np.asarray(out_sep[2][:1]))[0]
    ok = zlib.decompress(s0) == data[0].tobytes()
    stamp(f"sep artifact zlib.decompress ok: {ok}")

    def run_decode(tree_arg, outs, wwin):
        dec = zlib_decode_step(C, N, wwin, U=32, R=R, tree=tree_arg)

        @jax.jit
        def verify(words, starts, eof, adler, lengths):
            out_sm, bpos_ok, ck_ok = dec(words, starts, eof, adler, lengths)
            return (jnp.sum(bpos_ok.astype(jnp.int32)),
                    jnp.sum(ck_ok.astype(jnp.int32)))

        words, bits, adler, starts, eof = outs
        okb, okc = (int(np.asarray(x)) for x in
                    verify(words, starts, eof, adler, lengths))
        stamp(f"  bpos_ok {okb}/{B}  ck_ok {okc}/{B}")

        def make(r):
            @jax.jit
            def g(words, starts, eof, adler, lengths):
                def body(k, acc):
                    w2 = words.at[0, -1].add(acc & 1)
                    out_sm, b_ok, c_ok = dec(w2, starts, eof, adler,
                                             lengths)
                    return acc + jnp.sum(b_ok.astype(jnp.int32)) + jnp.sum(
                        c_ok.astype(jnp.int32))

                return jax.lax.fori_loop(0, r, body, jnp.int32(0))

            return g

        def wall(f):
            _ = int(np.asarray(f(words, starts, eof, adler, lengths)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _ = int(np.asarray(f(words, starts, eof, adler, lengths)))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1 = wall(make(1))
        tR = wall(make(reps))
        m = (tR - t1) / (reps - 1)
        stamp(f"  decode wall(1) {t1*1e3:7.1f} ms  marginal {m*1e3:7.2f} ms"
              f"  ({B*N/m/1e9:5.2f} GB/s)")
        return m

    max_bits_sep = int(np.asarray(jnp.max(jnp.diff(jnp.concatenate(
        [out_sep[3], out_sep[4][:, None]], axis=1)))))
    wwin_sep = min(stage_wwin(S),
                   stage_wwin(S, cap_bits_per_byte=max_bits_sep / S + 0.26))
    stamp(f"sep decode (kernel _kernel_sep, wwin={wwin_sep}):")
    run_decode(tree, out_sep, wwin_sep)

    max_bits_std = int(np.asarray(jnp.max(jnp.diff(jnp.concatenate(
        [out_std[3], out_std[4][:, None]], axis=1)))))
    wwin_std = min(stage_wwin(S),
                   stage_wwin(S, cap_bits_per_byte=max_bits_std / S + 0.26))
    stamp(f"v2 decode (trained tree, wwin={wwin_std}):")
    run_decode(None, out_std, wwin_std)


if __name__ == "__main__":
    main()
