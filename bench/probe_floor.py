"""Quantify the sandbox dispatch floor and the TRUE (marginal) leg costs.

Every wall-clock timing on this platform pays a fixed per-launch cost
(tunnel dispatch + XLA host overhead), measured here with a trivial
program.  Leg costs are then measured by in-program repetition: a
lax.fori_loop runs the leg R times with a serial data dependency (one
element of the input depends on the previous iteration's result, so XLA
cannot hoist the loop-invariant body), and the marginal cost is
(t_R - t_1) / (R - 1).

Run: python bench/probe_floor.py
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

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


def wall(f, *args, repeats=5):
    _ = float(np.asarray(f(*args)))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(np.asarray(f(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def reps_wrap(leg, reps):
    """Run ``leg(data, lengths) -> scalar i32`` reps times with a serial
    dependency through the data so XLA cannot hoist the body."""

    @jax.jit
    def g(data, lengths):
        def body(k, acc):
            d2 = data.at[0, 0].add((acc & 1).astype(data.dtype))
            return acc + leg(d2, lengths)

        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    return g


def main():
    B = int(os.environ.get("PB_B", "16"))
    N = int(os.environ.get("PB_N", str(1 << 20)))
    C = int(os.environ.get("PB_C", "512"))
    S = N // C
    import importlib.util as _u

    spec = _u.spec_from_file_location("benchmod", "/root/repo/bench.py")
    bm = _u.module_from_spec(spec)
    spec.loader.exec_module(bm)
    data = bm.make_idat_corpus(B, N)
    d = jax.device_put(jnp.asarray(data))
    lengths = jax.device_put(jnp.asarray(np.full(B, N, np.int32)))
    stamp(f"backend={jax.default_backend()} B={B} N={N} C={C}")

    # --- dispatch floor ---------------------------------------------------
    tiny = jax.device_put(jnp.arange(128, dtype=jnp.int32))
    triv = jax.jit(lambda x: jnp.sum(x))
    t_floor = wall(triv, tiny, repeats=9)
    stamp(f"dispatch floor (trivial jit): {t_floor*1e3:.2f} ms")

    from fdeflate_tpu.ops.repack import stage_wwin
    from fdeflate_tpu.parallel.device_pipeline import (
        zlib_decode_step,
        zlib_encode_step,
    )

    enc = zlib_encode_step(C)

    def enc_leg(d2, ln):
        w, bits, adler, starts, eof = enc(d2, ln)
        return (jnp.sum(bits) + jnp.sum(adler.astype(jnp.int32))).astype(
            jnp.int32)

    # device-resident encoded artifacts for the decode leg
    enc_j = jax.jit(enc)
    words, bits, adler, starts, eof = (
        jax.block_until_ready(x) for x in enc_j(d, lengths))
    max_bits = int(np.asarray(jnp.max(
        jnp.diff(jnp.concatenate([starts, eof[:, None]], axis=1)))))
    wwin = min(stage_wwin(S), stage_wwin(S, max_bits / S + 0.26))
    stamp(f"max chunk bits {max_bits} -> wwin {wwin}")
    dec = zlib_decode_step(C, N, wwin,
                           U=int(os.environ.get("PB_U", "32")),
                           R=int(os.environ.get("PB_R", "4")))

    def dec_reps(reps):
        @jax.jit
        def g(words, starts, eof, adler, lengths):
            def body(k, acc):
                w2 = words.at[0, -1].add(acc & 1)  # slack word: inert
                out_sm, bpos_ok, ck_ok = dec(w2, starts, eof, adler, lengths)
                return acc + jnp.sum(bpos_ok.astype(jnp.int32)) + jnp.sum(
                    ck_ok.astype(jnp.int32))

            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        return g

    gb = B * N / 1e9
    for name, make, args in (
        ("encode", lambda r: reps_wrap(enc_leg, r), (d, lengths)),
        ("decode", dec_reps, (words, starts, eof, adler, lengths)),
    ):
        t1 = wall(make(1), *args)
        tR = wall(make(8), *args)
        marg = (tR - t1) / 7
        stamp(f"{name}: wall(1)={t1*1e3:7.2f} ms  wall(8)={tR*1e3:7.2f} ms"
              f"  marginal={marg*1e3:7.2f} ms -> {gb/marg:.3f} GB/s"
              f"  (wall-based {gb/t1:.3f})")


if __name__ == "__main__":
    main()
