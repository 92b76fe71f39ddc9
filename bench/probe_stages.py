"""Staged hardware probe: per-stage compile/run timing for the v2 pipeline.

Each stage prints a timestamped line as soon as it finishes, so a hung or
slow stage is identifiable from the log even if the process is killed.
Also exercises the persistent compilation cache (jax_compilation_cache_dir)
to check whether recompiles can be avoided across processes on this
platform.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

CACHE = os.environ.get("FDN_JAX_CACHE", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


def main():
    B = int(os.environ.get("PB_B", "4"))
    N = int(os.environ.get("PB_N", str(1 << 18)))
    C = int(os.environ.get("PB_C", "128"))
    U = int(os.environ.get("PB_U", "32"))
    S = N // C

    stamp(f"start backend={jax.default_backend()} B={B} N={N} C={C} S={S}")

    # stage 0: trivial op (device warmup / tunnel check)
    x = jnp.ones((128, 128), jnp.float32)
    _ = float(jnp.sum(x @ x))
    stamp("warmup matmul done")

    from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_blocked

    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (B, N), np.uint8)
    data[:, ::3] = 0  # some zero structure
    lengths = jnp.asarray(np.full(B, N, np.int32))
    d = jax.device_put(jnp.asarray(data))

    enc = jax.jit(lambda dd, ln: encode_ultrafast_blocked(dd, ln, C))
    t = time.perf_counter()
    win, cb, ad = enc(d, lengths)
    jax.block_until_ready(win)
    stamp(f"encode_blocked compile+run: {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    win, cb, ad = enc(d, lengths)
    jax.block_until_ready(win)
    stamp(f"encode_blocked steady: {(time.perf_counter()-t)*1e3:.1f} ms")

    from fdeflate_tpu.ops.pallas_decode2 import decode_blocked

    t = time.perf_counter()
    dec = jax.jit(
        lambda w: decode_blocked(w, T=S // 4, U=U, interpret=False,
                                 lane_major=False)
    )
    out_sm, bpos = dec(win)
    jax.block_until_ready(out_sm)
    stamp(f"decode_blocked compile+run: {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    out_sm, bpos = dec(win)
    jax.block_until_ready(out_sm)
    stamp(f"decode_blocked steady: {(time.perf_counter()-t)*1e3:.1f} ms "
          f"({B*N/(time.perf_counter()-t)/1e9:.2f} GB/s)")

    # correctness on this small case
    out = np.asarray(out_sm)
    L = B * C
    lanes = np.ascontiguousarray(
        np.transpose(out, (0, 2, 3, 1)).reshape(-1, S // 4)[:L]
    )
    decoded = lanes.astype("<i4").view(np.uint8).reshape(B, N)
    stamp(f"bytes equal: {bool((decoded == data).all())}")

    from fdeflate_tpu.parallel.device_pipeline import (
        fused_ultrafast_roundtrip_v2,
    )

    step = fused_ultrafast_roundtrip_v2(C, N, U=U)

    @jax.jit
    def fused_scalar(dd, ln):
        out_sm, bpos_ok, ck_ok = step(dd, ln)
        return (jnp.sum(bpos_ok.astype(jnp.int32)),
                jnp.sum(ck_ok.astype(jnp.int32)))

    t = time.perf_counter()
    r = fused_scalar(d, lengths)
    bp_ok, ck_ok = int(np.asarray(r[0])), int(np.asarray(r[1]))
    stamp(f"fused compile+run: {time.perf_counter()-t:.1f}s "
          f"bpos_ok={bp_ok}/{B} ck_ok={ck_ok}/{B}")
    ts = []
    for _ in range(3):
        t = time.perf_counter()
        r = fused_scalar(d, lengths)
        _ = int(np.asarray(r[0]))
        ts.append(time.perf_counter() - t)
    stamp(f"fused steady: {min(ts)*1e3:.1f} ms "
          f"({B*N/min(ts)/1e9:.2f} GB/s roundtrip)")


if __name__ == "__main__":
    main()
