"""Hardware validation + timing of the DMA repack kernel (ops/repack).

Checks the Pallas DMA staging kernel against the XLA gather oracle ON
DEVICE (scalar readback only — the ~20 MB/s tunnel forbids array
downloads), then times:

  * the repack kernel alone,
  * the full standard-zlib decode leg (repack -> v2 kernel -> verify),
  * the fused encode->zlib-artifact->decode roundtrip.

Env: PB_B/PB_N/PB_C geometry, PB_WWIN window words (0 = worst case),
PB_U/PB_R decode kernel knobs.
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

from fdeflate_tpu.ops import repack as RP
from fdeflate_tpu.ops import ultrafast_kernel as UK
from fdeflate_tpu.ops.pallas_decode2 import adler_step_major, decode_blocked

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


def timeit(name, f, *args, repeats=3):
    _ = np.asarray(jax.block_until_ready(f(*args)))
    ts = []
    for _ in range(repeats):
        t = time.perf_counter()
        _ = np.asarray(jax.block_until_ready(f(*args)))
        ts.append(time.perf_counter() - t)
    stamp(f"{name}: {min(ts)*1e3:.1f} ms")
    return min(ts)


def main():
    B = int(os.environ.get("PB_B", "16"))
    N = int(os.environ.get("PB_N", str(1 << 20)))
    C = int(os.environ.get("PB_C", "512"))
    U = int(os.environ.get("PB_U", "32"))
    R = int(os.environ.get("PB_R", "4"))
    S = N // C
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import importlib.util as _u
    spec = _u.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bm = _u.module_from_spec(spec)
    spec.loader.exec_module(bm)
    data = bm.make_idat_corpus(B, N)
    d = jax.device_put(jnp.asarray(data))
    lengths = jax.device_put(jnp.asarray(np.full(B, N, np.int32)))
    stamp(f"start backend={jax.default_backend()} B={B} N={N} C={C} S={S}")

    enc = jax.jit(lambda d, ln: UK.encode_ultrafast_batch(
        d, ln, num_chunks=C, fixed_geometry=True, return_eof=True))
    words, tb, adler, starts, eof = jax.block_until_ready(enc(d, lengths))
    chunk_bits = np.asarray(
        jnp.max(jnp.diff(jnp.concatenate([starts, eof[:, None]], axis=1))))
    stamp(f"max chunk bits {int(chunk_bits)} "
          f"({int(chunk_bits)/S:.2f} b/B); worst {13*S}")

    wwin_env = int(os.environ.get("PB_WWIN", "0"))
    wwin_worst = RP.stage_wwin(S)
    wwins = [wwin_worst] if not wwin_env else [wwin_env]
    if not wwin_env:
        # measured cap, rounded up one slab
        w_meas = (int(chunk_bits) + 63) // 32 + 2
        w_meas += (-w_meas) % 128
        if w_meas < wwin_worst:
            wwins.append(w_meas)

    for wwin in wwins:
        stamp(f"--- wwin={wwin} ---")
        # Correctness: DMA kernel vs XLA oracle, on device.
        kern = jax.jit(lambda w, s: RP.stage_blocked_from_linear(
            w, s, C, wwin, interpret=False))
        orac = jax.jit(lambda w, s: RP._stage_xla(w, s, C, wwin))
        wk = jax.block_until_ready(kern(words, starts))
        wo = jax.block_until_ready(orac(words, starts))
        diff = int(np.asarray(jnp.sum(
            (wk != wo).astype(jnp.int32)))) if True else 0
        stamp(f"kernel vs oracle mismatched words: {diff}")
        del wo

        @jax.jit
        def stage_scalar(w, s):
            win = RP.stage_blocked_from_linear(w, s, C, wwin, interpret=False)
            return jnp.sum(win[:, ::64, :, ::16])

        t_stage = timeit("stage kernel", stage_scalar, words, starts)

        @jax.jit
        def stage_xla_scalar(w, s):
            win = RP._stage_xla(w, s, C, wwin)
            return jnp.sum(win[:, ::64, :, ::16])

        timeit("stage XLA oracle", stage_xla_scalar, words, starts)

        @jax.jit
        def dec_scalar(w, s, e, a, ln):
            win = RP.stage_blocked_from_linear(w, s, C, wwin, interpret=False)
            out_sm, bpos = decode_blocked(win, T=S // 4, U=U,
                                          lane_major=False, R=R)
            L = B * C
            bp = bpos.reshape(-1)[:L].reshape(B, C)
            expected = jnp.concatenate([s[:, 1:], e[:, None]], axis=1) - s
            offs = jnp.arange(C, dtype=jnp.int32)[None, :] * S
            full = offs + S <= ln.astype(jnp.int32)[:, None]
            bpos_ok = jnp.all((bp == expected) | ~full, axis=1)
            ck = adler_step_major(out_sm, B, C, S, ln)
            return (jnp.sum(bpos_ok.astype(jnp.int32)),
                    jnp.sum((ck == a).astype(jnp.int32)))

        ok = dec_scalar(words, starts, eof, adler, lengths)
        okv = [int(np.asarray(x)) for x in ok]
        stamp(f"decode leg verify: bpos_ok={okv[0]}/{B} ck_ok={okv[1]}/{B}")
        t_dec = timeit("decode leg (stage+kernel+verify)",
                       lambda w, s, e, a, ln: dec_scalar(w, s, e, a, ln)[0],
                       words, starts, eof, adler, lengths)
        stamp(f"decode leg: {B*N/t_dec/1e9:.3f} GB/s "
              f"(stage alone {B*N/t_stage/1e9:.3f} GB/s)")


if __name__ == "__main__":
    main()
