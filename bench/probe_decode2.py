"""Hardware validation + timing for the v2 fixed-geometry decode kernel."""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_blocked
from fdeflate_tpu.ops.pallas_decode2 import decode_blocked
from fdeflate_tpu.parallel.device_pipeline import fused_ultrafast_roundtrip_v2


def make_idat(B, N, seed=0):
    rng = np.random.default_rng(seed)
    width = 1024
    rows = N // width + 1
    out = np.zeros((B, rows * width), np.uint8)
    for b in range(B):
        y = np.arange(rows)[:, None]
        x = np.arange(width)[None, :]
        base = 128 + 60 * np.sin(x / (50 + 10 * (b % 7)) + b) + 40 * np.cos(y / 37.0)
        noise = rng.normal(0, 2.0, (rows, width))
        flat = (x // 128 + y // 16) % 3 == 0
        img = np.where(flat, 200, base + noise).astype(np.uint8)
        sub = img - np.roll(img, 1, axis=1)
        sub[:, 0] = img[:, 0]
        out[b] = sub.reshape(-1)[: rows * width]
    return out[:, :N]


def correctness(B=4, N=65536, C=128, U=32):
    S = N // C
    data = make_idat(B, N)
    data[0, 5000:20000] = 0
    lengths = jnp.asarray(np.full(B, N, np.int32))
    win, chunk_bits, adler = encode_ultrafast_blocked(jnp.asarray(data), lengths, C)
    out_sm, bpos = decode_blocked(win, T=S // 4, U=U, interpret=False,
                                  lane_major=False)
    # host-side corner turn for the byte comparison
    out = np.asarray(out_sm)          # [LB, T, 8, 128]
    L = B * C
    lanes = np.ascontiguousarray(
        np.transpose(out, (0, 2, 3, 1)).reshape(-1, S // 4)[:L]
    )
    decoded = lanes.astype("<i4").view(np.uint8).reshape(B, N)
    bp = np.asarray(bpos).reshape(-1)[:L].reshape(B, C)
    ok_bytes = bool((decoded == data).all())
    ok_bpos = bool((bp == np.asarray(chunk_bits)).all())
    print(f"correctness B{B} N{N} C{C}: bytes={ok_bytes} bpos={ok_bpos}")
    return ok_bytes and ok_bpos


def timing(B=16, N=1 << 20, C=512, U=32, repeats=4):
    S = N // C
    data = make_idat(B, N)
    lengths = jnp.asarray(np.full(B, N, np.int32))
    d = jax.device_put(jnp.asarray(data))

    enc = jax.jit(lambda dd, ln: encode_ultrafast_blocked(dd, ln, C))

    @jax.jit
    def enc_scalar(dd, ln):
        win, cb, ad = encode_ultrafast_blocked(dd, ln, C)
        return jnp.sum(win), jnp.sum(cb)

    r = enc_scalar(d, lengths); _ = int(np.asarray(r[0]))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = enc_scalar(d, lengths); _ = int(np.asarray(r[0]))
        ts.append(time.perf_counter() - t0)
    t_enc = min(ts)
    print(f"encode_blocked {B}x{N>>20}MiB C={C}: {t_enc*1e3:.1f} ms "
          f"({B*N/t_enc/1e9:.2f} GB/s)")

    step = fused_ultrafast_roundtrip_v2(C, N, U=U)

    @jax.jit
    def fused_scalar(dd, ln):
        out_sm, bpos_ok, ck_ok = step(dd, ln)
        return (jnp.sum(bpos_ok.astype(jnp.int32)),
                jnp.sum(ck_ok.astype(jnp.int32)), jnp.sum(out_sm))

    r = fused_scalar(d, lengths)
    bp_ok, ck_ok = int(np.asarray(r[0])), int(np.asarray(r[1]))
    print(f"fused verify: bpos_ok {bp_ok}/{B} ck_ok {ck_ok}/{B}")
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = fused_scalar(d, lengths); _ = int(np.asarray(r[0]))
        ts.append(time.perf_counter() - t0)
    t_rt = min(ts)
    t_dec = max(t_rt - t_enc, t_rt * 0.02)
    print(f"fused roundtrip: {t_rt*1e3:.1f} ms -> decode+verify "
          f"{t_dec*1e3:.1f} ms ({B*N/t_dec/1e9:.2f} GB/s)")


def timing_decode_only(B=16, N=1 << 20, C=512, U=32, repeats=6):
    """Direct decode timing: pre-encode once, time decode_blocked alone."""
    S = N // C
    data = make_idat(B, N)
    lengths = jnp.asarray(np.full(B, N, np.int32))
    enc = jax.jit(lambda d, ln: encode_ultrafast_blocked(d, ln, C))
    win, chunk_bits, _ = enc(jnp.asarray(data), lengths)
    win = jax.block_until_ready(win)

    @jax.jit
    def dec_scalar(w):
        out_sm, bpos = decode_blocked(w, T=S // 4, U=U, lane_major=False)
        return jnp.sum(out_sm), jnp.sum(bpos)

    r = dec_scalar(win)
    _ = int(np.asarray(r[0]))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = dec_scalar(win)
        _ = int(np.asarray(r[0]))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"decode_only {B}x{N>>20}MiB C={C} U={U}: {t*1e3:.1f} ms "
          f"({B*N/t/1e9:.2f} GB/s)  [all repeats ms: "
          f"{', '.join(f'{x*1e3:.1f}' for x in ts)}]")


if __name__ == "__main__":
    import os

    print("backend:", jax.default_backend())
    which = sys.argv[1:] or ["correct", "time"]
    C = int(os.environ.get("PROBE_C", "512"))
    U = int(os.environ.get("PROBE_U", "32"))
    if "correct" in which:
        correctness()
    if "time" in which:
        timing(C=C, U=U)
    if "deconly" in which:
        timing_decode_only(C=C, U=U)
