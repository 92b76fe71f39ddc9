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


def correctness(B=4, N=65536, C=128):
    S = N // C
    data = make_idat(B, N)
    data[0, 5000:20000] = 0
    lengths = jnp.asarray(np.full(B, N, np.int32))
    win, chunk_bits, adler = encode_ultrafast_blocked(jnp.asarray(data), lengths, C)
    out, bpos = decode_blocked(win, T=S // 4, U=32, interpret=False)
    out = np.asarray(out)
    bpos = np.asarray(bpos)
    L = B * C
    decoded = out.reshape(-1, S // 4)[:L].astype("<i4").view(np.uint8).reshape(B, N)
    bp = bpos.reshape(-1)[:L].reshape(B, C)
    ok_bytes = bool((decoded == data).all())
    ok_bpos = bool((bp == np.asarray(chunk_bits)).all())
    print(f"correctness B{B} N{N} C{C}: bytes={ok_bytes} bpos={ok_bpos}")
    return ok_bytes and ok_bpos


def timing(B=16, N=1 << 20, C=512, U=64, repeats=4):
    S = N // C
    T = S // 4
    data = make_idat(B, N)
    lengths = jnp.asarray(np.full(B, N, np.int32))

    enc = jax.jit(lambda d, ln: encode_ultrafast_blocked(d, ln, C))
    d = jax.device_put(jnp.asarray(data))
    win, chunk_bits, adler = enc(d, lengths)
    jax.block_until_ready(win)

    dec = jax.jit(
        lambda w: decode_blocked(w, T=T, U=U, interpret=False)
    )

    @jax.jit
    def dec_scalar(w):
        out, bpos = decode_blocked(w, T=T, U=U, interpret=False)
        return jnp.sum(out), jnp.sum(bpos)

    s, bp = dec_scalar(win)
    _ = (int(s), int(bp))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = dec_scalar(win)
        _ = int(np.asarray(r[0]))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"decode {B}x{N>>20}MiB C={C} U={U}: {t*1e3:.1f} ms -> "
          f"{B*N/t/1e9:.2f} GB/s")

    # full verify on hardware once
    out, bpos = dec(win)
    L = B * C
    decoded = np.asarray(out).reshape(-1, T)[:L].astype("<i4").view(np.uint8).reshape(B, N)
    bp = np.asarray(bpos).reshape(-1)[:L].reshape(B, C)
    print("hw verify:", bool((decoded == data).all()),
          bool((bp == np.asarray(chunk_bits)).all()))


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    which = sys.argv[1:] or ["correct", "time"]
    if "correct" in which:
        correctness()
    if "time" in which:
        for U in (32, 64):
            timing(U=U)
