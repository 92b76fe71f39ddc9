"""Hardware breakdown of repack staging pass 2 (DMA vs align vs transpose).

The repack decode leg measured ~52-62 ms at the bench geometry while the
slab DMA alone is ~0.06 ms marginal (bench/probe_dma.py) — this probe
times the XLA pass-2 stages to find where the rest goes.
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

T0 = time.perf_counter()


def main():
    B, N, C = 16, 1 << 20, 512
    import importlib.util as _u

    spec = _u.spec_from_file_location("benchmod", "/root/repo/bench.py")
    bm = _u.module_from_spec(spec)
    spec.loader.exec_module(bm)
    data = bm.make_idat_corpus(B, N)
    d = jax.device_put(jnp.asarray(data))
    lengths = jax.device_put(jnp.asarray(np.full(B, N, np.int32)))
    enc = jax.jit(lambda d, ln: UK.encode_ultrafast_batch(
        d, ln, num_chunks=C, fixed_geometry=True, return_eof=True))
    words, tb, adler, starts, eof = (
        jax.block_until_ready(x) for x in enc(d, lengths))
    wwin = int(os.environ.get("PB_WWIN", "256"))
    i32, u32 = jnp.int32, jnp.uint32
    SLAB = RP.SLAB
    W = words.shape[1]
    L = B * C
    LB = -(-L // 1024)
    Lp = LB * 1024
    wl = (wwin + 2 * SLAB) // SLAB * SLAB

    def prep(words, chunk_starts):
        Wpad = (W + SLAB - 1) // SLAB * SLAB
        wpad = jnp.pad(words.astype(i32), ((0, 0), (0, Wpad - W)))
        flat = jnp.concatenate([wpad.reshape(-1), jnp.zeros((wl,), i32)])
        cs = chunk_starts.astype(i32).reshape(-1)
        rows_of = jnp.repeat(jnp.arange(B, dtype=i32), C)
        wordoff = rows_of * Wpad + (cs >> 5)
        return flat, wordoff >> 10, wordoff & (SLAB - 1), (cs & 31).astype(u32)

    def t(name, f, *args):
        g = jax.jit(lambda *a: jnp.sum(f(*a).reshape(-1)[::997]))
        _ = float(np.asarray(g(*args)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(np.asarray(g(*args)))
            ts.append(time.perf_counter() - t0)
        print(f"[{time.perf_counter()-T0:7.1f}s] {name}: "
              f"{min(ts)*1e3:7.2f} ms", flush=True)

    def logshift(rows, woff):
        for k in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
            shifted = jnp.concatenate(
                [rows[:, k:], jnp.zeros((Lp, k), i32)], axis=1)
            rows = jnp.where((woff & k)[:, None] != 0, shifted, rows)
        return rows

    def s_dma(w, cs):
        flat, blk, woff, sh = prep(w, cs)
        return RP.fetch_slabs(flat, blk, wl)

    def s_logshift(w, cs):
        flat, blk, woff, sh = prep(w, cs)
        rows = RP.fetch_slabs(flat, blk, wl).reshape(Lp, wl)
        return logshift(rows, woff)

    def s_logshift_narrow(w, cs):
        # Narrowing variant: after handling bit k the residual offset is
        # < k, so only k + wwin + 1 leading words can still matter.
        flat, blk, woff, sh = prep(w, cs)
        rows = RP.fetch_slabs(flat, blk, wl).reshape(Lp, wl)
        for k in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
            keep = min(wl - k, k + wwin + 1)
            shifted = rows[:, k : k + keep]
            rows = jnp.where((woff & k)[:, None] != 0, shifted,
                             rows[:, :keep])
        return rows

    def s_bitshift(w, cs):
        flat, blk, woff, sh = prep(w, cs)
        rows = RP.fetch_slabs(flat, blk, wl).reshape(Lp, wl)
        rows = logshift(rows, woff)
        lo = rows[:, :wwin].astype(u32) >> sh[:, None]
        hi = jnp.where(sh[:, None] == 0, u32(0),
                       rows[:, 1:wwin + 1].astype(u32)
                       << ((32 - sh[:, None]) & 31))
        return (lo | hi).astype(i32)

    def s_full(w, cs):
        return RP.stage_blocked_from_linear(w, cs, C, wwin, interpret=False)

    t("dma only         ", s_dma, words, starts)
    t("dma+logshift     ", s_logshift, words, starts)
    t("dma+ls(narrow)   ", s_logshift_narrow, words, starts)
    t("dma+ls+bitshift  ", s_bitshift, words, starts)
    t("full (+transpose)", s_full, words, starts)


if __name__ == "__main__":
    main()
