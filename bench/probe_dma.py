"""Feasibility + timing probe: per-lane window staging primitives (hardware).

The repack kernel's first cut DMA'd ``words[b, w0:w0+wl]`` per lane and
Mosaic rejected the compile: a dim-0 slice of a 2-D tiled memref must be
aligned to the sublane tiling ("Slice shape along dimension 0 must be
aligned to tiling (8), but is 1").  This probe tests the candidate
replacements on the real toolchain:

  dma_arb    1-D flat src -> 1-D flat dst DMA, ARBITRARY word offsets
  dma_al     same, src offsets aligned down to 128 words (overfetch)
  gather128  XLA gather of 128-word rows at aligned offsets
  stage_xla  the existing per-word gather oracle (baseline)

Each variant is checked against numpy at a small geometry, then timed at
the bench geometry (L=8192 lanes, wl=384 words).  Scalar readback only.

Run: python bench/probe_dma.py [variants...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("FDN_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


def _dma_kernel(off_ref, src_ref, out_ref, sem, *, lanes: int, wl: int,
                depth: int):
    """lanes DMAs of wl words each: src[off[i] : off[i]+wl] -> out[i*wl:]."""

    def copy_for(i, slot):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(off_ref[i], wl)],
            out_ref.at[pl.ds(i * wl, wl)],
            sem.at[slot],
        )

    def body(i, _):
        slot = jax.lax.rem(i, depth)

        @pl.when(i >= depth)
        def _drain():
            copy_for(i - depth, slot).wait()

        copy_for(i, slot).start()
        return 0

    jax.lax.fori_loop(0, lanes, body, 0)
    for k in range(depth):
        i = lanes - depth + k
        copy_for(i, i % depth).wait()


@functools.partial(jax.jit, static_argnums=(2, 3))
def dma_rows(src_flat, off, wl: int, depth: int):
    (lanes,) = off.shape
    f = pl.pallas_call(
        functools.partial(_dma_kernel, lanes=lanes, wl=wl, depth=depth),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((lanes * wl,), jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )
    return f(off, src_flat)


@functools.partial(jax.jit, static_argnums=(2,))
def gather128(src_flat, off_al, nb: int):
    blocks = src_flat.reshape(-1, 128)
    idx = (off_al[:, None] >> 7) + jnp.arange(nb, dtype=jnp.int32)[None]
    return jnp.take(blocks, idx, axis=0)  # [L, nb, 128]


def main():
    want = set(sys.argv[1:]) or {"dma_arb", "dma_al", "gather128",
                                 "stage_xla"}
    rng = np.random.default_rng(7)
    stamp(f"backend={jax.default_backend()}")

    # --- correctness, small ---
    W, Ls, wls = 1 << 16, 64, 384
    src = rng.integers(-(2**31), 2**31, W, dtype=np.int64).astype(np.int32)
    offs = rng.integers(0, W - wls - 1, Ls).astype(np.int32)
    src_d = jnp.asarray(src)
    exp = np.stack([src[o : o + wls] for o in offs])

    if "dma_arb" in want:
        try:
            got = np.asarray(dma_rows(src_d, jnp.asarray(offs), wls, 16))
            ok = np.array_equal(got.reshape(Ls, wls), exp)
            stamp(f"dma_arb correct={ok}")
        except Exception as e:
            stamp(f"dma_arb FAIL {type(e).__name__}: {str(e)[:300]}")
            want.discard("dma_arb")

    offs_al = (offs >> 7) << 7
    exp_al = np.stack([src[o : o + wls] for o in offs_al])
    if "dma_al" in want:
        try:
            got = np.asarray(dma_rows(src_d, jnp.asarray(offs_al), wls, 16))
            ok = np.array_equal(got.reshape(Ls, wls), exp_al)
            stamp(f"dma_al correct={ok}")
        except Exception as e:
            stamp(f"dma_al FAIL {type(e).__name__}: {str(e)[:300]}")
            want.discard("dma_al")

    if "gather128" in want:
        got = np.asarray(gather128(src_d, jnp.asarray(offs_al), wls // 128))
        ok = np.array_equal(got.reshape(Ls, wls), exp_al)
        stamp(f"gather128 correct={ok}")

    # --- timing, bench geometry ---
    W = 16 * 427008  # 16 streams' padded words, flattened
    L, wl = 8192, 384
    src = rng.integers(-(2**31), 2**31, W, dtype=np.int64).astype(np.int32)
    offs = np.sort(rng.integers(0, W - wl - 1, L)).astype(np.int32)
    offs_al = (offs >> 7) << 7
    src_d = jax.device_put(jnp.asarray(src))
    off_d = jax.device_put(jnp.asarray(offs))
    offal_d = jax.device_put(jnp.asarray(offs_al))

    def timeit(name, f, *args, repeats=3):
        g = jax.jit(lambda *a: jnp.sum(f(*a)[:: 977]))
        _ = float(np.asarray(g(*args)))
        ts = []
        for _ in range(repeats):
            t = time.perf_counter()
            _ = float(np.asarray(g(*args)))
            ts.append(time.perf_counter() - t)
        mb = L * wl * 4 / 1e6
        stamp(f"{name}: {min(ts)*1e3:7.2f} ms  ({mb/min(ts)/1e3:.2f} GB/s "
              f"of staged rows)")

    if "dma_arb" in want:
        timeit("dma_arb   L=8192", lambda s, o: dma_rows(s, o, wl, 16),
               src_d, off_d)
    if "dma_al" in want:
        timeit("dma_al    L=8192", lambda s, o: dma_rows(s, o, wl, 16),
               src_d, offal_d)
    if "gather128" in want:
        timeit("gather128 L=8192",
               lambda s, o: gather128(s, o, wl // 128), src_d, offal_d)
    if "stage_xla" in want:
        def stage(s, o):
            seg = jnp.take(s, o[:, None]
                           + jnp.arange(wl, dtype=jnp.int32)[None], axis=0)
            return seg
        timeit("stage_xla L=8192", stage, src_d, off_d)


if __name__ == "__main__":
    main()
