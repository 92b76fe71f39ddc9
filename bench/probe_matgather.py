"""Decisive probe for a device-side foreign LZ77 materializer.

The round-3 VERDICT asks whether the slab-DMA formulation that made the
indexed repack fast can also beat the XLA-gather "physics ceiling"
(~25 ns/output byte) for FOREIGN stream materialization.  This probe
measures the actual primitive any in-kernel materializer would stand on:
**an arbitrary gather of 1024 output bytes from a shared (single-stream)
materialized window held in VMEM**.

Why this is THE primitive and not slab DMA:

* LZ77 sources are random ~3-258-byte spans across a 32 KiB window —
  slab DMA moves 4 KiB-aligned blocks and cannot express per-byte or
  per-record placement (Mosaic tiling: 1-D offsets provably /1024,
  2-D dim-0 slices /8 rows).
* The decode kernels' select-reduce "gather" only moves values within a
  lane COLUMN (where(rel==j, row, acc) never crosses lanes); it works
  there because windows are PER-LANE.  A shared window needs cross-lane
  delivery, and the only vector-unit form of that is the MXU one-hot:
  out[t] = sum_w (idx[t]==w) * win[w].
* The one-hot's cost is P-matrix construction: #window_words x #targets
  compares, irreducible by blocking.  Predicted ~2 ops/elem -> ~4.4 ns
  per output byte per full-window (8K-word) gather round; a materializer
  needs record-find + >=1 gather round + local fixpoint + assembly, so
  the all-in cost is a small multiple of this number.

Variants measured (marginal, DCE-proofed):
  onehot K=8448  — full 33 KiB window gather round
  onehot K=1056  — "near" window round (dist < ~4 KiB fast path)
  xla u8 take    — the XLA gather reference on identical volume

Run: python bench/probe_matgather.py
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

sys.path.insert(0, "/root/repo")

LANE = 128
T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


def onehot_gather(K: int, T: int):
    """pallas_call: gather T tiles of 1024 bytes each from a K-word window.

    Window arrives as 4 bf16 byte-planes [4, K]; targets as word indices
    idx i32[T, 8, 128] plus byte-in-word ib i32[T, 8, 128].  Per sublane
    s the one-hot P = (iota_K == idx[s]) is a (K, 128) bf16 matrix and
    the gather is (4, K) @ (K, 128) on the MXU.
    """

    def kernel(vp_ref, idx_ref, ib_ref, out_ref):
        i32 = jnp.int32
        vp = vp_ref[...]                       # [4, K] bf16
        iota = jax.lax.broadcasted_iota(i32, (K, LANE), 0)
        for s in range(8):
            row = idx_ref[0, s][None, :]       # [1, 128]
            P = (iota == row).astype(jnp.bfloat16)
            planes = jnp.dot(vp, P, preferred_element_type=jnp.float32)
            w = planes.astype(i32)             # [4, 128]
            word = (w[0] | (w[1] << 8) | (w[2] << 16) | (w[3] << 24))
            sh = (ib_ref[0, s] * 8).astype(jnp.uint32)
            out_ref[0, s] = ((word.astype(jnp.uint32) >> sh)
                             & jnp.uint32(255)).astype(i32)

    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((4, K), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANE), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANE), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, LANE), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 8, LANE), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def main():
    T = int(os.environ.get("PB_T", "512"))          # tiles of 1024 bytes
    reps = int(os.environ.get("PB_REPS", "8"))
    rng = np.random.default_rng(0)

    def marg(name, f, *args):
        # args[perturb_idx] gets a data-dependent +0/1 each rep so XLA
        # cannot hoist the body out of the fori_loop (bench.py lesson).
        def make(r):
            @jax.jit
            def g(*a):
                def body(k, acc):
                    a2 = list(a)
                    flat0 = (0,) * max(a2[1].ndim - 1, 1)
                    a2[1] = a2[1].at[flat0].add(-(acc & 1))
                    out = f(*a2)
                    return acc + jnp.sum(
                        out.astype(jnp.int32).reshape(-1)[::997]) + k

                return jax.lax.fori_loop(0, r, body, jnp.int32(0))

            return g

        def wall(fn):
            _ = int(np.asarray(fn(*args)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _ = int(np.asarray(fn(*args)))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1 = wall(make(1))
        tR = wall(make(reps))
        m = (tR - t1) / (reps - 1)
        nbytes = T * 1024
        stamp(f"{name}: wall(1) {t1*1e3:7.1f} ms  marginal {m*1e3:7.2f} ms"
              f"  ({m*1e9/nbytes:6.2f} ns/byte, {nbytes/m/1e9:5.2f} GB/s)")

    for K in (8448, 1056):
        win = rng.integers(0, 1 << 31, K, dtype=np.int32)
        vp = np.stack([(win >> (8 * j)) & 0xFF for j in range(4)]).astype(
            np.float32)
        src = rng.integers(0, K * 4 - 4, (T, 8, LANE), dtype=np.int32)
        idx = src >> 2
        ib = src & 3
        f = onehot_gather(K, T)
        d_vp = jax.device_put(jnp.asarray(vp, jnp.bfloat16))
        d_idx = jax.device_put(jnp.asarray(idx))
        d_ib = jax.device_put(jnp.asarray(ib))

        # correctness first
        out = np.asarray(f(d_vp, d_idx, d_ib))
        ref = (win[idx] >> (ib * 8)) & 255
        ok = (out == ref).all()
        stamp(f"K={K}: onehot gather correct: {bool(ok)}"
              f" (mismatches {int((out != ref).sum())})")
        marg(f"onehot K={K:5d}", f, d_vp, d_idx, d_ib)

    # XLA u8 take reference on the same volume
    N = T * 1024
    buf = rng.integers(0, 256, 33 * 1024, dtype=np.uint8)
    srcb = rng.integers(0, buf.size, N, dtype=np.int32)
    d_buf = jax.device_put(jnp.asarray(buf))
    d_src = jax.device_put(jnp.asarray(srcb))
    marg("xla u8 take    ", lambda b, s: jnp.take(b, s), d_buf, d_src)


if __name__ == "__main__":
    main()
