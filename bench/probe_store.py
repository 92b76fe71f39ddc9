"""Probe: can the kernel store (8,128) vregs at per-step positions along the
last dim of a (8,128,128) block?

p7a  dynamic store: pl.store(..., pl.dslice(u, 1)) with traced u — exactness.
p7b  static unroll-128 stores — exactness + compile time + marginal cost.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_case(dynamic: bool, cells=8, U=128):
    def kernel(seed_ref, out_ref, acc):
        sb = pl.program_id(0)

        @pl.when(sb == 0)
        def _():
            acc[...] = seed_ref[...]

        x = acc[...]
        if dynamic:
            def body(u, x):
                x = x * 5 + 1
                out_ref[0, :, :, pl.dslice(u, 1)] = x[:, :, None]
                return x
            x = jax.lax.fori_loop(0, U, body, x)
        else:
            for u in range(U):
                x = x * 5 + 1
                out_ref[0, :, :, u] = x
        acc[...] = x

    def make(ncells):
        return jax.jit(pl.pallas_call(
            kernel,
            grid=(ncells,),
            in_specs=[pl.BlockSpec((8, 128), lambda s: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128, U), lambda s: (s, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ncells, 8, 128, U), jnp.int32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        ))

    rng = np.random.default_rng(0)
    seed = rng.integers(0, 1 << 20, (8, 128)).astype(np.int32)
    t0 = time.perf_counter()
    f1 = make(1)
    out1 = np.asarray(f1(jnp.asarray(seed)))[0]
    compile_s = time.perf_counter() - t0
    x = seed.copy()
    ok = True
    for u in range(U):
        x = x * 5 + 1
        ok &= bool((out1[:, :, u] == x).all())
    tag = "dyn" if dynamic else "static"
    print(f"p7-{tag}: exact={ok} compile={compile_s:.1f}s")

    f = make(cells)
    fq = make(cells // 2)
    def t(fn, n):
        r = fn(jnp.asarray(seed)); jax.block_until_ready(r)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(jnp.asarray(seed)))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    tb, ts_ = t(f, cells), t(fq, cells // 2)
    per_store = (tb - ts_) / (cells - cells // 2) / U * 1e9
    print(f"p7-{tag}: {per_store:.0f} ns/store/1024lanes")


def run_corner_turn(LB=4, T=512):
    """p8: Pallas corner-turn [LB, T, 8, 128] -> [LB, 8, 128, T] via one
    in-VMEM transpose per (1, 128, 8, 128) block."""
    U = 128

    def kernel(x_ref, out_ref):
        x = x_ref[0]                      # [U, 8, 128]
        out_ref[0] = jnp.transpose(x, (1, 2, 0))

    def make(lb, t):
        return jax.jit(pl.pallas_call(
            kernel,
            grid=(lb, t // U),
            in_specs=[pl.BlockSpec((1, U, 8, 128), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128, U), lambda i, j: (i, 0, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((lb, 8, 128, t), jnp.int32),
        ))

    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 31, (LB, T, 8, 128)).astype(np.int32)
    t0 = time.perf_counter()
    f = make(LB, T)
    y = np.asarray(f(jnp.asarray(x)))
    print(f"p8 corner-turn compile: {time.perf_counter()-t0:.1f}s")
    ref = np.transpose(x, (0, 2, 3, 1))
    print("p8 corner-turn exact:", bool((y == ref).all()))
    xd = jnp.asarray(x)
    jax.block_until_ready(f(xd))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(f(xd))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    nbytes = x.size * 4
    print(f"p8 corner-turn {nbytes/1e6:.0f} MB: {t*1e3:.2f} ms "
          f"({nbytes/t/1e9:.1f} GB/s)")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    which = sys.argv[1:] or ["dyn", "static"]
    if "p8" in which:
        try:
            run_corner_turn()
        except Exception as e:
            print("p8 FAILED:", type(e).__name__, str(e)[:300])
    if "dyn" in which:
        try:
            run_case(True)
        except Exception as e:
            print("p7-dyn FAILED:", type(e).__name__, str(e)[:300])
    if "static" in which:
        try:
            run_case(False)
        except Exception as e:
            print("p7-static FAILED:", type(e).__name__, str(e)[:300])
