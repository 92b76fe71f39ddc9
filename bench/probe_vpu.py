"""Calibrate Mosaic VPU op cost: serial latency vs interleaved throughput.

Times a fori_loop whose body is 32 unrolled iterations of an op pattern on
(8,128) i32 vregs.  ``serial`` variants form one dependency chain (measures
op LATENCY); ``par8`` variants run 8 independent chains interleaved
(measures issue THROUGHPUT).  The ratio tells whether a serially-dependent
kernel (like the decode loop) is latency-bound and how much R-way
interleaving of independent lane-blocks can recover.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
UNROLL = 32


def _body_op(a, b, kind):
    if kind == "add":
        return a + b
    if kind == "select":
        return jnp.where(a > b, a - b, a + 1)
    if kind == "mix":
        m = a >= b
        a = jnp.where(m, a - b, a + b)
        a = (a.astype(jnp.uint32) >> (b & 7).astype(jnp.uint32)).astype(
            jnp.int32)
        return a + (b & 63)
    if kind == "varshift":
        # one lane-variable shift (shift amount is a vector)
        return (a.astype(jnp.uint32)
                >> (b & 31).astype(jnp.uint32)).astype(jnp.int32) + 1
    if kind == "varshl":
        return ((a.astype(jnp.uint32)
                 << (b & 31).astype(jnp.uint32)).astype(jnp.int32) | 1)
    if kind == "cast":
        # round-trip cast only
        return a.astype(jnp.uint32).astype(jnp.int32) + b
    raise ValueError(kind)


def _chain_kernel(x_ref, s_ref, o_ref, *, n: int, kind: str, width: int):
    b = x_ref[0] + 1
    init = [x_ref[0] + i for i in range(width)]

    def body(i, chains):
        out = list(chains)
        if kind == "bcast":
            # one scalar->vector broadcast per chain step: the SMEM index is
            # loop- and step-variant so neither MLIR CSE nor Mosaic can
            # hoist the broadcast — the pattern the decode kernel had before
            # pre-broadcast VMEM metadata (pallas_decode2).
            for _u in range(UNROLL):
                for w in range(width):
                    out[w] = out[w] + s_ref[0, (i + _u + w) & 7]
            return tuple(out)
        for _u in range(UNROLL):
            for w in range(width):
                out[w] = _body_op(out[w], b, kind)
        return tuple(out)

    res = jax.lax.fori_loop(0, n // (UNROLL * width), body, tuple(init))
    acc = res[0]
    for w in range(1, width):
        acc = acc + res[w]
    o_ref[0] = acc


def run(kind: str, n: int, width: int, repeats: int = 5, grid: int = 512):
    f = pl.pallas_call(
        functools.partial(_chain_kernel, n=n, kind=kind, width=width),
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, 8, LANE), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 8, LANE), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8, LANE), jnp.int32),
    )
    x = jnp.asarray(np.random.randint(1, 1000, (1, 8, LANE), np.int32))
    s = jnp.asarray(np.arange(1, 9, dtype=np.int32).reshape(1, 8))
    g = jax.jit(lambda x: jnp.sum(f(x, s)))
    _ = int(np.asarray(g(x)))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = int(np.asarray(g(x)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    grid = 512
    n_lo, n_hi = 2048, 16384
    ops_per_iter = {"add": 1, "select": 3, "mix": 7, "varshift": 2,
                    "varshl": 2, "cast": 3, "bcast": 1}
    for kind in (sys.argv[1:] or ["add", "select", "mix"]):
        for width in (1, 8):
            t_lo = run(kind, n_lo, width, grid=grid)
            t_hi = run(kind, n_hi, width, grid=grid)
            dt = (t_hi - t_lo) / ((n_hi - n_lo) * grid)
            per_op = dt / ops_per_iter[kind]
            tag = "serial" if width == 1 else "par8  "
            print(f"{kind:7s} {tag}: {dt*1e9:7.2f} ns/iter "
                  f"~{per_op*1e9:6.2f} ns/op ({per_op*0.94e9:5.1f} cyc/op)",
                  flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
