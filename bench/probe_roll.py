"""Semantics probe: pltpu.roll with a TRACED shift on (16, 128) i32 tiles.

The round-5 combine-kernel redesign (fold the linear encoder's word shift
into the OR-combine) needs, inside a kernel, a lane-axis rotate and a
sublane-axis rotate both by a per-lane runtime scalar.  This probe checks
on hardware that pltpu.roll(x, s, axis) implements jnp.roll semantics
(out[i] = x[(i - s) % n]) for dynamic s on both axes.

Run: python bench/probe_roll.py
"""

from __future__ import annotations

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s_ref, x_ref, out_ref, *, axis: int):
    out_ref[...] = pltpu.roll(x_ref[...], s_ref[0], axis=axis)


def run(axis: int, shift: int) -> bool:
    x = np.arange(16 * 128, dtype=np.int32).reshape(16, 128)
    f = pl.pallas_call(
        functools.partial(_kernel, axis=axis),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
    )
    got = np.asarray(f(jnp.asarray([shift], jnp.int32), jnp.asarray(x)))
    want = np.roll(x, shift, axis=axis)
    ok = np.array_equal(got, want)
    print(f"axis={axis} shift={shift}: {'OK' if ok else 'MISMATCH'}")
    if not ok:
        bad = np.argwhere(got != want)
        print("  first bad:", bad[:3], got[tuple(bad[0])], want[tuple(bad[0])])
    return ok


def main():
    ok = True
    for axis in (0, 1):
        for shift in (0, 1, 3, 7, 8, 56, 120, 127):
            if axis == 0 and shift > 15:
                continue
            ok &= run(axis, shift)
    print("ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
