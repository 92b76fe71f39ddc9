"""Marginal costs of the gather-class primitives that bound materialize.

LZ77 expansion on device is built from output-sized gathers (pointer
doubling + final value gather), record-sized scatters, and scans.  This
probe pins each primitive's marginal ns/element on hardware so the
foreign-decode ceiling is a measured number, not folklore (PERF_NOTES
round-1 quoted 7-15 ns/element).

Run: python bench/probe_gather.py
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

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


def main():
    M = int(os.environ.get("PG_M", str(1 << 23)))  # elements (8M default)
    reps = int(os.environ.get("PG_REPS", "8"))
    rng = np.random.default_rng(0)
    stamp(f"backend={jax.default_backend()} M={M}")

    # backward-pointing random indices (like resolved LZ pointers)
    back = rng.integers(0, 32768, M)
    ptr1 = np.maximum(np.arange(M) - back, 0).astype(np.int32)
    vals = rng.integers(0, 2**31 - 1, M).astype(np.int32)

    d_ptr1 = jax.device_put(jnp.asarray(ptr1))
    d_vals = jax.device_put(jnp.asarray(vals))

    def fold(x):
        return jnp.sum(x.reshape(-1)[::997].astype(jnp.int32))

    def wall(f, *args):
        _ = int(np.asarray(f(*args)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(np.asarray(f(*args)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def marg(name, leg, *args):
        def make(r):
            @jax.jit
            def g(*a):
                def body(k, acc):
                    return acc + leg(acc, *a)

                return jax.lax.fori_loop(0, r, body, jnp.int32(0))

            return g

        t1 = wall(make(1), *args)
        tR = wall(make(reps), *args)
        m = (tR - t1) / (reps - 1)
        stamp(f"{name}: marginal {m*1e3:8.2f} ms  ({m/M*1e9:6.2f} ns/elem)")
        return m

    def leg_gather_1row(acc, p, v):
        v2 = v.at[0].add(acc & 1)
        return fold(jnp.take(v2, p, axis=0))

    def leg_gather_2d(acc, p, v):
        R = 16
        v2 = v.at[0].add(acc & 1).reshape(R, -1)
        p2 = (p.reshape(R, -1) % (M // R))
        return fold(jnp.take_along_axis(v2, p2, axis=1))

    def leg_gather_u8(acc, p, v):
        v2 = (v & 0xFF).astype(jnp.uint8).at[0].add((acc & 1).astype(jnp.uint8))
        return fold(jnp.take(v2, p, axis=0).astype(jnp.int32))

    def leg_cummax(acc, p, v):
        v2 = v.at[0].add(acc & 1)
        return fold(jax.lax.cummax(v2, axis=0))

    def leg_cumsum(acc, p, v):
        v2 = v.at[0].add(acc & 1)
        return fold(jnp.cumsum(v2, axis=0))

    def leg_scatter(acc, p, v):
        v2 = v.at[0].add(acc & 1)
        return fold(jnp.zeros(M, jnp.int32).at[p].add(v2, mode="drop"))

    def leg_elementwise(acc, p, v):
        v2 = v.at[0].add(acc & 1)
        return fold((v2 * 3 + 7) ^ (v2 >> 5))

    marg("elementwise 3-op      ", leg_elementwise, d_ptr1, d_vals)
    marg("gather 1-row (take)   ", leg_gather_1row, d_ptr1, d_vals)
    marg("gather 16-row (tala)  ", leg_gather_2d, d_ptr1, d_vals)
    marg("gather u8 1-row       ", leg_gather_u8, d_ptr1, d_vals)
    marg("cummax                ", leg_cummax, d_ptr1, d_vals)
    marg("cumsum                ", leg_cumsum, d_ptr1, d_vals)
    marg("scatter-add           ", leg_scatter, d_ptr1, d_vals)


if __name__ == "__main__":
    main()
