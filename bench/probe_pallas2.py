"""Round-2 hardware probes for the fixed-geometry fused decode kernel.

Validates, on the real chip, the primitives the v2 Pallas decoder needs:

  P1  factored one-hot MXU lookup from a 4096-entry table (64x64 split,
      byte columns): exactness vs direct indexing + marginal cost.
  P2  select-reduce lookup at (8,128) lanes (the fallback engine) cost.
  P3  per-lane window word fetch (select-reduce over wwin) cost.
  P4  XLA corner-turn transpose [LB, T, 8, 128] -> [LB, 8, 128, T] i32
      throughput (the only post-kernel materialize step).
  P5  skeleton fused step cell (lookups + refill + state carry + static
      (8,128) stores): marginal cycles/cell via step scaling.

Run: python bench/probe_pallas2.py [probe ...]
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


def timeit(f, *args, repeats=5):
    r = f(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# ---------------------------------------------------------------------------
# P1: factored MXU lookup exactness + cost
# ---------------------------------------------------------------------------

def make_lookup_mxu(table_cols):
    """table_cols: f32[3, 64, 64] byte columns, T[c][hi][lo]."""

    def lookup(idx_8x128):
        i32 = jnp.int32
        hi = idx_8x128 >> 6          # [8,128]
        lo = idx_8x128 & 63
        ioh = jax.lax.broadcasted_iota(i32, (8, 128, 64), 2)
        oh_hi = (ioh == hi[:, :, None]).astype(jnp.float32)
        oh_lo = (ioh == lo[:, :, None]).astype(jnp.float32)
        out = jnp.zeros((8, 128), i32)
        for c in range(3):
            # A[s,l,h] = sum_j oh_lo[s,l,j] * T[c][h][j]
            A = jax.lax.dot_general(
                oh_lo, table_cols[c],
                dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [8,128,64]
            v = jnp.sum(oh_hi * A, axis=2).astype(i32)  # [8,128]
            out = out | (v << (8 * c))
        return out

    return lookup


def probe_mxu_lookup(n_lookups_per_cell=4, cells=256):
    rng = np.random.default_rng(0)
    table = rng.integers(0, 1 << 24, 4096).astype(np.int32)
    cols = np.stack(
        [((table >> (8 * c)) & 0xFF).astype(np.float32).reshape(64, 64)
         for c in range(3)]
    )
    idx0 = rng.integers(0, 4096, (8, 128)).astype(np.int32)

    def kernel(idx_ref, cols_ref, out_ref, acc):
        sb = pl.program_id(0)
        lookup = make_lookup_mxu(cols_ref[...])

        @pl.when(sb == 0)
        def _():
            acc[...] = idx_ref[...]

        x = acc[...]
        for _ in range(n_lookups_per_cell):
            e = lookup(x & 4095)
            x = (x + (e & 0xFFF) + 1) & 4095  # serial dependency
        acc[...] = x

        @pl.when(sb == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc[...]

    def run(ncells):
        f = pl.pallas_call(
            kernel,
            grid=(ncells,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        )
        return jax.jit(lambda i, c: f(i, c))

    # Exactness: one cell, compare against numpy emulation.
    out1 = np.asarray(run(1)(jnp.asarray(idx0), jnp.asarray(cols)))
    x = idx0.copy()
    for _ in range(n_lookups_per_cell):
        e = table[x & 4095]
        x = (x + (e & 0xFFF) + 1) & 4095
    exact = bool((out1 == x).all())
    print(f"P1 mxu-lookup exact: {exact}")
    if not exact:
        bad = (out1 != x).sum()
        print(f"   mismatches: {bad}/1024")

    t_small = timeit(run(cells // 4), jnp.asarray(idx0), jnp.asarray(cols))
    t_big = timeit(run(cells), jnp.asarray(idx0), jnp.asarray(cols))
    per_cell = (t_big - t_small) / (cells - cells // 4)
    per_lookup_ns = per_cell / n_lookups_per_cell * 1e9
    print(f"P1 mxu-lookup: {per_lookup_ns:.0f} ns/lookup/1024lanes "
          f"({per_lookup_ns * 0.94:.0f} cycles)")


# ---------------------------------------------------------------------------
# P2: select-reduce lookup cost (fallback engine)
# ---------------------------------------------------------------------------

def probe_select_reduce(tsize=4096, slab=512, n_lookups_per_cell=4, cells=64):
    rng = np.random.default_rng(0)
    table = rng.integers(0, 1 << 24, tsize).astype(np.int32)
    idx0 = rng.integers(0, tsize, (8, 128)).astype(np.int32)
    trows = table.reshape(tsize // 128, 128)

    def kernel(idx_ref, tab_ref, out_ref, acc):
        sb = pl.program_id(0)
        i32 = jnp.int32

        @pl.when(sb == 0)
        def _():
            acc[...] = idx_ref[...]

        def lookup(idx):
            out = jnp.zeros((8, 128), i32)
            # slabs of `slab` entries: iota over a [slab] grid vs idx
            for s0 in range(0, tsize, slab):
                t = tab_ref[s0 // 128 : (s0 + slab) // 128, :].reshape(1, 1, slab)
                io = jax.lax.broadcasted_iota(i32, (8, 128, slab), 2) + s0
                sel = io == idx[:, :, None]
                out = out + jnp.sum(jnp.where(sel, t, 0), axis=2)
            return out

        x = acc[...]
        for _ in range(n_lookups_per_cell):
            e = lookup(x & (tsize - 1))
            x = (x + (e & 0xFFF) + 1) & (tsize - 1)
        acc[...] = x

        @pl.when(sb == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc[...]

    def run(ncells):
        f = pl.pallas_call(
            kernel,
            grid=(ncells,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        )
        return jax.jit(lambda i, t: f(i, t))

    out1 = np.asarray(run(1)(jnp.asarray(idx0), jnp.asarray(trows)))
    x = idx0.copy()
    for _ in range(n_lookups_per_cell):
        e = table[x & (tsize - 1)]
        x = (x + (e & 0xFFF) + 1) & (tsize - 1)
    print(f"P2 select-reduce exact: {bool((out1 == x).all())}")

    t_small = timeit(run(cells // 4), jnp.asarray(idx0), jnp.asarray(trows))
    t_big = timeit(run(cells), jnp.asarray(idx0), jnp.asarray(trows))
    per_cell = (t_big - t_small) / (cells - cells // 4)
    per_lookup_ns = per_cell / n_lookups_per_cell * 1e9
    print(f"P2 select-reduce({tsize}): {per_lookup_ns:.0f} ns/lookup/1024lanes "
          f"({per_lookup_ns * 0.94:.0f} cycles)")


# ---------------------------------------------------------------------------
# P3: per-lane window word fetch cost
# ---------------------------------------------------------------------------

def probe_word_fetch(wwin=512, fetches_per_cell=2, cells=256):
    rng = np.random.default_rng(0)
    win = rng.integers(0, 1 << 31, (wwin, 8, 128)).astype(np.int32)
    idx0 = rng.integers(0, wwin, (8, 128)).astype(np.int32)

    def kernel(idx_ref, win_ref, out_ref, acc):
        sb = pl.program_id(0)
        i32 = jnp.int32

        @pl.when(sb == 0)
        def _():
            acc[...] = idx_ref[...]

        w = win_ref[...]

        def fetch(widx):
            io = jax.lax.broadcasted_iota(i32, (wwin, 8, 128), 0)
            sel = io == widx[None, :, :]
            return jnp.sum(jnp.where(sel, w, 0), axis=0)

        x = acc[...]
        for _ in range(fetches_per_cell):
            v = fetch(x % wwin)
            x = (x + (v & 0xFF) + 1) % wwin
        acc[...] = x

        @pl.when(sb == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = acc[...]

    def run(ncells):
        f = pl.pallas_call(
            kernel,
            grid=(ncells,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        )
        return jax.jit(lambda i, w: f(i, w))

    out1 = np.asarray(run(1)(jnp.asarray(idx0), jnp.asarray(win)))
    x = idx0.copy()
    for _ in range(fetches_per_cell):
        s, l = np.indices((8, 128))
        v = win[x % wwin, s, l]
        x = (x + (v & 0xFF) + 1) % wwin
    print(f"P3 word-fetch exact: {bool((out1 == x).all())}")

    t_small = timeit(run(cells // 4), jnp.asarray(idx0), jnp.asarray(win))
    t_big = timeit(run(cells), jnp.asarray(idx0), jnp.asarray(win))
    per_cell = (t_big - t_small) / (cells - cells // 4)
    per_fetch_ns = per_cell / fetches_per_cell * 1e9
    print(f"P3 word-fetch(wwin={wwin}): {per_fetch_ns:.0f} ns/fetch/1024lanes "
          f"({per_fetch_ns * 0.94:.0f} cycles)")


# ---------------------------------------------------------------------------
# P4: XLA corner-turn transpose throughput
# ---------------------------------------------------------------------------

def probe_transpose(LB=4, T=1024):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 31, (LB, T, 8, 128)).astype(np.int32)
    xd = jnp.asarray(x)

    @jax.jit
    def f(a):
        return jnp.transpose(a, (0, 2, 3, 1)).reshape(LB * 1024, T)

    t = timeit(f, xd)
    nbytes = x.size * 4
    print(f"P4 transpose {nbytes/1e6:.0f} MB: {t*1e3:.2f} ms "
          f"({nbytes/t/1e9:.2f} GB/s)")

    y = np.asarray(f(xd))
    ref = np.transpose(x, (0, 2, 3, 1)).reshape(LB * 1024, T)
    print(f"P4 transpose exact: {bool((y == ref).all())}")


# ---------------------------------------------------------------------------
# P5: skeleton fused decode cell
# ---------------------------------------------------------------------------

def probe_skeleton(wwin=512, cells=128, unroll=8):
    """Full per-cell shape: 8 steps x (3-col MXU lookup x4 + 2 word fetches
    + state carry + one static (8,128) store per step)."""
    rng = np.random.default_rng(0)
    table = rng.integers(0, 1 << 24, 4096).astype(np.int32)
    cols = np.stack(
        [((table >> (8 * c)) & 0xFF).astype(np.float32).reshape(64, 64)
         for c in range(3)]
    )
    win = rng.integers(0, 1 << 31, (wwin, 8, 128)).astype(np.int32)
    idx0 = rng.integers(0, 4096, (8, 128)).astype(np.int32)

    def kernel(idx_ref, cols_ref, win_ref, out_ref, state):
        sb = pl.program_id(0)
        i32 = jnp.int32
        lookup = make_lookup_mxu(cols_ref[...])
        w = win_ref[...]

        def fetch(widx):
            io = jax.lax.broadcasted_iota(i32, (wwin, 8, 128), 0)
            return jnp.sum(jnp.where(io == widx[None], w, 0), axis=0)

        @pl.when(sb == 0)
        def _():
            state[0] = idx_ref[...]
            state[1] = idx_ref[...] ^ 1234

        x, y = state[0], state[1]
        for u in range(unroll):
            acc = jnp.zeros((8, 128), i32)
            for _ in range(4):
                e = lookup(x & 4095)
                x = (x + (e & 0xFFF) + 1) & 4095
                acc = acc ^ e
            for _ in range(2):
                v = fetch(y % wwin)
                y = (y + (v & 0xFF) + 1) % wwin
            out_ref[u] = acc ^ y
        state[0] = x
        state[1] = y

    def run(ncells):
        f = pl.pallas_call(
            kernel,
            grid=(ncells,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (unroll, 8, 128), lambda s: (s, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((ncells * unroll, 8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((2, 8, 128), jnp.int32)],
        )
        return jax.jit(
            lambda i, c, w: jnp.sum(f(i, c, w)[-1])
        )

    args = (jnp.asarray(idx0), jnp.asarray(cols), jnp.asarray(win))
    t_small = timeit(run(cells // 4), *args)
    t_big = timeit(run(cells), *args)
    per_cell = (t_big - t_small) / (cells - cells // 4)
    bytes_per_cell = unroll * 1024 * 4  # 4 bytes/lane/step
    gbps = bytes_per_cell / per_cell / 1e9
    print(f"P5 skeleton cell: {per_cell*1e6:.1f} us/cell "
          f"({per_cell * 0.94e9 / unroll:.0f} cyc/step) -> {gbps:.2f} GB/s decode bound")


# ---------------------------------------------------------------------------
# P4b: plain 2-D transpose (tile-aligned) — is the 4-D form what's slow?
# ---------------------------------------------------------------------------

def probe_transpose2d(T=4096, L=1024):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 31, (T, L)).astype(np.int32)
    xd = jnp.asarray(x)

    @jax.jit
    def f(a):
        return a.T

    t = timeit(f, xd)
    nbytes = x.size * 4
    print(f"P4b transpose2d [{T},{L}] {nbytes/1e6:.0f} MB: {t*1e3:.2f} ms "
          f"({nbytes/t/1e9:.2f} GB/s)")
    y = np.asarray(f(xd))
    print(f"P4b exact: {bool((y == x.T).all())}")


# ---------------------------------------------------------------------------
# P7: store-transposed out block — kernel writes (8,128) vreg into
# out_ref[:, :, u] of an (8, 128, U) block, so HBM layout is lane-major.
# ---------------------------------------------------------------------------

def probe_store_transposed(U=64, cells=128):
    rng = np.random.default_rng(0)
    idx0 = rng.integers(0, 1 << 20, (8, 128)).astype(np.int32)

    def kernel(idx_ref, out_ref, acc):
        sb = pl.program_id(0)

        @pl.when(sb == 0)
        def _():
            acc[...] = idx_ref[...]

        x = acc[...]
        for u in range(U):
            x = x * 5 + 1
            out_ref[:, :, u] = x
        acc[...] = x

    def run(ncells):
        f = pl.pallas_call(
            kernel,
            grid=(ncells,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, 128, U), lambda s: (s, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((ncells, 8, 128, U), jnp.int32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        )
        return jax.jit(lambda i: f(i))

    out1 = np.asarray(run(1)(jnp.asarray(idx0)))[0]
    x = idx0.copy()
    ok = True
    for u in range(U):
        x = x * 5 + 1
        ok &= bool((out1[:, :, u] == x).all())
    print(f"P7 store-transposed exact: {ok}")

    t_small = timeit(run(cells // 4), jnp.asarray(idx0))
    t_big = timeit(run(cells), jnp.asarray(idx0))
    per_cell = (t_big - t_small) / (cells - cells // 4)
    per_store_ns = per_cell / U * 1e9
    print(f"P7 store-transposed: {per_store_ns:.0f} ns/store/1024lanes "
          f"({per_store_ns * 0.94:.0f} cycles)")


ALL = {
    "p1": probe_mxu_lookup,
    "p2": probe_select_reduce,
    "p3": probe_word_fetch,
    "p4": probe_transpose,
    "p4b": probe_transpose2d,
    "p5": probe_skeleton,
    "p7": probe_store_transposed,
}

if __name__ == "__main__":
    which = sys.argv[1:] or list(ALL)
    print(f"backend: {jax.default_backend()}")
    for name in which:
        try:
            ALL[name]()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {e}")
