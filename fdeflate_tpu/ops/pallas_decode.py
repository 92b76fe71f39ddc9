"""Pallas TPU decode kernel for ultra-fast (trained-tree) streams.

Experimental round-1 prototype of the symbol-decode loop as a Mosaic kernel.
Hardware feasibility probes (PERF_NOTES.md) pinned the building blocks:

* per-lane lookups from the 4096-entry table run as one-hot MXU matmuls
  against byte-split float32 columns (exact; verified on hardware);
* per-lane window words select with an integer row-dot (compare + reduce)
  over a [W, 128] per-lane-block window — no unsupported gathers anywhere;
* the sequential TPU grid carries lane state in VMEM scratch across steps,
  and each grid cell writes one [K, 128] record block, avoiding dynamic
  sublane stores (which miscompile, see the probes).

Scope: single shared table set without secondary tables (the trained tree's
codes are <= 12 bits and ultra-fast streams use the single 1-bit distance
code), chain=1.  Lanes that meet anything outside this scope set an error
status and the caller falls back to the XLA decoder.

Layout: lanes group into blocks of 128; grid = (lane_blocks, step_blocks)
with the step dimension minor (sequential on TPU).
"""

from __future__ import annotations

import functools

import numpy as np

from .. import errors as E

LANE = 128
_EOB = 1
_STOPPED = 2
_ERR_UNSUPPORTED = 100


def _tables_np():
    from ..parallel.device_pipeline import _trained_tables

    litlen, _sec, dist, _dsec, first_len = _trained_tables()
    lit_cols = np.zeros((4096, LANE), np.float32)
    for j in range(4):
        lit_cols[:, j] = (litlen[0] >> (8 * j)) & 0xFF
    lit_cols[:, 4] = first_len[0]
    dist_cols = np.zeros((512, LANE), np.float32)
    for j in range(4):
        dist_cols[:, j] = (dist[0] >> (8 * j)) & 0xFF
    return lit_cols, dist_cols


def _kernel(win_ref, bstart_ref, bstop_ref, lit_ref, dist_ref,
            rl_ref, rc_ref, rn_ref, rd_ref, bpos_out_ref, status_out_ref,
            state_ref, *, wwin: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i32 = jnp.int32
    u32 = jnp.uint32
    sb = pl.program_id(1)
    num_sb = pl.num_programs(1)

    # state rows: 0 = bit position, 1 = status, 2 = out bytes
    @pl.when(sb == 0)
    def _init():
        state_ref[0, :] = bstart_ref[0, :]
        state_ref[1, :] = jnp.zeros((LANE,), i32)
        state_ref[2, :] = jnp.zeros((LANE,), i32)

    win = win_ref[0]              # [wwin, LANE] i32 (per-lane words)
    stop = bstop_ref[0, :]        # [LANE]
    lit_cols = lit_ref[...]       # [4096, LANE] f32 (cols 0..4 used)
    dist_cols = dist_ref[...]     # [512, LANE] f32

    iota_w = jax.lax.broadcasted_iota(i32, (wwin, LANE), 0)
    iota_lit = jax.lax.broadcasted_iota(i32, (LANE, 4096), 1)
    iota_dist = jax.lax.broadcasted_iota(i32, (LANE, 512), 1)

    def word_at(widx):
        """win[widx[lane], lane] via integer row-dot (no gather)."""
        sel = (iota_w == widx[None, :]).astype(i32)
        return jnp.sum(sel * win, axis=0).astype(u32)

    # Column extraction via masked row-reduce: direct column slices of an
    # MXU result miscompile on this Mosaic version (values verified exact
    # when the full matrix is read back).
    iota_col = jax.lax.broadcasted_iota(i32, (LANE, LANE), 1)

    def col(v, j):
        return jnp.sum(jnp.where(iota_col == j, v, 0), axis=1)

    def lit_lookup(idx):
        oh = (iota_lit == idx[:, None]).astype(jnp.float32)
        out = jnp.dot(oh, lit_cols, preferred_element_type=jnp.float32)
        v = out.astype(i32)
        entry = col(v, 0) | (col(v, 1) << 8) | (col(v, 2) << 16) | (col(v, 3) << 24)
        return entry.astype(u32), col(v, 4)

    def dist_lookup(idx):
        oh = (iota_dist == idx[:, None]).astype(jnp.float32)
        out = jnp.dot(oh, dist_cols, preferred_element_type=jnp.float32)
        v = out.astype(i32)
        return (col(v, 0) | (col(v, 1) << 8) | (col(v, 2) << 16) | (col(v, 3) << 24)).astype(u32)

    def step(k, carry):
        bpos, status, opos = carry
        running = status == 0

        widx = bpos >> 5
        sh = (bpos & 31).astype(u32)
        w0 = word_at(widx)
        w1 = word_at(widx + 1)
        bits = (w0 >> sh) | jnp.where(
            sh == 0, u32(0), w1 << (32 - sh).astype(u32)
        )

        e, fl = lit_lookup((bits & 4095).astype(i32))
        code_bits = (e & 0xFF).astype(i32)
        is_lit = (e & 0x8000) != 0
        exceptional = (e & 0x4000) != 0
        has_secondary = (e & 0x2000) != 0

        cnt = ((e >> 8) & 0xF).astype(i32)
        lit2b = ((e >> 16) & 0xFFFF).astype(u32)
        # Split a double literal whose second symbol starts at the stop.
        cross = is_lit & (bpos + code_bits > stop)
        code_bits = jnp.where(cross, fl, code_bits)
        cnt = jnp.where(cross, 1, cnt)
        lit2b = jnp.where(cross, lit2b & 0xFF, lit2b)

        plain_len = ~is_lit & ~exceptional
        plain_eof = ~is_lit & exceptional & ~has_secondary & (code_bits != 0)
        unsupported = has_secondary | (
            ~is_lit & exceptional & ~has_secondary & (code_bits == 0)
        )

        length_base = (e >> 16).astype(i32)
        length_extra = ((e >> 8) & 0xFF).astype(i32)
        rem = bits >> code_bits.astype(u32)
        length = length_base + (
            rem & ((u32(1) << length_extra.astype(u32)) - 1)
        ).astype(i32)

        dpos = bpos + code_bits + length_extra
        dwidx = dpos >> 5
        dsh = (dpos & 31).astype(u32)
        dw0 = word_at(dwidx)
        dw1 = word_at(dwidx + 1)
        dbits = (dw0 >> dsh) | jnp.where(
            dsh == 0, u32(0), dw1 << (32 - dsh).astype(u32)
        )
        de = dist_lookup((dbits & 511).astype(i32))
        d_prim = (de & 0x8000) != 0
        d_code_bits = (de & 0xFF).astype(i32)
        d_extra = ((de >> 8) & 0xF).astype(i32)
        d_base = (de >> 16).astype(i32)
        drem = dbits >> d_code_bits.astype(u32)
        distance = d_base + (
            drem & ((u32(1) << d_extra.astype(u32)) - 1)
        ).astype(i32)
        unsupported = unsupported | (plain_len & ~d_prim)

        consumed = jnp.where(
            is_lit,
            code_bits,
            jnp.where(
                plain_eof, code_bits,
                code_bits + length_extra + d_code_bits + d_extra,
            ),
        )

        commit = running & ~unsupported & ~plain_eof
        out_lit = jnp.where(commit & is_lit, lit2b, u32(0))
        out_cnt = jnp.where(commit & is_lit, cnt, 0)
        out_len = jnp.where(commit & plain_len, length, 0)
        out_dst = jnp.where(commit & plain_len, distance, 0)

        rl_ref[k, :] = out_lit.astype(i32)  # k is a Python int: static row
        rc_ref[k, :] = out_cnt
        rn_ref[k, :] = out_len
        rd_ref[k, :] = out_dst

        new_bpos = jnp.where(commit | (running & plain_eof), bpos + consumed, bpos)
        new_status = jnp.where(
            running,
            jnp.where(
                unsupported,
                _ERR_UNSUPPORTED,
                jnp.where(
                    plain_eof,
                    _EOB,
                    jnp.where(new_bpos >= stop, _STOPPED, 0),
                ),
            ),
            status,
        )
        new_opos = opos + out_cnt + out_len
        return new_bpos, new_status, new_opos

    carry = (state_ref[0, :], state_ref[1, :], state_ref[2, :])
    for k in range(8):  # unrolled: record rows must be statically indexed
        carry = step(k, carry)
    bpos, status, opos = carry
    state_ref[0, :] = bpos
    state_ref[1, :] = status
    state_ref[2, :] = opos

    @pl.when(sb == num_sb - 1)
    def _finish():
        bpos_out_ref[0, :] = state_ref[0, :]
        status_out_ref[0, :] = state_ref[1, :]


def decode_ultrafast_pallas(
    win,          # i32[LB, wwin, 128] — per-lane chunk word windows
    bit_start,    # i32[LB, 128] — entry bit offset within each lane's window
    bit_stop,     # i32[LB, 128] — stop offset
    max_steps: int,
    interpret: bool | None = None,
):
    """Run the Pallas decode kernel; returns records + (bpos, status).

    Records are [max_steps, LB*128] matching ops.inflate record layout
    (lit_hi and rec_pos are zeros: chain=1 and indexed entries need neither).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    LB, wwin, _ = win.shape
    assert max_steps % 8 == 0
    SB = max_steps // 8  # 8 unrolled decode steps per (sequential) grid cell
    lit_cols, dist_cols = _tables_np()

    kern = functools.partial(_kernel, wwin=wwin)
    grid = (LB, SB)
    out_shape = [
        jax.ShapeDtypeStruct((max_steps, LB * LANE), jnp.int32),  # rl
        jax.ShapeDtypeStruct((max_steps, LB * LANE), jnp.int32),  # rc
        jax.ShapeDtypeStruct((max_steps, LB * LANE), jnp.int32),  # rn
        jax.ShapeDtypeStruct((max_steps, LB * LANE), jnp.int32),  # rd
        jax.ShapeDtypeStruct((LB, LANE), jnp.int32),              # bpos
        jax.ShapeDtypeStruct((LB, LANE), jnp.int32),              # status
    ]
    rec_spec = pl.BlockSpec(
        (8, LANE), lambda lb, sb: (sb, lb), memory_space=pltpu.VMEM
    )
    fin_spec = pl.BlockSpec(
        (1, LANE), lambda lb, sb: (lb, 0), memory_space=pltpu.VMEM
    )
    f = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wwin, LANE), lambda lb, sb: (lb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda lb, sb: (lb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda lb, sb: (lb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[rec_spec, rec_spec, rec_spec, rec_spec, fin_spec, fin_spec],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((3, LANE), jnp.int32)],
        interpret=interpret,
    )
    rl, rc, rn, rd, bpos, status = f(
        win, bit_start, bit_stop,
        jnp.asarray(lit_cols), jnp.asarray(dist_cols),
    )
    return (rl, rc, rn, rd), (bpos.reshape(-1), status.reshape(-1))
