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


LANE = 128
_EOB = 1
_STOPPED = 2
_ERR_UNSUPPORTED = 100


def _tables_np():
    """Device copies of the decode tables as single int32 rows.

    The first-symbol length packs into bits 10-13 of literal entries (bits
    10-11 are unused there and bit 13 is the secondary flag, which literal
    entries never set), so one integer row-dot yields the whole decision.
    """
    from ..parallel.device_pipeline import _trained_tables

    litlen, _sec, dist, _dsec, first_len = _trained_tables()
    lit = litlen[0].astype(np.int64)
    is_lit = (lit & 0x8000) != 0
    lit_dev = np.where(is_lit, lit | (first_len[0].astype(np.int64) << 10), lit)
    lit_row = lit_dev.astype(np.uint32).view(np.int32).reshape(1, 4096)
    dist_row = dist[0].view(np.int32).reshape(1, 512)
    return lit_row, dist_row


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

    win = win_ref[0]              # [wwin, LANE] i32 (per-lane words)
    stop = bstop_ref[0, 0, :]     # [LANE]
    lit_row = lit_ref[...]        # [1, 4096] i32 (entry | first_len << 10)
    dist_row = dist_ref[...]      # [1, 512] i32

    iota_w = jax.lax.broadcasted_iota(i32, (wwin, LANE), 0)
    iota_lit = jax.lax.broadcasted_iota(i32, (LANE, 4096), 1)
    iota_dist = jax.lax.broadcasted_iota(i32, (LANE, 512), 1)

    def word_at(widx):
        """win[widx[lane], lane] via integer row-dot (no gather)."""
        sel = (iota_w == widx[None, :]).astype(i32)
        return jnp.sum(sel * win, axis=0)

    # state rows: 0 bit position, 1 status, 2 out bytes, 3 window base word,
    # 4..6 carried words [base .. base+2] (96-bit window: all peeks are pure
    # shifts; refills cost at most two row-dot selects per step).
    @pl.when(sb == 0)
    def _init():
        bstart = bstart_ref[0, 0, :]
        base = bstart >> 5
        state_ref[0, :] = bstart
        state_ref[1, :] = jnp.zeros((LANE,), i32)
        state_ref[2, :] = jnp.zeros((LANE,), i32)
        state_ref[3, :] = base
        state_ref[4, :] = word_at(base)
        state_ref[5, :] = word_at(base + 1)
        state_ref[6, :] = word_at(base + 2)

    # Integer select-reduce lookup: exactly one row of the compare is hot,
    # so the i32 sum of masked entries IS the entry — one pass, full width,
    # no MXU and no byte splitting.
    def lit_lookup(idx):
        sel = iota_lit == idx[:, None]            # [LANE, 4096]
        e = jnp.sum(jnp.where(sel, lit_row, 0), axis=1)
        fl = (e >> 10) & 0xF
        return e.astype(u32), fl

    def dist_lookup(idx):
        sel = iota_dist == idx[:, None]           # [LANE, 512]
        return jnp.sum(jnp.where(sel, dist_row, 0), axis=1).astype(u32)

    def step(k, carry):
        bpos, status, opos, base, w0, w1, w2 = carry
        running = status == 0

        def peek(off):
            o = (bpos - (base << 5)) + off
            sel_hi = o >= 32
            a = jnp.where(sel_hi, w1, w0).astype(u32)
            b = jnp.where(sel_hi, w2, w1).astype(u32)
            oo = (o & 31).astype(u32)
            return (a >> oo) | jnp.where(
                oo == 0, u32(0), b << (32 - oo).astype(u32)
            )

        bits = peek(0)

        e, fl = lit_lookup((bits & 4095).astype(i32))
        code_bits = (e & 0xFF).astype(i32)
        is_lit = (e & 0x8000) != 0
        exceptional = (e & 0x4000) != 0
        # bit 13 carries part of the packed first_len on literal entries;
        # it only means "secondary table" on non-literal ones.
        has_secondary = ~is_lit & ((e & 0x2000) != 0)

        cnt = ((e >> 8) & 0x3).astype(i32)
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

        dbits = peek(code_bits + length_extra)
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

        # Refill the carried window (consumed <= 39 bits -> at most 2 words).
        for _ in range(2):
            need = (new_bpos >> 5) > base
            w0 = jnp.where(need, w1, w0)
            w1 = jnp.where(need, w2, w1)
            base = jnp.where(need, base + 1, base)
            w2 = jnp.where(need, word_at(base + 2), w2)
        return new_bpos, new_status, new_opos, base, w0, w1, w2

    carry = (
        state_ref[0, :], state_ref[1, :], state_ref[2, :], state_ref[3, :],
        state_ref[4, :], state_ref[5, :], state_ref[6, :],
    )
    for k in range(8):  # unrolled: record rows must be statically indexed
        carry = step(k, carry)
    for row in range(7):
        state_ref[row, :] = carry[row]

    @pl.when(sb == num_sb - 1)
    def _finish():
        bpos_out_ref[0, 0, :] = state_ref[0, :]
        status_out_ref[0, 0, :] = state_ref[1, :]


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
        jax.ShapeDtypeStruct((LB, 8, LANE), jnp.int32),           # bpos
        jax.ShapeDtypeStruct((LB, 8, LANE), jnp.int32),           # status
    ]
    rec_spec = pl.BlockSpec(
        (8, LANE), lambda lb, sb: (sb, lb), memory_space=pltpu.VMEM
    )
    # Lane-length vectors ride in (1, 8, 128)-padded blocks: Mosaic requires
    # the last two block dims divisible by (8, 128).
    fin_spec = pl.BlockSpec(
        (1, 8, LANE), lambda lb, sb: (lb, 0, 0), memory_space=pltpu.VMEM
    )
    f = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wwin, LANE), lambda lb, sb: (lb, 0, 0),
                         memory_space=pltpu.VMEM),
            fin_spec,
            fin_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[rec_spec, rec_spec, rec_spec, rec_spec, fin_spec, fin_spec],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((7, LANE), jnp.int32)],
        interpret=interpret,
    )
    def pad8(v):
        out = jnp.zeros((LB, 8, LANE), jnp.int32)
        return out.at[:, 0, :].set(v)

    rl, rc, rn, rd, bpos, status = f(
        win, pad8(bit_start), pad8(bit_stop),
        jnp.asarray(lit_cols), jnp.asarray(dist_cols),
    )
    return (rl, rc, rn, rd), (
        bpos[:, 0, :].reshape(-1), status[:, 0, :].reshape(-1)
    )


def decompress_batch_pallas(
    streams: list[bytes], index: np.ndarray, max_steps: int | None = None
) -> list[bytes]:
    """Decode indexed ultra-fast streams through the Pallas kernel.

    Host-facing sibling of parallel.device_pipeline.decompress_batch_indexed:
    per-lane chunk windows extract on the host, the Mosaic kernel produces
    records, and the shared vectorized materializer expands them.  Streams
    the kernel's scope rejects fall back to the generic decoder.
    """
    import zlib

    import jax.numpy as jnp

    from ..parallel.device_pipeline import indexed_materialize
    from ..ops import inflate as I

    B = len(streams)
    C = index.shape[1]
    L = B * C
    LB = -(-L // LANE)

    # Per-lane windows, window-relative offsets.
    lane_meta = []
    max_span = 64
    for si, s in enumerate(streams):
        body_bits = (len(s) - 4) * 8
        for k in range(C):
            start = int(index[si, k])
            stop = int(index[si, k + 1]) if k < C - 1 else body_bits
            base = start >> 5
            lane_meta.append((si, start, stop, base))
            max_span = max(max_span, stop - base * 32)
    wwin = 1 << int(np.ceil(np.log2(max_span // 32 + 4)))

    win = np.zeros((LB, wwin, LANE), np.int32)
    bstart = np.zeros((LB, LANE), np.int32)
    bstop = np.zeros((LB, LANE), np.int32)
    words_cache = {}
    for lane, (si, start, stop, base) in enumerate(lane_meta):
        if si not in words_cache:
            body = streams[si][:-4]
            words_cache[si] = np.frombuffer(
                body + bytes((-len(body)) % 4) + bytes(8), "<u4"
            ).view(np.int32)
        seg = words_cache[si][base : base + wwin]
        lb, c = divmod(lane, LANE)
        win[lb, : len(seg), c] = seg
        bstart[lb, c] = start - base * 32
        bstop[lb, c] = stop - base * 32

    if max_steps is None:
        # A step consumes >= 1 symbol; chunk bytes bound the symbol count.
        max_bytes = max(len(s) for s in streams)
        max_steps = -(-max(512, max_bytes * 8 // max(C, 1) // 2) // 8) * 8

    recs, (bpos, status) = decode_ultrafast_pallas(
        jnp.asarray(win), jnp.asarray(bstart), jnp.asarray(bstop),
        max_steps=max_steps,
    )
    rl = recs[0][:, :L]
    rc = recs[1][:, :L]
    rn = recs[2][:, :L]
    rd = recs[3][:, :L]
    zeros = jnp.zeros_like(rl)
    status_l = jnp.asarray(status)[:L]

    cap = 1 << int(
        np.ceil(np.log2(max(max(len(s) for s in streams) * 8, 256)))
    )
    out, produced, ok = indexed_materialize(
        (rl.astype(jnp.uint32), zeros.astype(jnp.uint32),
         rc.astype(jnp.int8), rn, rd, zeros),
        status_l,
        None,
        C,
        out_capacity=cap,
    )
    out = np.asarray(out)
    produced = np.asarray(produced)
    ok = np.asarray(ok)

    results = []
    for i, s in enumerate(streams):
        if ok[i]:
            data = out[i, : produced[i]].tobytes()
            if zlib.adler32(data) == int.from_bytes(s[-4:], "big"):
                results.append(data)
                continue
        from ..ops.inflate import decompress_batch

        r = decompress_batch([s])[0]
        if isinstance(r, Exception):
            raise r
        results.append(r)
    return results
