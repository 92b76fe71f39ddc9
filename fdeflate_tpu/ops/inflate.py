"""Batched DEFLATE decode on TPU (JAX/XLA).

The bit-serial Huffman dependency cannot be vectorized *within* one block's
symbol stream, but a TPU runs thousands of independent decode lanes.  This
module decodes a batch of streams with one lane per stream (SURVEY.md P1);
chunk-level speculation within a stream builds on the same kernels
(parallel/speculative.py).

Two-phase design (SURVEY.md section 7, "hard parts"):

1. **Symbol phase** — a ``lax.while_loop`` advances every lane one decode
   step per iteration: a 4096-entry table gather resolves up to two literal
   codes (the reference's multi-byte-literal entries, src/tables.rs:90-122),
   or a length/distance pair, or EOF.  Decisions and errors become per-lane
   status codes; results are fixed-layout records ``(lit_bytes, lit_count,
   length, dist)`` written at the iteration index — no data-dependent
   scatter.

2. **Materialize phase** — records expand to bytes with vectorized prefix
   sums: record output offsets via cumsum, literal bytes via one scatter,
   and LZ77 back-references via **pointer doubling**: every output position
   gets a source pointer ``src[i] = i - dist``, and ``log2(len)`` rounds of
   ``p = p[p]`` collapse arbitrary copy chains (including overlapping
   dist<length RLE) to literal positions.

The streaming host decompressor (models/decompressor.py) is the bit-exact
oracle; the host wrapper here handles zlib/stored-block framing, multi-block
streams (tables rebuilt between device launches), and checksums.
"""

from __future__ import annotations

import functools

import numpy as np

from .. import errors as E
from ..huffman import FIXED_DIST_TABLE, FIXED_LITLEN_TABLE, build_table
from ..tables import (
    CLCL_ORDER,
    DEFAULT_DIST_TABLE_SIZE,
    DEFAULT_LITLEN_TABLE_SIZE,
    DISTANCE_TABLE_ENTRIES,
    LITLEN_TABLE_ENTRIES,
)

WINDOW = 32768

# Per-lane status codes (see errors.Status for the host-visible taxonomy).
_OK = 0
_EOB = 1          # reached end of block (not an error)
_ERR_LITLEN = int(E.Status.INVALID_LITERAL_LENGTH_CODE)
_ERR_DIST = int(E.Status.INVALID_DISTANCE_CODE)
_ERR_TOO_FAR = int(E.Status.DISTANCE_TOO_FAR_BACK)
_ERR_TRUNC = int(E.Status.INSUFFICIENT_INPUT)
_STOPPED = 2      # reached its bit_stop position (speculative chunk decode)


# ---------------------------------------------------------------------------
# Phase 1: symbol decode
# ---------------------------------------------------------------------------


def decode_symbols(
    words,        # u32[B, Wmax]  stream bits, little-endian u32 words
    bit_pos,      # i32[B]        current bit position per stream
    bit_end,      # i32[B]        total valid bits per stream
    out_pos,      # i32[B]        bytes already produced (for dist checks)
    active,       # bool[B]       lanes to decode this launch
    table_id,     # i32[B]        row into the stacked tables
    litlen,       # u32[T, 4096]
    litlen_sec,   # u32[T, S]
    dist,         # u32[T, 512]
    dist_sec,     # u32[T, S2]
    max_steps: int,
    bit_stop=None,  # i32[B] — optional stop positions (speculative chunks)
    chain: int = 4,
    stream_row=None,  # i32[B] — row of `words` per lane (chunk lanes share
                      # their stream's words instead of duplicating them)
    litlen_first=None,  # i32[T, 4096] — first-symbol code lengths; when
                        # given, a double-literal entry whose second symbol
                        # starts exactly at ``bit_stop`` is split so chunk
                        # lanes never consume the next lane's symbols
    lut_matmul: bool = False,  # single-table batches only: entry lookups as
                               # one-hot matmuls (MXU) instead of gathers
):
    """Run up to ``max_steps`` decode steps on every active lane.

    ``chain`` (1, 2 or 4) sets how many consecutive literal table entries one
    step may consume — each entry resolves up to two output bytes, so a step
    emits up to ``2 * chain`` literals.  A chain stops at any non-literal
    entry, so it can never run past the end-of-block symbol.  Speculative
    chunk decoding uses ``chain=1`` so every symbol boundary is recorded for
    stitching.

    Returns (records, state): records are ``(lit_lo, lit_hi, lit_count,
    length, dist, bit_pos_at_step)`` each ``[max_steps, B]``; state is
    ``(bit_pos, out_pos, status)`` where status is ``_OK`` (ran out of
    steps), ``_EOB``, ``_STOPPED`` (crossed ``bit_stop``), or an error code.
    """
    import jax
    import jax.numpy as jnp

    B = bit_pos.shape[0]
    i32 = jnp.int32

    rows = jnp.arange(B) if stream_row is None else stream_row

    if lut_matmul:
        assert litlen.shape[0] == 1, "matmul LUT requires a shared table set"
        # Entries split into byte columns: values <= 255 stay exact even
        # when the backend lowers f32 dots through bf16 passes.
        def byte_cols(t, nbytes):
            return jnp.stack(
                [((t >> (8 * j)) & 0xFF).astype(jnp.float32) for j in range(nbytes)],
                axis=1,
            )

        lit_cols = byte_cols(litlen[0], 4)
        if litlen_first is not None:
            lit_cols = jnp.concatenate(
                [lit_cols, litlen_first[0].astype(jnp.float32)[:, None]], axis=1
            )
        dist_cols = byte_cols(dist[0], 4)

        def reassemble(out):
            return (
                out[:, 0].astype(jnp.uint32)
                | (out[:, 1].astype(jnp.uint32) << 8)
                | (out[:, 2].astype(jnp.uint32) << 16)
                | (out[:, 3].astype(jnp.uint32) << 24)
            )

        def lit_lookup(idx):
            oh = jax.nn.one_hot(idx, litlen.shape[1], dtype=jnp.float32)
            out = (oh @ lit_cols).astype(jnp.int32)
            e = reassemble(out)
            fl = out[:, 4] if litlen_first is not None else None
            return e, fl

        def dist_lookup(idx):
            oh = jax.nn.one_hot(idx, dist.shape[1], dtype=jnp.float32)
            return reassemble((oh @ dist_cols).astype(jnp.int32))
    else:

        def lit_lookup(idx):
            e = litlen[table_id, idx].astype(jnp.uint32)
            fl = (
                litlen_first[table_id, idx]
                if litlen_first is not None
                else None
            )
            return e, fl

        def dist_lookup(idx):
            return dist[table_id, idx].astype(jnp.uint32)

    Wlast = words.shape[1] - 1

    def load_word(widx):
        return words[rows, jnp.minimum(widx, Wlast)].astype(jnp.uint32)

    # Carried 96-bit window: (w0, w1, w2) hold words[base .. base+2] with the
    # invariant bpos - 32*base in [0, 32).  A decode step needs at most 32
    # bits at an offset <= 24 past bpos (<= 56 < 96), so peeks are pure
    # shifts; refilling after a step costs at most two masked gathers
    # instead of six unconditional ones.
    def make_peek(bpos, base, w0, w1, w2):
        def peek(off):
            o = (bpos - (base << 5)) + off
            sel = o >= 32
            a = jnp.where(sel, w1, w0)
            b = jnp.where(sel, w2, w1)
            oo = (o & 31).astype(jnp.uint32)
            lo = a >> oo
            hi = jnp.where(oo == 0, jnp.uint32(0), b << (32 - oo).astype(jnp.uint32))
            return lo | hi

        return peek

    def refill(new_bpos, base, w0, w1, w2):
        for _ in range(2):
            need = (new_bpos >> 5) > base
            w0 = jnp.where(need, w1, w0)
            w1 = jnp.where(need, w2, w1)
            base = jnp.where(need, base + 1, base)
            w2 = jnp.where(need, load_word(base + 2), w2)
        return base, w0, w1, w2

    # Length/distance base+extra have closed forms (RFC 1951's tables are
    # geometric), saving four per-lane gathers per iteration:
    #   len sym 257+i:  extra = 0 (i<8) else min((i-4)>>2, 5); i=28 -> 0
    #                   base  = i+3 (i<8) else ((4+(i&3)) << extra) + 3; 258
    #   dist sym s:     extra = max(s/2 - 1, 0)
    #                   base  = s+1 (s<2) else ((2+(s&1)) << extra) + 1
    def len_sym_decode(li):
        extra = jnp.where(li < 8, 0, jnp.minimum((li - 4) >> 2, 5))
        extra = jnp.where(li >= 28, 0, extra)
        base = jnp.where(
            li < 8,
            li + 3,
            ((4 + (li & 3)) << jnp.maximum((li - 4) >> 2, 0)) + 3,
        )
        base = jnp.where(li >= 28, 258, base)
        return base, extra

    def dist_sym_decode(s):
        extra = jnp.maximum(s // 2 - 1, 0)
        base = jnp.where(s < 2, s + 1, ((2 + (s & 1)) << extra) + 1)
        return base, extra

    rec_lit = jnp.zeros((max_steps, B), jnp.uint32)
    rec_lit_hi = jnp.zeros((max_steps, B), jnp.uint32)
    rec_cnt = jnp.zeros((max_steps, B), jnp.int8)
    rec_len = jnp.zeros((max_steps, B), jnp.int32)
    rec_dst = jnp.zeros((max_steps, B), jnp.int32)
    rec_pos = jnp.full((max_steps, B), -1, jnp.int32)

    if bit_stop is None:
        bit_stop = jnp.full((B,), 0x7FFFFFFF, jnp.int32)

    status0 = jnp.where(active, _OK, _EOB).astype(jnp.int8)
    base0 = bit_pos >> 5
    w0_init = load_word(base0)
    w1_init = load_word(base0 + 1)
    w2_init = load_word(base0 + 2)

    def cond(state):
        i, _, _, status, *_ = state
        return (i < max_steps) & jnp.any(status == _OK)

    def body(state):
        (i, bpos, opos, status, base, w0, w1, w2,
         rl, rlh, rc, rn, rd, rp) = state
        running = status == _OK
        peek = make_peek(bpos, base, w0, w1, w2)

        ubits = peek(0)
        e, fl = lit_lookup((ubits & 4095).astype(i32))
        ecode_bits = (e & 0xFF).astype(i32)

        is_lit = (e & 0x8000) != 0
        # Chained literal lookups (multi-byte output per gather).  Two codes
        # fit in one 32-bit window (<=24 bits); chains of 3-4 refetch once.
        lit_lo = jnp.zeros((B,), jnp.uint32)
        lit_hi = jnp.zeros((B,), jnp.uint32)

        def place(lo, hi, lit, byte_off, active_mask):
            sh = (8 * byte_off).astype(jnp.uint32)
            sh_a = jnp.minimum(sh, 31)
            sh_b = jnp.minimum(jnp.maximum(sh.astype(i32) - 32, 0), 31).astype(jnp.uint32)
            lo_c = jnp.where(sh < 32, lit << sh_a, 0)
            hi_c = jnp.where(sh < 32, (lit >> 1) >> (31 - sh_a), lit << sh_b)
            lo = jnp.where(active_mask, lo | lo_c, lo)
            hi = jnp.where(active_mask, hi | hi_c, hi)
            return lo, hi

        cnt1 = ((e >> 8) & 0xF).astype(i32)
        lit1 = ((e >> 16) & 0xFFFF).astype(jnp.uint32)
        if litlen_first is not None:
            cross = is_lit & (bpos + ecode_bits > bit_stop)
            ecode_bits = jnp.where(cross, fl, ecode_bits)
            cnt1 = jnp.where(cross, 1, cnt1)
            lit1 = jnp.where(cross, lit1 & 0xFF, lit1)
        lit_lo, lit_hi = place(lit_lo, lit_hi, lit1, jnp.zeros((B,), i32), is_lit)
        lit_count = jnp.where(is_lit, cnt1, 0)
        lit_bits = jnp.where(is_lit, ecode_bits, 0)
        chained = is_lit
        if litlen_first is not None:
            chained = chained & ~cross

        def chain_level(idx_bits, chained, lit_lo, lit_hi, lit_count, lit_bits):
            """One chained literal lookup with chunk-stop handling."""
            e_n, fl_n = lit_lookup((idx_bits & 4095).astype(i32))
            ok_n = chained & ((e_n & 0x8000) != 0) & (bpos + lit_bits < bit_stop)
            bits_n = (e_n & 0xFF).astype(i32)
            cnt_n = ((e_n >> 8) & 0xF).astype(i32)
            lit_n = ((e_n >> 16) & 0xFFFF).astype(jnp.uint32)
            if litlen_first is not None:
                cross_n = ok_n & (bpos + lit_bits + bits_n > bit_stop)
                bits_n = jnp.where(cross_n, fl_n, bits_n)
                cnt_n = jnp.where(cross_n, 1, cnt_n)
                lit_n = jnp.where(cross_n, lit_n & 0xFF, lit_n)
            else:
                cross_n = jnp.zeros_like(ok_n)
            lit_lo, lit_hi = place(lit_lo, lit_hi, lit_n, lit_count, ok_n)
            lit_count = jnp.where(ok_n, lit_count + cnt_n, lit_count)
            lit_bits = jnp.where(ok_n, lit_bits + bits_n, lit_bits)
            return ok_n & ~cross_n, lit_lo, lit_hi, lit_count, lit_bits

        if chain >= 2:
            bits2 = ubits >> ecode_bits.astype(jnp.uint32)
            chained, lit_lo, lit_hi, lit_count, lit_bits = chain_level(
                bits2, chained, lit_lo, lit_hi, lit_count, lit_bits
            )

        if chain >= 4:
            # Refetch a fresh 32-bit window past the first two codes.
            bits_before3 = lit_bits
            bits3 = peek(lit_bits)
            chained, lit_lo, lit_hi, lit_count, lit_bits = chain_level(
                bits3, chained, lit_lo, lit_hi, lit_count, lit_bits
            )
            bits4 = bits3 >> (lit_bits - bits_before3).astype(jnp.uint32)
            chained, lit_lo, lit_hi, lit_count, lit_bits = chain_level(
                bits4, chained, lit_lo, lit_hi, lit_count, lit_bits
            )

        # Non-literal: secondary table, length entry, EOF, or invalid.
        exceptional = (e & 0x4000) != 0
        has_secondary = (e & 0x2000) != 0
        sec_idx = ((e >> 16).astype(i32) + ((ubits >> 12) & (e & 0xFF)).astype(i32))
        se = litlen_sec[table_id, jnp.clip(sec_idx, 0, litlen_sec.shape[1] - 1)].astype(i32)
        sec_sym = se >> 4
        sec_bits = se & 0xF

        # symbol resolution for the length path
        #  - non-exceptional length entry: base/extra from the entry
        #  - secondary: lit / EOF / length symbol
        sec_is_lit = has_secondary & (sec_sym < 256)
        sec_is_eof = has_secondary & (sec_sym == 256)
        sec_is_len = has_secondary & (sec_sym > 256)
        plain_len = ~is_lit & ~exceptional
        plain_eof = ~is_lit & exceptional & ~has_secondary & (ecode_bits != 0)
        invalid_ll = ~is_lit & exceptional & ~has_secondary & (ecode_bits == 0)

        lsym_idx = jnp.clip(sec_sym - 257, 0, 30)
        lb_f, le_f = len_sym_decode(lsym_idx)
        length_base = jnp.where(plain_len, (e >> 16).astype(i32), lb_f)
        length_extra = jnp.where(
            plain_len, ((e >> 8) & 0xFF).astype(i32), le_f
        )
        ll_bits = jnp.where(plain_len, ecode_bits, sec_bits)

        is_len = plain_len | sec_is_len
        rem = ubits >> ll_bits.astype(jnp.uint32)
        length = length_base + (rem & ((jnp.uint32(1) << length_extra.astype(jnp.uint32)) - 1)).astype(i32)

        # Distance decode at bit_pos + ll_bits + length_extra.
        dbits = peek(ll_bits + length_extra)
        de = dist_lookup((dbits & 511).astype(i32))
        d_is_prim = (de & 0x8000) != 0
        d_sec_idx = ((de >> 16).astype(i32) + ((dbits >> 9) & (de & 0xFF)).astype(i32))
        dse = dist_sec[table_id, jnp.clip(d_sec_idx, 0, dist_sec.shape[1] - 1)].astype(i32)
        d_sec_sym = dse >> 4
        d_invalid = ~d_is_prim & (((de >> 8) == 0) | (d_sec_sym >= 30))
        db_f, de_f = dist_sym_decode(jnp.clip(d_sec_sym, 0, 29))
        dist_base = jnp.where(d_is_prim, (de >> 16).astype(i32), db_f)
        dist_extra = jnp.where(d_is_prim, ((de >> 8) & 0xF).astype(i32), de_f)
        d_code_bits = jnp.where(d_is_prim, (de & 0xFF).astype(i32), dse & 0xF)
        drem = dbits >> d_code_bits.astype(jnp.uint32)
        distance = dist_base + (drem & ((jnp.uint32(1) << dist_extra.astype(jnp.uint32)) - 1)).astype(i32)

        # Consumed bits per outcome.
        consumed = jnp.where(
            is_lit,
            lit_bits,
            jnp.where(
                sec_is_lit | sec_is_eof,
                sec_bits,
                jnp.where(
                    plain_eof,
                    ecode_bits,
                    ll_bits + length_extra + d_code_bits + dist_extra,
                ),
            ),
        )

        # Truncation: consuming past the end of the stream.
        truncated = running & (bpos + consumed > bit_end)

        is_eof = plain_eof | sec_is_eof
        too_far = is_len & (distance > opos)

        err = jnp.where(
            invalid_ll,
            _ERR_LITLEN,
            jnp.where(
                is_len & d_invalid,
                _ERR_DIST,
                jnp.where(is_len & too_far, _ERR_TOO_FAR, _OK),
            ),
        ).astype(jnp.int8)
        err = jnp.where(truncated, jnp.int8(_ERR_TRUNC), err)

        commit = running & ~truncated & (err == _OK) & ~is_eof

        out_lit = jnp.where(commit & is_lit, lit_lo, 0)
        out_lit_hi = jnp.where(commit & is_lit, lit_hi, 0)
        sec_lit_commit = commit & sec_is_lit
        out_lit = jnp.where(sec_lit_commit, sec_sym.astype(jnp.uint32), out_lit)
        out_cnt = jnp.where(
            commit,
            jnp.where(is_lit, lit_count, jnp.where(sec_is_lit, 1, 0)),
            0,
        ).astype(jnp.int8)
        out_len = jnp.where(commit & is_len, length, 0)
        out_dst = jnp.where(commit & is_len, distance, 0)

        rl = rl.at[i].set(out_lit)
        rlh = rlh.at[i].set(out_lit_hi)
        rc = rc.at[i].set(out_cnt)
        rn = rn.at[i].set(out_len)
        rd = rd.at[i].set(out_dst)
        rp = rp.at[i].set(jnp.where(running, bpos, -1))

        new_bpos = jnp.where(commit | (running & is_eof & ~truncated), bpos + consumed, bpos)
        new_opos = opos + out_cnt.astype(i32) + out_len
        new_status = jnp.where(
            running,
            jnp.where(
                truncated | (err != _OK),
                jnp.where(truncated, jnp.int8(_ERR_TRUNC), err),
                jnp.where(
                    is_eof,
                    jnp.int8(_EOB),
                    jnp.where(
                        new_bpos >= bit_stop, jnp.int8(_STOPPED), jnp.int8(_OK)
                    ),
                ),
            ),
            status,
        )
        new_base, nw0, nw1, nw2 = refill(new_bpos, base, w0, w1, w2)
        return (
            i + 1, new_bpos, new_opos, new_status, new_base, nw0, nw1, nw2,
            rl, rlh, rc, rn, rd, rp,
        )

    init = (
        jnp.int32(0), bit_pos, out_pos, status0,
        base0, w0_init, w1_init, w2_init,
        rec_lit, rec_lit_hi, rec_cnt, rec_len, rec_dst, rec_pos,
    )
    out_state = jax.lax.while_loop(cond, body, init)
    _, bpos, opos, status = out_state[:4]
    rl, rlh, rc, rn, rd, rp = out_state[8:]
    return (rl, rlh, rc, rn, rd, rp), (bpos, opos, status)


# ---------------------------------------------------------------------------
# Phase 2: materialization
# ---------------------------------------------------------------------------


def materialize(records, window, produced, out_capacity: int,
                ptr_rounds: int | None = None, want_window: bool = True,
                max_lit_bytes: int = 8):
    """Expand decode records into output bytes.

    Args:
      records: ``(lit_lo[K,B], lit_hi[K,B], cnt[K,B], len[K,B], dist[K,B])``.
      window: uint8[B, 32768] — prior output (back-reference context),
        right-aligned (last byte = most recent).
      produced: i32[B] — bytes this launch will produce (from the symbol
        phase), used only for masking.
      out_capacity: static bound on ``produced``.

    Returns uint8[B, out_capacity] plus the updated window.
    """
    import jax
    import jax.numpy as jnp

    rl, rlh, rc, rn, rd = records[:5]
    K, B = rl.shape
    i32 = jnp.int32

    adv = rc.astype(i32) + rn  # [K, B] bytes per record
    advT = adv.T  # [B, K]
    start = jnp.cumsum(advT, axis=1) - advT  # exclusive prefix, per stream

    ext = WINDOW + out_capacity
    if ptr_rounds is None:
        ptr_rounds = max(1, (ext - 1).bit_length())

    # --- literal scatter -------------------------------------------------
    # Each record contributes up to 8 literal bytes at start..start+cnt
    # (4-deep chained double-literal entries).
    litT = rl.T.astype(jnp.uint32)
    litHT = rlh.T.astype(jnp.uint32)
    cntT = rc.T.astype(i32)
    row = jax.lax.broadcasted_iota(i32, (B, K), 0)
    drop = B * ext

    # Literal bytes scatter word-granular: a record's <=8 bytes (already
    # packed into two u32s with zeros past cnt) shift to the byte offset
    # within their first word and land with three scatter passes instead of
    # eight byte passes; one elementwise unpack turns words back to bytes.
    assert ext % 4 == 0
    extw = ext // 4
    dropw = B * extw
    bytepos = WINDOW + start  # [B, K]
    s = ((bytepos & 3) * 8).astype(jnp.uint32)
    s_c = jnp.minimum(s, 31)

    def rsh32(x, sh):  # x >> (32 - sh), 0 when sh == 0
        return jnp.where(sh == 0, jnp.uint32(0), x >> (32 - jnp.minimum(sh, 31)))

    w0c = (litT << s_c).astype(jnp.uint32)
    if max_lit_bytes <= 4:
        # Foreign-kernel records pack <= 2 literals into litT (lit_hi is
        # structurally zero, recs_to_records): the contribution spans at
        # most two words, so the third record-sized scatter is skipped.
        parts = ((0, w0c), (1, rsh32(litT, s)))
    else:
        w1c = rsh32(litT, s) | (litHT << s_c)
        w2c = rsh32(litHT, s)
        parts = ((0, w0c), (1, w1c), (2, w2c))
    wordpos = row * extw + (bytepos >> 2)
    words_st = jnp.zeros(B * extw, jnp.int32)
    has = cntT > 0
    for off, wc in parts:
        tgt = jnp.where(has, wordpos + off, dropw)
        words_st = words_st.at[tgt.reshape(-1)].add(
            jnp.where(has, wc.astype(jnp.int32), 0).reshape(-1), mode="drop"
        )
    words_st = words_st.reshape(B, extw, 1)
    shifts = jnp.array([0, 8, 16, 24], jnp.int32).reshape(1, 1, 4)
    vals = ((words_st >> shifts) & 0xFF).reshape(B, ext)

    # --- back-reference pointers ----------------------------------------
    lenT = rn.T
    dstT = rd.T
    is_ref = lenT > 0
    posi = jax.lax.broadcasted_iota(i32, (B, ext), 1)
    tgt = jnp.where(advT > 0, row * ext + WINDOW + start, drop)
    if ext <= (1 << 24):
        # Packed-key fill: per-position (rec_start, dist) from TWO
        # scatter-max + cummax passes over uint32 keys
        #   k1 = start << 8 | has_dist << 7 | (dist-1) >> 8   (24 + 8 bits)
        #   k2 = start << 8 | (dist-1) & 255                  (24 + 8 bits)
        # (dist spans [1, 32768] — 16 bits — so it packs as has + 15-bit
        # dist-1).  Both keys are strictly increasing in start, so a
        # running max carries the CONTAINING record's fields to every
        # position.  This replaces the round-2 formulation's
        # take_along_axis(dist_at_start, rec_start): scans cost ~0.4
        # ns/element on this part but gathers ~7-11 (bench/probe_gather),
        # so the gather dominated the whole pointer phase.  (A single-key
        # variant needs 40 bits; the older rec_id*2^16+dist key overflowed
        # int32 past 32767 records.)
        u32 = jnp.uint32
        s_abs = (WINDOW + start).astype(u32)
        has_d = is_ref & (advT > 0)
        dm1 = jnp.maximum(jnp.where(is_ref, dstT, 0) - 1, 0).astype(u32)
        k1 = jnp.where(
            advT > 0,
            (s_abs << 8) | (has_d.astype(u32) << 7) | (dm1 >> 8),
            u32(0))
        k2 = jnp.where(advT > 0, (s_abs << 8) | (dm1 & 0xFF), u32(0))
        # NOT sorted: empty records scatter to the drop slot (B*ext),
        # which interleaves out-of-order indices — a false sortedness
        # promise silently corrupts TPU scatters (see _pack_blocked).
        c1 = jnp.zeros(B * ext, u32).at[tgt.reshape(-1)].max(
            k1.reshape(-1), mode="drop")
        c2 = jnp.zeros(B * ext, u32).at[tgt.reshape(-1)].max(
            k2.reshape(-1), mode="drop")
        c1 = jax.lax.cummax(c1.reshape(B, ext), axis=1)
        c2 = jax.lax.cummax(c2.reshape(B, ext), axis=1)
        # rec_start stays in posi coordinates (the keys pack WINDOW+start).
        # A zero key (no record seen yet) decodes to rec_start=0, dist=0 ->
        # not a copy, matching the legacy path's -1 sentinel semantics.
        rec_start = (c1 >> 8).astype(i32)
        pos_dist = jnp.where(
            (c1 & 128) != 0,
            ((((c1 & 127) << 8) | (c2 & 0xFF)) + 1).astype(i32),
            0)
    else:
        # Legacy fill for outputs past 2^24: record id per position via
        # marks + cummax, dist gathered at the record start.
        marks = jnp.zeros((B, ext), jnp.int32)
        marks = (
            marks.reshape(-1)
            .at[tgt.reshape(-1)]
            .add(1, mode="drop")
            .reshape(B, ext)
        )
        dist_at_start = jnp.zeros((B, ext), jnp.int32)
        tgt_ref = jnp.where(is_ref, row * ext + WINDOW + start, drop)
        dist_at_start = (
            dist_at_start.reshape(-1)
            .at[tgt_ref.reshape(-1)]
            .add(jnp.where(is_ref, dstT, 0).reshape(-1), mode="drop")
            .reshape(B, ext)
        )
        rec_start = jax.lax.cummax(jnp.where(marks > 0, posi, -1), axis=1)
        pos_dist = jnp.take_along_axis(
            dist_at_start, jnp.maximum(rec_start, 0), axis=1)

    produced_col = WINDOW + produced[:, None]
    in_new = (posi >= WINDOW) & (posi < produced_col)
    is_copy = in_new & (pos_dist > 0)

    # Single-hop pointers: a backref record copies a dist-periodic pattern,
    # so every position inside it maps STRAIGHT to the pattern source just
    # before the record: start - d + ((i - start) mod d).  This collapses
    # within-record chains (a 258-byte dist-1 run resolves in one hop
    # instead of 258), leaving only cross-record chains for the doubling.
    d_safe = jnp.maximum(pos_dist, 1)
    hop = rec_start - d_safe + (posi - rec_start) % d_safe
    ptr = jnp.where(is_copy, hop, posi)

    # Distance-1 chains (RLE — the dominant case for PNG-style streams)
    # collapse entirely with one cummax: every position in a maximal span of
    # dist-1 records copies the nearest byte left of the span.
    is_d1 = is_copy & (pos_dist == 1)
    left_non_d1 = jax.lax.cummax(jnp.where(~is_d1, posi, -1), axis=1)
    ptr = jnp.where(is_d1, left_non_d1, ptr)

    # Pointer doubling: each round squares the resolved cross-record chain
    # depth, so ceil(log2(max record-chain depth)) rounds reach the fixed
    # point; ext's bit length is the safe upper bound.  The single-hop and
    # dist-1 collapses above already flatten within-record and RLE chains,
    # leaving only genuinely NESTED cross-record references — typically a
    # handful deep — so the loop runs as a fixed-point iteration that stops
    # as soon as a round changes nothing (a [B, ext] compare+reduce per
    # round, ~10% of the gather it avoids) instead of always paying the
    # log2(ext) worst-case rounds.
    def _ptr_cond(c):
        p, changed, i = c
        return changed & (i < ptr_rounds)

    def _ptr_body(c):
        p, _, i = c
        p2 = jnp.take_along_axis(p, p, axis=1)
        return p2, jnp.any(p2 != p), i + 1

    p, _, _ = jax.lax.while_loop(
        _ptr_cond, _ptr_body, (ptr, jnp.bool_(True), jnp.int32(0))
    )

    base = jnp.concatenate([window.astype(jnp.int32), vals[:, WINDOW:]], axis=1)
    out_ext = jnp.take_along_axis(base, p, axis=1)
    out = out_ext[:, WINDOW:].astype(jnp.uint8)
    out = jnp.where(in_new[:, WINDOW:], out, 0)

    if not want_window:
        # Single-shot callers (block-parallel discovery, batch stitch)
        # never read the updated window; skip its output-sized gather.
        return out, window

    # New window: last 32K of (window ++ produced output), per stream.
    full = jnp.concatenate([window.astype(jnp.int32), out.astype(jnp.int32)], axis=1)
    shift = produced  # how far the window advanced
    idx = jnp.clip(
        jax.lax.broadcasted_iota(i32, (B, WINDOW), 1) + shift[:, None],
        0,
        full.shape[1] - 1,
    )
    new_window = jnp.take_along_axis(full, idx, axis=1).astype(jnp.uint8)
    return out, new_window


# ---------------------------------------------------------------------------
# Host orchestration
# ---------------------------------------------------------------------------


class _HostBitReader:
    """Host-side bit reader for block headers (whole buffer available)."""

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos

    def bits_left(self) -> int:
        return len(self.data) * 8 - self.pos

    def peek(self, n: int) -> int:
        byte0 = self.pos >> 3
        window = int.from_bytes(self.data[byte0 : byte0 + 9], "little")
        return (window >> (self.pos & 7)) & ((1 << n) - 1)

    def take(self, n: int) -> int:
        if self.bits_left() < n:
            raise E.InsufficientInput()
        v = self.peek(n)
        self.pos += n
        return v


def _parse_dynamic_header(r: _HostBitReader):
    """Parse HLIT/HDIST/HCLEN + code lengths; build the block's tables.

    Same semantics as models/decompressor (reference: src/decompress.rs:
    415-434, 440-555) but for whole-buffer input.
    """
    lengths, hlit = _parse_dynamic_lengths(r)
    return _tables_from_lengths(lengths, hlit)


def _tables_from_lengths(lengths: np.ndarray, hlit: int):
    """Build reference-format decode tables from parsed code lengths."""
    litlen = build_table(
        lengths[:hlit], LITLEN_TABLE_ENTRIES, DEFAULT_LITLEN_TABLE_SIZE,
        is_distance_table=False, double_literal=True,
    )
    if not litlen.ok:
        raise E.BadCodeLengthHuffmanTree()
    dist_lengths = lengths[288:320]
    if not dist_lengths.any():
        dist_primary = np.zeros(DEFAULT_DIST_TABLE_SIZE, np.uint32)
        dist_secondary = np.zeros(0, np.uint16)
    else:
        dist = build_table(
            dist_lengths, DISTANCE_TABLE_ENTRIES, DEFAULT_DIST_TABLE_SIZE,
            is_distance_table=True, double_literal=False,
        )
        if not dist.ok:
            raise E.BadDistanceHuffmanTree()
        dist_primary = dist.primary
        dist_secondary = dist.secondary
    return litlen.primary, litlen.secondary, dist_primary, dist_secondary


def _parse_dynamic_lengths(r: _HostBitReader):
    """Parse a dynamic block header up to its code lengths.

    Returns (lengths i64[320], hlit): litlen code lengths at [0:hlit]
    (zero past hlit), distance code lengths at [288:288+hdist].  Raises
    the same errors, in the same order, as table construction would.
    """
    hlit = r.take(5) + 257
    hdist = r.take(5) + 1
    hclen = r.take(4) + 4
    if hlit > 286:
        raise E.InvalidHlit()
    if hdist > 30:
        raise E.InvalidHdist()

    cl_lengths = np.zeros(19, np.int64)
    for i in range(hclen):
        cl_lengths[CLCL_ORDER[i]] = r.take(3)
    cl = build_table(cl_lengths, None, 128, is_distance_table=False, double_literal=False)
    if not cl.ok:
        raise E.BadCodeLengthHuffmanTree()

    lengths = np.zeros(320, np.int64)
    n = 0
    total = hlit + hdist
    while n < total:
        if r.bits_left() < 7:
            raise E.InsufficientInput()
        entry = int(cl.primary[r.peek(7)])
        length = entry & 0x7
        symbol = (entry >> 16) & 0xFF
        if symbol <= 15:
            lengths[n] = symbol
            n += 1
            r.take(length)
        else:
            if symbol == 16:
                base, extra = 3, 2
            elif symbol == 17:
                base, extra = 3, 3
            else:
                base, extra = 11, 7
            r.take(length)
            if symbol == 16:
                if n == 0:
                    raise E.InvalidCodeLengthRepeat()
                value = lengths[n - 1]
            else:
                value = 0
            repeat = r.take(extra) + base
            if n + repeat > total:
                raise E.InvalidCodeLengthRepeat()
            lengths[n : n + repeat] = value
            n += repeat

    lengths[288 : 288 + hdist] = lengths[hlit:total].copy()
    lengths[hlit:288] = 0
    lengths[288 + hdist : 320] = 0

    if lengths[256] == 0:
        raise E.BadLiteralLengthHuffmanTree()
    return lengths, hlit


_FIXED_TABLES = None


def _fixed_tables():
    global _FIXED_TABLES
    if _FIXED_TABLES is None:
        litlen = np.tile(FIXED_LITLEN_TABLE, DEFAULT_LITLEN_TABLE_SIZE // 512)
        dist = np.tile(FIXED_DIST_TABLE, DEFAULT_DIST_TABLE_SIZE // 32)
        _FIXED_TABLES = (litlen, np.zeros(0, np.uint16), dist, np.zeros(0, np.uint16))
    return _FIXED_TABLES


@functools.lru_cache(maxsize=32)
def _jit_decode(max_steps: int):
    import jax

    return jax.jit(
        functools.partial(decode_symbols, max_steps=max_steps),
    )


@functools.lru_cache(maxsize=1)
def _fixed_foreign_meta():
    from ..tables import FIXED_CODE_LENGTHS
    from .pallas_inflate import foreign_meta

    fl = np.asarray(FIXED_CODE_LENGTHS, np.int64)
    return foreign_meta(fl[:288], np.full(32, 5, np.int64))


_SEQ_WWIN_CAP = 6144  # words of compressed block visible per lane per launch


@functools.lru_cache(maxsize=8)
def _jit_seq_pallas(LB: int, B: int, wwin: int, K: int):
    """Jitted pallas-engine launch for the sequential batch path.

    Window gather + record kernel + unpack + dist validation in ONE program;
    returns everything the host loop needs as small per-stream vectors.
    """
    import jax
    import jax.numpy as jnp

    from . import pallas_inflate as PI

    nlanes = LB * 1024

    @jax.jit
    def run(words, start_w, pos0_b, meta_b, tab_b, out_pos, active):
        from .repack import SLAB, stage_windows_flat

        # Flatten per-stream rows with slab padding so each lane's window
        # start is one flat word offset; the stager slab-DMAs on TPU
        # (gathering wwin*B words per launch at ~7 ns/element dominated
        # resumed launches).
        Wmax = words.shape[1]
        Wpad = (Wmax + SLAB - 1) // SLAB * SLAB
        flat = jnp.concatenate([
            jnp.pad(words.astype(jnp.int32),
                    ((0, 0), (0, Wpad - Wmax))).reshape(-1),
            jnp.zeros((wwin + 3 * SLAB,), jnp.int32),
        ])
        starts_flat = jnp.pad(
            jnp.arange(B, dtype=jnp.int32) * Wpad
            + jnp.minimum(start_w, Wmax - 1),
            (0, nlanes - B))
        win = stage_windows_flat(flat, starts_flat, LB, wwin)
        recs, bpos, done = PI.decode_records_blocked(
            win, pos0_b, meta_b, tab_b, K=K)
        recs_t = jnp.transpose(recs, (1, 0, 2, 3)).reshape(K, nlanes)[:, :B]
        rl, rlh, rc, rn, rd = PI.recs_to_records(recs_t)
        act = active[None, :]
        rl = jnp.where(act, rl, 0)
        rc = jnp.where(act, rc, 0)
        rn = jnp.where(act, rn, 0)
        rd = jnp.where(act, rd, 0)
        adv = rc.astype(jnp.int32) + rn
        posg = out_pos[None, :] + jnp.cumsum(adv, axis=0) - adv
        bad = jnp.any((rd > 0) & (rd > posg), axis=0)
        produced = jnp.sum(adv, axis=0)
        return ((rl, rlh, rc, rn, rd), bpos.reshape(nlanes)[:B],
                done.reshape(nlanes)[:B], bad, produced)

    return run


def _seq_pallas_launch(states, active_np, words, max_steps: int,
                       dev_cache: dict | None = None):
    """One pallas-engine decode launch over the current blocks of all
    active streams.  Returns (records, bpos, status, produced) in the
    decode_symbols convention, with status ``-1`` marking streams whose
    launch hit a kernel anomaly (window overrun, invalid code, bad
    distance, truncation) and must be re-decoded exactly via the XLA
    engine.

    ``dev_cache`` keeps the blocked meta/table device arrays across
    launches: a block resumed from a window stall re-uses them instead of
    re-staging ~1 MB over the host link per launch.
    """
    import jax.numpy as jnp

    from .pallas_inflate import _TPAIRS, foreign_meta

    B = len(states)
    LB = (B + 1023) // 1024
    nlanes = LB * 1024
    # Bucket every shape key: each distinct kernel/program shape costs a
    # fresh compile (~20-60 s over the accelerator tunnel).  K and wwin go
    # to powers of two (the freeze/resume protocol makes K a latency knob,
    # not a correctness bound); the stream count pads to a bucket too.
    K = min(8192, 1 << max(4, (4 * max_steps - 1).bit_length()))
    Wmax = words.shape[1]
    wwin = min(1 << max(6, (Wmax - 1).bit_length()), _SEQ_WWIN_CAP)
    wwin += (-wwin) % 8

    start_w = np.zeros(B, np.int32)
    pos0 = np.zeros(nlanes, np.int32)
    for i, st in enumerate(states):
        if not active_np[i]:
            continue
        start_w[i] = st.bitpos >> 5
        pos0[i] = st.bitpos & 31
        if st.meta_tab is None:
            if st.lengths == "fixed":
                st.meta_tab = _fixed_foreign_meta()
            else:
                lengths, hlit = st.lengths
                st.meta_tab = foreign_meta(lengths[:hlit], lengths[288:320])
            st.table_epoch += 1

    def blocked(a):  # [nlanes, rows] -> [LB, rows, 8, 128]
        return np.ascontiguousarray(
            a.reshape(LB, 8, 128, -1).transpose(0, 3, 1, 2))

    # Keyed on monotonic per-stream table epochs (not object ids, which
    # CPython can reuse after GC): a launch resumed from a window stall in
    # the same blocks reuses the staged device tables.
    table_key = tuple(
        st.table_epoch if active_np[i] else -1
        for i, st in enumerate(states))
    if dev_cache is not None and dev_cache.get("key") == table_key:
        meta_d = dev_cache["meta"]
        tab_d = dev_cache["tab"]
    else:
        metas = np.zeros((nlanes, 64), np.int32)
        tabs = np.zeros((nlanes, _TPAIRS), np.int32)
        for i, st in enumerate(states):
            if active_np[i]:
                metas[i], tabs[i] = st.meta_tab
        meta_d = jnp.asarray(blocked(metas))
        tab_d = jnp.asarray(blocked(tabs))
        if dev_cache is not None:
            dev_cache.update(key=table_key, meta=meta_d, tab=tab_d)

    records, bpos, done, bad, produced = _jit_seq_pallas(LB, B, wwin, K)(
        words,
        jnp.asarray(start_w),
        jnp.asarray(blocked(pos0.reshape(nlanes, 1))[:, 0]),
        meta_d,
        tab_d,
        jnp.asarray(np.array([len(st.out) for st in states], np.int32)),
        jnp.asarray(active_np),
    )
    done_np = np.asarray(done)
    bad_np = np.asarray(bad)
    bpos_np = np.asarray(bpos).astype(np.int64) + start_w.astype(np.int64) * 32
    produced_np = np.asarray(produced)

    status = np.full(B, _EOB, np.int64)
    for i, st in enumerate(states):
        if not active_np[i]:
            continue
        bit_end = len(st.data) * 8
        # Lanes stalled at the staged window's edge freeze in-kernel with
        # their exact position (pallas_inflate stop_bits) and resume next
        # launch from a re-staged window; the only anomaly left for _OK
        # lanes is zero progress (safety net against host/kernel drift).
        anomaly = (
            bool(bad_np[i])
            or done_np[i] == 2
            or bpos_np[i] > bit_end
            or (done_np[i] == 0 and bpos_np[i] <= st.bitpos
                and produced_np[i] == 0)
        )
        if anomaly:
            status[i] = -1
        elif done_np[i] == 1:
            status[i] = _EOB
        else:
            status[i] = _OK
    return records, bpos_np, status, produced_np


@functools.lru_cache(maxsize=32)
def _jit_materialize(out_capacity: int):
    import jax

    return jax.jit(functools.partial(materialize, out_capacity=out_capacity))


class _StreamState:
    __slots__ = (
        "data", "bitpos", "out", "window", "done", "error", "last_block",
        "tables", "in_block", "lengths", "meta_tab", "needs_xla",
        "table_epoch",
    )

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0
        self.out = bytearray()
        self.window = np.zeros(WINDOW, np.uint8)
        self.done = False
        self.error: E.DecompressionError | None = None
        self.last_block = False
        self.tables = None
        self.in_block = False
        self.lengths = None      # ("fixed" | (lengths, hlit)) of current block
        self.meta_tab = None     # cached foreign_meta of current block
        self.needs_xla = False   # pallas engine hit an anomaly; redo exactly
        self.table_epoch = 0     # bumps when meta_tab is (re)computed


def _advance_headers(st: _StreamState) -> None:
    """Parse framing until the stream enters a compressed block or ends.

    Stored blocks are copied host-side (they are memcpys; no device value).
    """
    r = _HostBitReader(st.data, st.bitpos)
    try:
        if st.bitpos == 0:
            cmf = r.take(8)
            flg = r.take(8)
            if (
                cmf & 0x0F != 0x08
                or (cmf & 0xF0) > 0x70
                or flg & 0x20 != 0
                or ((cmf << 8) | flg) % 31 != 0
            ):
                raise E.BadZlibHeader()
        while not st.done and not st.in_block:
            if st.last_block:
                # checksum
                r.pos = (r.pos + 7) & ~7
                stored = int.from_bytes(
                    r.take(32).to_bytes(4, "little"), "big"
                )
                import zlib

                if stored != zlib.adler32(bytes(st.out)):
                    raise E.WrongChecksum()
                st.done = True
                st.bitpos = r.pos
                return
            header = r.take(3)
            st.last_block = bool(header & 1)
            btype = header >> 1
            if btype == 0b00:
                r.pos = (r.pos + 7) & ~7
                length = r.take(16)
                nlen = r.take(16)
                if nlen != (~length & 0xFFFF):
                    raise E.InvalidUncompressedBlockLength()
                byte0 = r.pos >> 3
                if len(st.data) - byte0 < length:
                    raise E.InsufficientInput()
                chunk = st.data[byte0 : byte0 + length]
                st.out += chunk
                _update_window(st, np.frombuffer(chunk, np.uint8))
                r.pos += length * 8
            elif btype == 0b01:
                st.tables = _fixed_tables()
                st.lengths = "fixed"
                st.meta_tab = None
                st.in_block = True
            elif btype == 0b10:
                lengths, hlit = _parse_dynamic_lengths(r)
                st.tables = _tables_from_lengths(lengths, hlit)
                st.lengths = (lengths, hlit)
                st.meta_tab = None
                st.in_block = True
            else:
                raise E.InvalidBlockType()
        st.bitpos = r.pos
    except E.DecompressionError as err:
        st.error = err
        st.done = True
        st.bitpos = r.pos


def _update_window(st: _StreamState, new: np.ndarray) -> None:
    if len(new) >= WINDOW:
        st.window = new[-WINDOW:].copy()
    elif len(new):
        st.window = np.concatenate([st.window[len(new) :], new])


def decompress_batch(
    streams: list[bytes],
    max_steps: int = 8192,
    out_capacity: int | None = None,
    try_parallel: bool = True,
    engine: str = "auto",
) -> list[bytes | E.DecompressionError]:
    """Decode many zlib streams with one device lane per stream.

    Returns, per stream, either the decompressed bytes or the error.

    Large streams first go through the block-parallel discovery path
    (parallel/discovery.try_foreign): all dynamic-block headers are found
    structurally in one host pre-scan, every block decodes in its own
    device lane in a SINGLE program, and one materialize launch resolves
    backrefs — no host round-trip per block.  Streams the discovery cannot
    cover (stored/fixed blocks, index-bearing tiny streams) fall through to
    the sequential path, where the device decodes compressed-block payloads
    and the host parses framing and rebuilds Huffman tables between blocks.
    """
    import jax.numpy as jnp

    results_par: dict[int, bytes] = {}
    if try_parallel:
        from ..parallel.discovery import try_foreign, try_foreign_batch

        # Multi-block streams start at ~64 KiB of payload (the host
        # compressors cut blocks at 16384 symbols); below that the
        # sequential path is already a single launch.
        big = [i for i, s in enumerate(streams) if len(s) >= 49152]
        if len(big) > 1:
            # Merge every big stream's blocks into shared kernel launches
            # (per-stream decode leaves most lanes idle).
            for i, r in zip(big, try_foreign_batch(
                    [streams[i] for i in big], max_steps=max_steps,
                    engine=engine)):
                if r is not None:
                    results_par[i] = r
        elif big:
            r = try_foreign(streams[big[0]], max_steps=max_steps)
            if r is not None:
                results_par[big[0]] = r
        if len(results_par) == len(streams):
            return [results_par[i] for i in range(len(streams))]
        streams_seq = [
            s for i, s in enumerate(streams) if i not in results_par
        ]
    else:
        streams_seq = streams
    seq_out = _decompress_batch_sequential(
        streams_seq, max_steps=max_steps, out_capacity=out_capacity,
        engine=engine,
    )
    results: list[bytes | E.DecompressionError] = []
    it = iter(seq_out)
    for i in range(len(streams)):
        results.append(results_par[i] if i in results_par else next(it))
    return results


def _decompress_batch_sequential(
    streams: list[bytes],
    max_steps: int = 8192,
    out_capacity: int | None = None,
    engine: str = "auto",
) -> list[bytes | E.DecompressionError]:
    """Per-block host-orchestrated decode (the universal path).

    ``engine`` picks the symbol phase: "pallas" decodes every stream's
    current block in the canonical record kernel (one lane per stream —
    dynamic AND fixed blocks, any trees); "xla" uses the table-gather
    ``decode_symbols`` loop.  "auto" = pallas on TPU backends.  The pallas
    engine falls back PER STREAM to the XLA engine on any kernel anomaly
    (invalid code, bad distance, window overrun, truncation) so the error
    taxonomy and committed output stay bit-identical to the tested path.
    """
    import jax
    import jax.numpy as jnp

    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "xla"
    if not streams:
        return []

    # Pad the batch to a power-of-two bucket with empty dummy streams so
    # device program shapes (decode launches, materialize) do not track
    # the caller's exact stream count — every distinct shape is a fresh
    # compile (~20-60 s over the accelerator tunnel).  Dummies go inert at
    # the first header parse; their results are dropped.
    B_real = len(streams)
    pad_to = 1 << max(0, (B_real - 1).bit_length())
    streams = list(streams) + [b""] * (pad_to - B_real)

    states = [_StreamState(s) for s in streams]
    for st in states:
        _advance_headers(st)

    B = len(states)
    Wmax = max((len(st.data) + 3) // 4 for st in states) + 2
    words_np = np.zeros((B, Wmax), np.uint32)
    for i, st in enumerate(states):
        padded = st.data + bytes((-len(st.data)) % 4) + bytes(8)
        words_np[i, : len(padded) // 4] = np.frombuffer(padded, "<u4")
    words = jnp.asarray(words_np)
    bit_end = jnp.asarray(
        np.array([len(st.data) * 8 for st in states], np.int32)
    )

    if out_capacity is None:
        # A record step produces <= 258 bytes; bound per launch.
        out_capacity = max_steps * 4  # tuned: raise for backref-heavy data
    seq_dev_cache: dict = {}
    # Device-resident window state for the pallas engine.  On pure
    # stall-resume launches (no stream crossed a block boundary) the
    # 32 KiB/stream window never needs the host: materialize's new_window
    # feeds the next launch directly, skipping a B x 32 KiB round-trip
    # over the host link each way.  Host copies go stale during such runs
    # and are refreshed in full on the next boundary/anomaly launch.
    win_dev = None  # device array, valid iff win_dev_fresh
    win_dev_fresh = False

    decode = _jit_decode(max_steps)

    while any(not st.done and st.in_block for st in states):
        active_np = np.array(
            [not st.done and st.in_block for st in states], bool
        )
        if engine == "pallas":
            records, bpos_np, status_np, produced_np = _seq_pallas_launch(
                states, active_np, words, max_steps, dev_cache=seq_dev_cache
            )
            anomalous = status_np == -1
            produced_np = np.where(anomalous, 0, produced_np)
            cap = int(produced_np.max(initial=0))
            cap = max(256, 1 << int(np.ceil(np.log2(max(cap, 1)))))
            if win_dev_fresh:
                window = win_dev
            else:
                window = jnp.asarray(np.stack([st.window for st in states]))
            out, new_window = _jit_materialize(cap)(
                records, window, jnp.asarray(produced_np.astype(np.int32))
            )
            out_np = np.asarray(out)
            stall_only = not any(
                active_np[i] and (anomalous[i] or status_np[i] == _EOB)
                for i in range(B)
            )
            if stall_only:
                # No stream needs host-side header parsing: leave windows
                # on device and skip the round-trip entirely.
                win_dev, win_dev_fresh = new_window, True
                new_window_np = None
            else:
                new_window_np = np.asarray(new_window)
                win_dev, win_dev_fresh = None, False
            for i, st in enumerate(states):
                if not active_np[i]:
                    continue
                if anomalous[i]:
                    st.needs_xla = True
                    st.done = True
                    continue
                st.out += out_np[i, : produced_np[i]].tobytes()
                if new_window_np is not None:
                    st.window = new_window_np[i]
                st.bitpos = int(bpos_np[i])
                if status_np[i] == _EOB:
                    st.in_block = False
                    _advance_headers(st)
            continue
        # Stack tables, deduplicating identical ones.
        table_rows = {}
        table_id = np.zeros(B, np.int32)
        stacked = []
        for i, st in enumerate(states):
            if not active_np[i] or st.tables is None:
                continue
            key = id(st.tables) if st.tables is _FIXED_TABLES else None
            hkey = (
                st.tables[0].tobytes(),
                st.tables[2].tobytes(),
                st.tables[1].tobytes(),
                st.tables[3].tobytes(),
            )
            if hkey not in table_rows:
                table_rows[hkey] = len(stacked)
                stacked.append(st.tables)
            table_id[i] = table_rows[hkey]

        T = max(len(stacked), 1)
        sec_max = max([len(t[1]) for t in stacked] + [1])
        dsec_max = max([len(t[3]) for t in stacked] + [1])
        litlen_np = np.zeros((T, DEFAULT_LITLEN_TABLE_SIZE), np.uint32)
        sec_np = np.zeros((T, sec_max), np.uint32)
        dist_np = np.zeros((T, DEFAULT_DIST_TABLE_SIZE), np.uint32)
        dsec_np = np.zeros((T, dsec_max), np.uint32)
        for t, (ll, ls, dd, ds) in enumerate(stacked):
            litlen_np[t] = ll
            sec_np[t, : len(ls)] = ls
            dist_np[t] = dd
            dsec_np[t, : len(ds)] = ds

        bit_pos = jnp.asarray(np.array([st.bitpos for st in states], np.int32))
        out_pos = jnp.asarray(np.array([len(st.out) for st in states], np.int32))
        window = jnp.asarray(np.stack([st.window for st in states]))

        records, (bpos, opos, statuses) = decode(
            words,
            bit_pos,
            bit_end,
            out_pos,
            jnp.asarray(active_np),
            jnp.asarray(table_id),
            jnp.asarray(litlen_np),
            jnp.asarray(sec_np),
            jnp.asarray(dist_np),
            jnp.asarray(dsec_np),
        )
        produced = opos - out_pos
        produced_np = np.asarray(produced)
        cap = int(produced_np.max(initial=0))
        cap = max(256, 1 << int(np.ceil(np.log2(max(cap, 1)))))
        out, new_window = _jit_materialize(cap)(records, window, produced)
        out_np = np.asarray(out)
        new_window_np = np.asarray(new_window)
        bpos_np = np.asarray(bpos)
        status_np = np.asarray(statuses)

        for i, st in enumerate(states):
            if not active_np[i]:
                continue
            st.out += out_np[i, : produced_np[i]].tobytes()
            st.window = new_window_np[i]
            st.bitpos = int(bpos_np[i])
            s = int(status_np[i])
            if s == _EOB:
                st.in_block = False
                _advance_headers(st)
            elif s == _OK:
                pass  # ran out of steps; continue same block
            else:
                st.error = E.error_for_status(s)
                st.done = True

    # Streams the pallas engine could not finish cleanly re-decode from
    # scratch on the exact XLA path (committed output + error taxonomy
    # bit-identical to the tested engine; anomalies are rare).
    redo = [i for i, st in enumerate(states) if st.needs_xla]
    redo_results: dict[int, bytes | E.DecompressionError] = {}
    if redo:
        rr = _decompress_batch_sequential(
            [streams[i] for i in redo], max_steps=max_steps,
            out_capacity=out_capacity, engine="xla",
        )
        redo_results = dict(zip(redo, rr))

    results: list[bytes | E.DecompressionError] = []
    for i, st in enumerate(states):
        if i in redo_results:
            results.append(redo_results[i])
        elif st.error is not None:
            results.append(st.error)
        elif not st.done:
            results.append(E.InsufficientInput())
        else:
            results.append(bytes(st.out))
    return results[:B_real]
