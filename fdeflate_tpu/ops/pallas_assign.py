"""Pallas token-assign kernel: raw bytes -> packed ultra-fast tokens.

Round-3 encode bottleneck: after the pack kernel removed the XLA scatter,
``_assign_tokens`` (ops/ultrafast_kernel) still cost ~63 ms per 16 MiB on
hardware (bench/probe_encmarg.py) — almost all of it the one-hot-matmul
literal lookup (XLA materializes a [N, 256] one-hot to HBM) and the
run-segmentation scans (cummax/cummin over [B, N]).  Both disappear in a
kernel: the lookup's one-hot lives in registers as a bounded select-reduce
scan, and run segmentation is a sequential per-lane state machine (the scan
that XLA needs log-passes for is just carried state here).

Semantics are exactly ``_assign_tokens`` with ``split_S == S`` (fixed
geometry, runs cut at lane boundaries) followed by the pair packing of
``pack_tokens_v2``: per byte slot one token (v | nb << 13), per pair its
chunk-relative start bit and bit count.  The reference's analogue is the
sequential run scanner of compress_simple/ultra_fast
(/root/reference/src/compress/mod.rs:87-131) — one byte at a time on a CPU;
here 1024 lanes of 8-byte steps on the VPU.

Key structural facts the kernel leans on:

* A zero-run's tail tokens (the <=4 literal zeros, or the length symbol +
  extra bits of a 5..257 tail) are only known at the run's END.  Emitting
  them at the LAST slots of the run (instead of the XLA version's
  ``q0``-anchored slots) preserves token order — the bitstream is
  identical — and bounds the revision reach-back to 4 slots.
* At most ONE run can end inside an 8-byte chunk (a mid-chunk gap means
  the chunk's suffix zeros start a NEW run that continues past the chunk),
  so the tail-symbol math runs once per step, not per byte.
* A step's revisions can only reach the previous step's slots, so a
  one-step flush lag suffices; at a grid-cell boundary the cell peeks at
  the NEXT step's first bytes (run-end position = the next chunk's first
  nonzero, capped by the aligned length) to apply cross-boundary revisions
  before flushing its last bank.  The lane end falls out for free: the
  input is padded with one zero step and the aligned clamp forces the
  peeked run-end to position 0.
* The literal code table is scanned in ZIGZAG value order (z interleaves
  b and 256-b), pair-packed two entries per row: filtered-IDAT bytes are
  small-magnitude deltas, so the dynamic scan bound usually covers a few
  of the 16 row-groups instead of all 256 entries.
* Length symbols for run tails come from RFC 1951's closed form
  (sym = 257 + 4e + ((T-3) >> e), e = bitlen(T-3) - 3), so only the
  29-entry trained-code lookup remains a table scan.

Oracle: tests/test_pallas_assign.py differentials against _assign_tokens +
pack_tokens_v2 on CPU (interpret mode) and the same path feeds the
hardware probe (bench/probe_assign.py).
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..tables import HUFFMAN_CODES, HUFFMAN_LENGTHS

LANE = 128


@functools.lru_cache(maxsize=None)
def _const_tables():
    """(ztab int32[128], lentab int32[16]) packed lookup rows.

    ztab: literal entries in zigzag value order, two 16-bit entries per
      int32 (entry = code | len << 12; code <= 12 bits, len <= 12).
      z(b) = 2b for b < 128 else 2*(256-b) - 1.
    lentab: trained codes for length symbols 257..285, entry = code |
      len << 12, two per int32 (15 rows used, padded to 16).
    """
    ent = (HUFFMAN_CODES[:256].astype(np.int64)
           | (HUFFMAN_LENGTHS[:256].astype(np.int64) << 12))
    z = np.zeros(256, np.int64)
    for b in range(256):
        zi = 2 * b if b < 128 else 2 * (256 - b) - 1
        z[zi] = ent[b]
    ztab = (z[0::2] | (z[1::2] << 16)).astype(np.int32)

    lens = np.zeros(30, np.int64)
    for s in range(257, 286):
        lens[s - 257] = (int(HUFFMAN_CODES[s])
                         | (int(HUFFMAN_LENGTHS[s]) << 12))
    lentab = (lens[0::2] | (lens[1::2] << 16)).astype(np.int32)
    assert lentab.shape[0] == 15
    lentab = np.concatenate([lentab, np.zeros(1, np.int32)])
    return ztab, lentab


_C0 = int(HUFFMAN_CODES[0])
_L0 = int(HUFFMAN_LENGTHS[0])
_C285 = int(HUFFMAN_CODES[285])
_L285 = int(HUFFMAN_LENGTHS[285])


def _kernel(in_ref, la_ref, lmeta_ref, ztab_ref, ltab_ref,
            tok_ref, relp_ref, npair_ref, bits_ref, state, *, U: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i32 = jnp.int32
    sb = pl.program_id(1)
    num_sb = pl.num_programs(1)

    def zeros():
        return jnp.zeros((8, LANE), i32)

    aligned = lmeta_ref[0, 0]   # per-lane aligned byte count (local)
    length = lmeta_ref[0, 1]    # per-lane logical byte count (local)
    prun0 = lmeta_ref[0, 2]     # chunk-rule prev_run entering the lane
    zlit_tok = lmeta_ref[0, 3]  # literal-zero token (v | nb << 13)
    t285_tok = lmeta_ref[0, 4]  # 285-run token incl. its 1 dist bit

    # state rows: 0 prev_run, 1 prev_member, 2 cnt258, 3 bitpos, 4..11 bankA
    @pl.when(sb == 0)
    def _init():
        state[0] = prun0
        state[1] = zeros()
        state[2] = zeros()
        state[3] = zeros()
        for k in range(8):
            state[4 + k] = zeros()

    prev_run = state[0]
    prev_member = state[1]
    cnt258 = state[2]
    bitpos = state[3]
    bankA = [state[4 + k] for k in range(8)]

    def lit_lookup(zs):
        """Zigzag-indexed literal entries for 8 byte columns at once.

        zs: list of 8 (8,128) zigzag indices.  Bounded select-reduce over
        the pair-packed 128-row table; scan ceiling = max z this step.
        """
        prows = [z >> 1 for z in zs]
        m = jnp.max(prows[0])
        for q in prows[1:]:
            m = jnp.maximum(m, jnp.max(q))
        ghi = jnp.minimum((m >> 3) + 1, 16)

        def body(g, accs):
            accs = list(accs)
            p0 = g * 8
            rel = [p - (zeros() + p0) for p in prows]
            for j in range(8):
                row = ztab_ref[p0 + j]
                for t in range(8):
                    accs[t] = jnp.where(rel[t] == j, row, accs[t])
            return tuple(accs)

        accs = jax.lax.fori_loop(0, ghi, body,
                                 tuple(zeros() for _ in range(8)))
        out = []
        for t in range(8):
            e = (accs[t] >> ((zs[t] & 1) * 16)) & 0xFFFF
            out.append((e & 0xFFF) | ((e >> 12) << 13))
        return out

    def len_lookup(sym):
        """Trained code for length symbol (257..285): 15-row packed scan."""
        idx = sym - 257
        prow = idx >> 1
        acc = zeros()
        for r in range(15):
            acc = jnp.where(prow == r, ltab_ref[r], acc)
        e = (acc >> ((idx & 1) * 16)) & 0xFFFF
        return e & 0xFFF, e >> 12

    def tail_tokens(tail):
        """(sym_tok, extra_tok) for a 5..257 run tail, RFC closed form."""
        x = tail - 3
        e = ((x >= 8).astype(i32) + (x >= 16) + (x >= 32)
             + (x >= 64) + (x >= 128))
        sym = 257 + 4 * e + (x >> e)
        code, clen = len_lookup(sym)
        sym_tok = code | (clen << 13)
        extra_val = x & ((1 << e) - 1)
        extra_tok = extra_val | ((e + 1) << 13)
        return sym_tok, extra_tok

    def classify(w0, w1):
        """(bytes[8], t, l, czero) for one 8-byte chunk."""
        bs = []
        for j in range(4):
            bs.append((w0 >> (8 * j)) & 0xFF)
        for j in range(4):
            bs.append((w1 >> (8 * j)) & 0xFF)
        nz = [b != 0 for b in bs]
        t = jnp.full((8, LANE), 8, i32)
        for j in range(7, -1, -1):
            t = jnp.where(nz[j], j, t)
        l = jnp.full((8, LANE), 8, i32)
        for j in range(8):
            l = jnp.where(nz[j], 7 - j, l)
        czero = t == 8
        return bs, t, jnp.where(czero, 8, l), czero

    for u in range(U):
        base = (sb * U + u) * 8
        w0 = in_ref[0, 2 * u]
        w1 = in_ref[0, 2 * u + 1]
        bs, t, l, czero = classify(w0, w1)

        zs = []
        for b in bs:
            zs.append(jnp.where(b < 128, b << 1, ((256 - b) << 1) - 1))
        lits = lit_lookup(zs)

        bankB = []
        run_end = []
        tails = []
        pm = prev_member
        for i in range(8):
            slot_in_aligned = base + i < aligned
            member = (czero | ((i < t) & (prev_run > 0))
                      | (i >= 8 - l)) & slot_in_aligned
            ends = ~member & pm
            run_end.append(ends)
            tails.append(jnp.where(ends, cnt258, 0))
            cnt258 = jnp.where(ends, 0, cnt258)

            lit_ok = ~member & (base + i < length)
            tok = jnp.where(lit_ok, lits[i], 0)
            starts = member & ~pm
            tok = jnp.where(starts, zlit_tok, tok)
            cont = member & pm
            c2 = cnt258 + cont.astype(i32)
            at285 = cont & (c2 == 258)
            tok = jnp.where(at285, t285_tok, tok)
            cnt258 = jnp.where(at285, 0, c2)
            bankB.append(tok)
            pm = member

        prev_member = pm
        prev_run = (czero | (l > 0)).astype(i32)

        # ---- in-step run-end revisions (at most one run ends per chunk,
        # so the tail-token math merges across the 8 byte columns) -------
        any_end = run_end[0]
        tail_m = tails[0]
        for i in range(1, 8):
            any_end = any_end | run_end[i]
            tail_m = tail_m | tails[i]
        sym_tok, extra_tok = tail_tokens(jnp.maximum(tail_m, 5))
        small = tail_m <= 4
        for i in range(8):
            for j in range(1, 5):
                cond_s = run_end[i] & small & (tails[i] >= j)
                p = i - j
                if p >= 0:
                    bankB[p] = jnp.where(cond_s, zlit_tok, bankB[p])
                    if j == 2:
                        bankB[p] = jnp.where(run_end[i] & ~small,
                                             sym_tok, bankB[p])
                    if j == 1:
                        bankB[p] = jnp.where(run_end[i] & ~small,
                                             extra_tok, bankB[p])
                elif u > 0:
                    # u == 0 would target the PREVIOUS cell's already
                    # flushed bank; that cell applied these very revisions
                    # in its boundary peek, so they are skipped here.
                    q = 8 + p
                    bankA[q] = jnp.where(cond_s, zlit_tok, bankA[q])
                    if j == 2:
                        bankA[q] = jnp.where(run_end[i] & ~small,
                                             sym_tok, bankA[q])
                    if j == 1:
                        bankA[q] = jnp.where(run_end[i] & ~small,
                                             extra_tok, bankA[q])

        # ---- flush the previous step's bank (static local rows) ---------
        if u > 0:
            nbs = [(a >> 13) & 0x1F for a in bankA]
            pos = bitpos
            for k in range(8):
                if k % 2 == 0:
                    relp_ref[0, 4 * (u - 1) + k // 2] = pos
                    npair_ref[0, 4 * (u - 1) + k // 2] = (
                        nbs[k] + nbs[k + 1])
                tok_ref[0, 8 * (u - 1) + k] = bankA[k]
                pos = pos + nbs[k]
            bitpos = pos
        bankA = bankB

    # ---- cell-boundary peek: next step's first bytes decide whether a
    # run crossing the boundary ends within reach of our last bank -------
    w0n = la_ref[0, 0]
    w1n = la_ref[0, 1]
    _bs, tn, _l, czn = classify(w0n, w1n)
    base_next = (sb * U + U) * 8
    e_la = jnp.minimum(jnp.where(czn, 8, tn),
                       jnp.clip(aligned - base_next, 0, 8))
    la_end = prev_member & (e_la <= 3)
    tail_raw = cnt258 + e_la
    tail_la = jnp.where(la_end,
                        jnp.where(tail_raw >= 258, tail_raw - 258, tail_raw),
                        0)
    sym_la, extra_la = tail_tokens(jnp.maximum(tail_la, 5))
    small_la = tail_la <= 4
    for ev in range(4):
        cond_e = la_end & (e_la == ev)
        for j in range(1, 5):
            p = ev - j
            if p < 0:
                q = 8 + p
                cond_s = cond_e & small_la & (tail_la >= j)
                bankA[q] = jnp.where(cond_s, zlit_tok, bankA[q])
                bankA[q] = jnp.where(cond_e & ~small_la & (j == 2),
                                     sym_la, bankA[q])
                bankA[q] = jnp.where(cond_e & ~small_la & (j == 1),
                                     extra_la, bankA[q])

    nbs = [(a >> 13) & 0x1F for a in bankA]
    pos = bitpos
    for k in range(8):
        if k % 2 == 0:
            relp_ref[0, 4 * (U - 1) + k // 2] = pos
            npair_ref[0, 4 * (U - 1) + k // 2] = nbs[k] + nbs[k + 1]
        tok_ref[0, 8 * (U - 1) + k] = bankA[k]
        pos = pos + nbs[k]
    bitpos = pos

    state[0] = prev_run
    state[1] = prev_member.astype(i32)
    state[2] = cnt258
    state[3] = bitpos
    for k in range(8):
        state[4 + k] = bankA[k]  # flushed; kept only for shape stability

    @pl.when(sb == num_sb - 1)
    def _fin():
        bits_ref[0] = bitpos


def assign_blocked_pallas(in_words, lane_meta, S: int, U: int = 32,
                          interpret: bool | None = None, tables=None):
    """Tokenize lane-blocked bytes on the VPU.

    Args:
      in_words: i32[LB, 2*T + 2, 8, 128] — each lane's S bytes as S/4
        little-endian words, padded with one extra zero step (T = S/8;
        the final 2 rows MUST be zero — the boundary peek reads them).
      lane_meta: i32[LB, 8, 8, 128] — rows: aligned byte count (local,
        multiple of 8), logical byte count (local), chunk-rule prev_run
        flag entering the lane, literal-zero token, 285-run token,
        3 spare.
      tables: optional (ztab i32[128], ltab i32[16]) runtime tree rows
        (see runtime_tables); None selects the trained PNG tree.  Tables
        are runtime INPUTS either way, so one compiled kernel serves any
        <=12-bit tree.
      S: bytes per lane (multiple of 8*U).

    Returns (tok i32[LB, S, 8, 128], relp i32[LB, S/2, 8, 128],
    npair i32[LB, S/2, 8, 128], chunk_bits i32[LB, 8, 128]) — exactly the
    pack kernel's inputs plus per-lane payload bit counts.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    LB = in_words.shape[0]
    T = S // 8
    # The word axis may carry zero padding past 2T + 2 (TPU path: the
    # reverse corner turn pads to a lane multiple); blocks past the peek
    # are never indexed.
    assert in_words.shape[1] >= 2 * T + 2
    assert T % U == 0
    SB = T // U

    if tables is None:
        ztab, lentab = _const_tables()
        ztab_arg = jnp.asarray(np.ascontiguousarray(
            np.broadcast_to(ztab[:, None, None], (128, 8, LANE))))
        ltab_arg = jnp.asarray(np.ascontiguousarray(
            np.broadcast_to(lentab[:, None, None], (16, 8, LANE))))
    else:
        ztab_rt, ltab_rt = tables
        ztab_arg = jnp.broadcast_to(
            ztab_rt.reshape(128, 1, 1), (128, 8, LANE))
        ltab_arg = jnp.broadcast_to(
            ltab_rt.reshape(16, 1, 1), (16, 8, LANE))

    f = pl.pallas_call(
        functools.partial(_kernel, U=U),
        grid=(LB, SB),
        in_specs=[
            pl.BlockSpec((1, 2 * U, 8, LANE), lambda lb, sb: (lb, sb, 0, 0),
                         memory_space=pltpu.VMEM),
            # boundary peek: the next step's 2 words (block units of 2 rows)
            pl.BlockSpec((1, 2, 8, LANE), lambda lb, sb: (lb, (sb + 1) * U,
                                                          0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 8, LANE), lambda lb, sb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 8, LANE), lambda lb, sb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8 * U, 8, LANE), lambda lb, sb: (lb, sb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * U, 8, LANE), lambda lb, sb: (lb, sb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * U, 8, LANE), lambda lb, sb: (lb, sb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANE), lambda lb, sb: (lb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((LB, 8 * T, 8, LANE), jnp.int32),
            jax.ShapeDtypeStruct((LB, 4 * T, 8, LANE), jnp.int32),
            jax.ShapeDtypeStruct((LB, 4 * T, 8, LANE), jnp.int32),
            jax.ShapeDtypeStruct((LB, 8, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((12, 8, LANE), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return f(in_words, in_words, lane_meta, ztab_arg, ltab_arg)


@functools.lru_cache(maxsize=None)
def _zigzag_perm():
    """b_of_z[z] — byte value stored at zigzag slot z."""
    b_of_z = np.zeros(256, np.int64)
    for b in range(256):
        zi = 2 * b if b < 128 else 2 * (256 - b) - 1
        b_of_z[zi] = b
    return b_of_z


def runtime_tables(codes, lens):
    """Kernel table rows from a runtime canonical tree (device arrays).

    codes/lens: i32[286] (ops/adaptive.canonical_codes).  Returns
    (ztab i32[128], ltab i32[16], zlit_tok, t285_tok) matching the
    trained-tree constants' formats.
    """
    import jax.numpy as jnp

    i32 = jnp.int32
    ent = (codes[:256] | (lens[:256] << 12)).astype(i32)
    zent = ent[jnp.asarray(_zigzag_perm())]
    ztab = zent[0::2] | (zent[1::2] << 16)
    lent = (codes[257:286] | (lens[257:286] << 12)).astype(i32)
    lent = jnp.concatenate([lent, jnp.zeros(3, i32)])  # pad 29 -> 32
    ltab = lent[0::2] | (lent[1::2] << 16)
    zlit_tok = (codes[0] | (lens[0] << 13)).astype(i32)
    t285_tok = (codes[285] | ((lens[285] + 1) << 13)).astype(i32)
    return ztab, ltab, zlit_tok, t285_tok


def assign_tokens_blocked(data, lengths, C: int, U: int = 32,
                          interpret: bool | None = None, rt=None):
    """Full kernel tokenize: [B, N] bytes -> pack inputs + chunk bits.

    Returns (tok, relp, npair) in the lane-blocked layout pack_blocked_
    pallas_v2 consumes (relp is CHUNK-relative) and chunk_bits i32[B, C].
    ``rt``: optional (codes, lens) i32[286] device arrays for a runtime
    canonical tree (the adaptive encoder); None = trained PNG tree.
    """
    import jax.numpy as jnp

    B, N = data.shape
    S = N // C
    L = B * C
    # Interpret-mode (CPU test) compiles scale with the unrolled step count;
    # FDN_ASSIGN_U=4 keeps the XLA-CPU compile of the interpreted kernel
    # tractable without changing semantics.
    U = int(os.environ.get("FDN_ASSIGN_U", str(U)))
    while S % (8 * U):
        U //= 2
    if rt is None:
        tables = None
        zlit = t285 = None
    else:
        ztab, ltab, zlit, t285 = runtime_tables(*rt)
        tables = (ztab, ltab)
    in_words, meta = blocked_input(data, lengths, C,
                                   zlit_tok=zlit, t285_tok=t285)
    tok, relp, npair, bits_rows = assign_blocked_pallas(
        in_words, meta, S, U=U, interpret=interpret, tables=tables)
    chunk_bits = bits_rows.reshape(-1)[:L].reshape(B, C)
    return tok, relp, npair, chunk_bits.astype(jnp.int32)


@functools.lru_cache(maxsize=1)
def _word_select_matrix():
    """[128, 64] f32: columns 0..31 select bytes 4t/4t+1 with weights
    1/256 (the low 16 bits of word t per 128-byte row), columns 32..63
    select bytes 4t+2/4t+3 (the high 16 bits)."""
    M = np.zeros((128, 64), np.float32)
    for t in range(32):
        M[4 * t, t] = 1.0
        M[4 * t + 1, t] = 256.0
        M[4 * t + 2, 32 + t] = 1.0
        M[4 * t + 3, 32 + t] = 256.0
    return M


def _words_mxu(data):
    """u8[B, N] -> i32[B, N//4] little-endian words on the MXU."""
    import jax
    import jax.numpy as jnp

    B, N = data.shape
    Y = data.reshape(-1, 128).astype(jnp.float32)
    O = jax.lax.dot(Y, jnp.asarray(_word_select_matrix()),
                    precision=jax.lax.Precision.HIGHEST)
    lo = O[:, :32].astype(jnp.int32)
    hi = O[:, 32:].astype(jnp.int32)
    return (lo | (hi << 16)).reshape(B, N // 4)


def blocked_input(data, lengths, C: int, zlit_tok=None, t285_tok=None):
    """XLA prep: [B, N] bytes -> kernel inputs (in_words, lane_meta).

    One relayout pass: bytes view as little-endian words, lanes = fixed
    S-byte chunks, plus the per-lane meta rows (local aligned/length, the
    8-byte-chunk rule's prev_run entering each lane, and the two run
    tokens — trained-tree constants unless a runtime tree passes its own).
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    B, N = data.shape
    S = N // C
    T = S // 8
    L = B * C
    LB = -(-L // 1024)
    Lp = LB * 1024

    if jax.default_backend() == "tpu":
        # Bytes -> little-endian words via MXU selection matmuls: XLA's
        # u8->i32 bitcast_convert_type lowers to a lane relayout that runs
        # at ~6 GB/s (2.76 ms of the 10.9 ms encode at 16 MiB,
        # /tmp-probe round 5); two 0/1/256-weighted [128, 32] selections
        # against 128-byte rows produce the exact words at 57 GB/s.
        # Exact: bf16 passes represent 0..255 and 256*b exactly, and the
        # two halves stay < 2^16 so the f32 accumulation is exact.
        words = _words_mxu(data)
    else:
        words = jax.lax.bitcast_convert_type(
            data.reshape(B, N // 4, 4), jnp.int32).reshape(B, N // 4)
    rows = words.reshape(L, S // 4)
    if Lp > L:
        rows = jnp.concatenate(
            [rows, jnp.zeros((Lp - L, S // 4), i32)], axis=0)
    if jax.default_backend() == "tpu":
        # Pallas reverse corner turn: XLA's lowering of this transpose ran
        # at ~5.9 GB/s (2.8 ms of the 10.9 ms encode at 16 MiB,
        # bench/probe_encstages.py s0).  The word axis pads to a multiple
        # of 128 (the kernel's block width); the assign kernel only ever
        # indexes rows < 2T + 2, so the zero tail is dead weight it never
        # fetches, and rows 2T..2T+2 are zero as the boundary peek
        # requires.
        from .pallas_decode2 import corner_turn_rev

        W = S // 4 + 2
        Wp = W + (-W) % 128
        rows = jnp.concatenate(
            [rows, jnp.zeros((Lp, Wp - S // 4), i32)], axis=1)
        in_words = corner_turn_rev(rows.reshape(LB, 8, LANE, Wp))
    else:
        rows = jnp.concatenate([rows, jnp.zeros((Lp, 2), i32)], axis=1)
        in_words = rows.reshape(LB, 8, LANE, S // 4 + 2).transpose(
            0, 3, 1, 2)

    lengths = lengths.astype(i32)
    aligned = (lengths // 8) * 8
    offs = jnp.arange(C, dtype=i32)[None, :] * S
    al_loc = jnp.clip(aligned[:, None] - offs, 0, S)
    ln_loc = jnp.clip(lengths[:, None] - offs, 0, S)

    # prev_run entering lane c = last 8-byte chunk of lane c-1 is all-zero
    # or ends in zeros (stream-first lanes: no previous chunk).
    # prev_run (the 8-byte-chunk rule's carry) is czero | l > 0 of the
    # previous chunk, which reduces to "its LAST byte is zero" (an
    # all-zero chunk trivially ends in a zero byte).
    tail = words.reshape(B, C, S // 4)[:, :, -1]
    last_byte_zero = (tail & jnp.int32(-16777216)) == 0  # byte 7 of chunk
    prev_run = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.bool_), last_byte_zero[:, :-1]], axis=1)

    def lane_rows(x):
        x = x.reshape(-1)
        if Lp > L:
            x = jnp.concatenate([x, jnp.zeros((Lp - L,), x.dtype)])
        return x.reshape(LB, 8, LANE)

    if zlit_tok is None:
        zlit_tok = jnp.int32(_C0 | (_L0 << 13))
        t285_tok = jnp.int32(_C285 | ((_L285 + 1) << 13))
    zeros = jnp.zeros((LB, 8, LANE), i32)
    meta = jnp.stack(
        [lane_rows(al_loc), lane_rows(ln_loc),
         lane_rows(prev_run.astype(i32)),
         zeros + zlit_tok, zeros + t285_tok,
         zeros, zeros, zeros], axis=1)
    return in_words, meta
