"""Pallas record decoder for FOREIGN deflate blocks (arbitrary canonical trees).

Round-2 extension of the fixed-geometry canonical kernel
(ops/pallas_decode2.py) from the trained <=12-bit tree to ARBITRARY deflate
blocks: per-lane runtime litlen+dist trees up to the full 15-bit code length,
real LZ77 back-references, and end-of-block termination.  Each lane decodes
one block (its own bit window, its own trees) and emits one RECORD per step —
up to two packed literals, or a (length, distance) pair — instead of output
bytes; the existing XLA ``ops.inflate.materialize`` resolves the records into
bytes, so this kernel replaces only the symbol phase (round 1's 0.4 s/16 MiB
``lax.while_loop``, ~150 ns per lane-step vs ~13 ns in-kernel).

Capability bar: the reference's table-driven fast loop
(/root/reference/src/decompress.rs:647-830) over dynamic AND fixed blocks;
decode-table semantics per /root/reference/src/huffman.rs:18-184 including
the 0/1-symbol distance-tree special cases (src/huffman.rs:40-59), here as
canonical-bound metadata instead of built tables.

Design notes (all constraints measured on this part, see PERF_NOTES.md):

* Canonical decode needs no 4096-entry table: the code LENGTH comes from 14
  vector compares of the bit-reversed 15-bit peek against per-length bounds,
  and only the code->symbol map is a lookup into a 320-entry packed table.
* Per-lane trees cost nothing extra: the select-reduce lookup
  ``where(idx == p, tab_ref[p], acc)`` reads an (8,128) tile whose value per
  lane is that lane's OWN entry — the tables are stacked lane-wise on the
  host, so one compiled kernel serves any mix of blocks.
* Table layout puts the 30 DIST entries first (pairs 0..14, sentinels at
  entries 30/31) and litlen at entry offset 32: the mixed second-sub lookup
  (literal lanes chase a second literal, match lanes decode the distance)
  then satisfies dist lanes in the first two 8-pair groups while literal
  lanes scan only the hot canonical prefix.
* Scalar metadata is pre-broadcast into VMEM rows ([64, 8, 128]); an SMEM
  scalar in a vector op would emit a `vector.broadcast` per use site (~170
  per step measured — the round-2 kernel's dominant cost before this fix).
"""

from __future__ import annotations

import functools

import numpy as np

from ..tables import (
    LEN_SYM_TO_LEN_BASE,
    LEN_SYM_TO_LEN_EXTRA,
)

LANE = 128
MAXL = 15            # deflate litlen/dist codes are at most 15 bits
_ENTRIES = 320       # 0..29 dist syms, 30..31 sentinels, 32..317 litlen
_TPAIRS = _ENTRIES // 2
_LIT_BASE = 32       # litlen canonical entries start here
_SENTINEL = 0x7FFF   # invalid-code entry (cls == 3)

_CLS_LIT = 0
_CLS_EOB = 1
_CLS_LEN = 2
_CLS_BAD = 3

# record kinds (bits 30..28 of the packed record word)
REC_IDLE = 0
REC_LITS = 1
REC_MATCH = 2
REC_EOB = 3
REC_ERR = 4


def _canonical15(lens: np.ndarray):
    """(bounds[16], kvals[16]) for a 15-bit canonical decode of ``lens``.

    bounds[l]: smallest 15-bit-scaled reversed peek NOT decodable at
    length <= l (1<<15 when no code of length <= l exists, i.e. never).
    kvals[l]: sorted_index = kvals[l] + (r15 >> (15 - l)).

    Complete trees only (exact Kraft); degenerate distance trees are
    handled by the caller (`foreign_meta`).
    """
    lens = np.asarray(lens, np.int64)
    cnt = np.bincount(lens, minlength=MAXL + 1).astype(np.int64)
    cnt[0] = 0
    first = np.zeros(MAXL + 1, np.int64)
    code = 0
    for L in range(1, MAXL + 1):
        first[L] = code
        code = (code + cnt[L]) << 1
    if code != 1 << (MAXL + 1):
        raise ValueError("tree must be exactly complete")
    bounds = np.zeros(16, np.int64)
    kvals = np.zeros(16, np.int64)
    acc = 0
    for L in range(1, MAXL + 1):
        bounds[L] = (first[L] + cnt[L]) << (MAXL - L)
        kvals[L] = acc - first[L]
        acc += int(cnt[L])
    return bounds, kvals


def _canonical_order(lens: np.ndarray) -> np.ndarray:
    """Symbols with nonzero length in (length, symbol) order."""
    lens = np.asarray(lens, np.int64)
    order = np.lexsort((np.arange(len(lens)), lens))
    return order[lens[order] > 0]


def foreign_meta(litlen_lens, dist_lens):
    """Per-block canonical metadata + packed symbol table for the kernel.

    Args:
      litlen_lens: code lengths for litlen symbols (>= 257 entries, EOB
        present, exactly complete — the host header parse guarantees this).
      dist_lens: code lengths for the 30 distance symbols; may be empty or
        single-code (reference special cases src/huffman.rs:40-59).

    Returns (meta i32[64], tab i32[_TPAIRS]):
      meta rows 0..15  litlen bounds, 16..31 litlen kvals (+_LIT_BASE),
           rows 32..47 dist bounds,  48..63 dist kvals.
      tab: two 15-bit entries per int32.  Dist entries hold the dist SYMBOL
      id (base/extra have closed forms computed in-kernel); litlen entries
      hold val | extra << 9 | cls << 13 (val: literal byte or length base).
    """
    litlen_lens = np.asarray(litlen_lens, np.int64)
    dist_lens = np.asarray(dist_lens, np.int64)

    entries = np.full(_ENTRIES, _SENTINEL, np.int64)

    lb, lk = _canonical15(litlen_lens)
    lk = lk + _LIT_BASE
    for i, sym in enumerate(_canonical_order(litlen_lens)):
        sym = int(sym)
        if sym < 256:
            e = sym  # cls LIT, extra 0
        elif sym == 256:
            e = _CLS_EOB << 13
        elif sym <= 285:
            e = (int(LEN_SYM_TO_LEN_BASE[sym - 257])
                 | int(LEN_SYM_TO_LEN_EXTRA[sym - 257]) << 9
                 | _CLS_LEN << 13)
        else:
            e = _SENTINEL  # symbols 286/287: valid code, invalid meaning
        entries[_LIT_BASE + i] = e

    nz = int(np.count_nonzero(dist_lens))
    db = np.zeros(16, np.int64)
    dk = np.zeros(16, np.int64)
    if nz == 0:
        # No distance codes: any dist decode must error.  L is always 1
        # (no bound ever exceeded) and kvals[1] points at the sentinels.
        db[1:] = 1 << MAXL
        dk[1] = 30  # idx = 30 + (r15 >> 14) in {30, 31}
    elif nz == 1:
        # One distance code: it gets code '0' (one bit); a '1' bit is an
        # invalid code (reference semantics src/huffman.rs:40-59).
        sym = int(np.flatnonzero(dist_lens)[0])
        db[1] = 1 << (MAXL - 1)
        db[2:] = 1 << MAXL
        # L=1: idx = dk[1] + (r15 >> 14) = dk[1] + 0
        dk[1] = 0
        # L=2: idx = dk[2] + (r15 >> 13), r15 >> 13 in {2, 3} (top bit set)
        dk[2] = 28  # -> {30, 31}: sentinels
        entries[0] = sym
    else:
        db, dk = _canonical15(dist_lens)
        for i, sym in enumerate(_canonical_order(dist_lens)):
            entries[i] = int(sym) if sym < 30 else _SENTINEL

    meta = np.zeros(64, np.int32)
    meta[0:16] = lb
    meta[16:32] = lk
    meta[32:48] = db
    meta[48:64] = dk
    tab = (entries[0::2] | (entries[1::2] << 16)).astype(np.int32)
    return meta, tab


def _bitrev15_np(x: int) -> int:
    r = 0
    for i in range(MAXL):
        r |= ((x >> i) & 1) << (MAXL - 1 - i)
    return r


def _tab_entry(tab: np.ndarray, idx: int) -> int:
    return (int(tab[idx >> 1]) >> ((idx & 1) * 16)) & 0x7FFF


def decode_records_np(words: np.ndarray, pos0: int, meta: np.ndarray,
                      tab: np.ndarray, max_recs: int):
    """Numpy oracle with the kernel's exact semantics.

    Returns (recs i32[max_recs], final_bitpos, done) where done is
    0 (ran out of record slots), 1 (EOB), 2 (invalid code).
    """
    w = np.asarray(words).astype(np.uint32).astype(np.uint64)

    def peek32(p):
        wi, sh = p >> 5, p & 31
        v = int(w[wi]) >> sh if wi < len(w) else 0
        if wi + 1 < len(w) and sh:
            v |= int(w[wi + 1]) << (32 - sh)
        return v & 0xFFFFFFFF

    def canon(bits, brow, krow):
        r15 = _bitrev15_np(bits & 0x7FFF)
        L = 1
        for l in range(1, MAXL):
            if r15 >= int(meta[brow + l]):
                L += 1
        return L, int(meta[krow + L]) + (r15 >> (MAXL - L))

    recs = np.zeros(max_recs, np.int32)
    pos = int(pos0)
    done = 0
    for u in range(max_recs):
        bits = peek32(pos)
        L1, idx1 = canon(bits, 0, 16)
        e1 = _tab_entry(tab, idx1)
        cls1 = e1 >> 13
        if cls1 == _CLS_BAD:
            recs[u] = REC_ERR << 28
            done = 2
            break
        if cls1 == _CLS_EOB:
            recs[u] = REC_EOB << 28
            pos += L1
            done = 1
            break
        if cls1 == _CLS_LIT:
            lit0 = e1 & 0x1FF
            # second literal from the same 32-bit peek
            L2, idx2 = canon(bits >> L1, 0, 16)
            e2 = _tab_entry(tab, idx2)
            if (e2 >> 13) == _CLS_LIT:
                recs[u] = (REC_LITS << 28) | (2 << 16) | ((e2 & 0xFF) << 8) | lit0
                pos += L1 + L2
            else:
                recs[u] = (REC_LITS << 28) | (1 << 16) | lit0
                pos += L1
            continue
        # length symbol
        ext1 = (e1 >> 9) & 0xF
        run = (e1 & 0x1FF) + ((bits >> L1) & ((1 << ext1) - 1))
        dbits = peek32(pos + L1 + ext1)
        Ld, idxd = canon(dbits, 32, 48)
        ed = _tab_entry(tab, idxd)
        if (ed & 0x1FF) == 0x1FF:
            recs[u] = REC_ERR << 28
            done = 2
            break
        s = ed & 0x1FF
        dext = max((s >> 1) - 1, 0)
        dbase = s + 1 if s < 2 else ((2 + (s & 1)) << dext) + 1
        dist = dbase + ((dbits >> Ld) & ((1 << dext) - 1))
        recs[u] = (REC_MATCH << 28) | ((run - 3) << 15) | (dist - 1)
        pos += L1 + ext1 + Ld + dext
    return recs, pos, done


def recs_to_records(recs):
    """Unpack kernel records [K, B] into materialize's record arrays.

    Returns (lit_lo u32, lit_hi u32, cnt i8, len i32, dist i32), each [K, B].
    """
    import jax.numpy as jnp

    kind = (recs >> 28) & 0xF
    pay = recs & 0x0FFFFFFF
    is_l = kind == REC_LITS
    is_m = kind == REC_MATCH
    rl = jnp.where(is_l, pay & 0xFFFF, 0).astype(jnp.uint32)
    rc = jnp.where(is_l, (pay >> 16) & 3, 0).astype(jnp.int8)
    rn = jnp.where(is_m, ((pay >> 15) & 0xFF) + 3, 0).astype(jnp.int32)
    rd = jnp.where(is_m, (pay & 0x7FFF) + 1, 0).astype(jnp.int32)
    return rl, jnp.zeros_like(rl), rc, rn, rd


def _kernel(win_ref, tab_ref, meta_ref, init_ref, recs_ref, bpos_ref, state,
            *, wwin: int, U: int, R: int):
    """Record-decode kernel body (see module docstring).

    state rows per block r: 0 pos, 1 done, 2 base, 3..7 w0..w4 (160-bit
    window).  A step consumes at most 15+5+15+13 = 48 bits (match) or 30
    bits (two literals), so the two-word refill invariant of the
    fixed-geometry kernel carries over unchanged.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i32 = jnp.int32
    u32 = jnp.uint32
    sb = pl.program_id(1)
    num_sb = pl.num_programs(1)
    RR = range(R)

    def zeros():
        return jnp.zeros((8, LANE), i32)

    def lit_bound(r):
        return lambda l: meta_ref[r, l]

    def lit_kval(r):
        return lambda l: meta_ref[r, 16 + l]

    def dist_bound(r):
        return lambda l: meta_ref[r, 32 + l]

    def dist_kval(r):
        return lambda l: meta_ref[r, 48 + l]

    def word_at(widx):
        glo_s, ghi_s = jnp.min(widx[0]), jnp.max(widx[0])
        for r in range(1, R):
            glo_s = jnp.minimum(glo_s, jnp.min(widx[r]))
            ghi_s = jnp.maximum(ghi_s, jnp.max(widx[r]))
        glo = jnp.minimum(glo_s >> 3, wwin // 8)
        ghi = jnp.minimum((ghi_s >> 3) + 1, wwin // 8)

        def body(g, accs):
            accs = list(accs)
            w0 = g * 8
            rel = [widx[r] - (zeros() + w0) for r in RR]
            for j in range(8):
                for r in RR:
                    v = win_ref[r, w0 + j]
                    accs[r] = jnp.where(rel[r] == j, v, accs[r])
            return tuple(accs)

        return list(jax.lax.fori_loop(
            glo, ghi, body, tuple(zeros() for _ in RR)
        ))

    def sym_lookup(idx):
        pidx = [ix >> 1 for ix in idx]
        m = jnp.max(pidx[0])
        for r in range(1, R):
            m = jnp.maximum(m, jnp.max(pidx[r]))
        ghi = jnp.minimum((m >> 3) + 1, _TPAIRS // 8)

        def body(g, accs):
            accs = list(accs)
            p0 = g * 8
            rel = [pidx[r] - (zeros() + p0) for r in RR]
            for j in range(8):
                for r in RR:
                    accs[r] = jnp.where(
                        rel[r] == j, tab_ref[r, p0 + j], accs[r])
            return tuple(accs)

        accp = jax.lax.fori_loop(0, ghi, body, tuple(zeros() for _ in RR))
        return [(accp[r] >> ((idx[r] & 1) * 16)) & 0x7FFF for r in RR]

    @pl.when(sb == 0)
    def _init():
        for r in RR:
            state[r, 0] = init_ref[r, 0]
            state[r, 1] = zeros()
            base0 = init_ref[r, 0] >> 5  # 0: init pos is < 32 by contract
            state[r, 2] = base0
            for j in range(5):
                state[r, 3 + j] = win_ref[r, j]

    pos = [state[r, 0] for r in RR]
    done = [state[r, 1] for r in RR]
    base = [state[r, 2] for r in RR]
    w = [[state[r, 3 + j] for j in range(5)] for r in RR]

    def bitrev15(x):
        x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
        x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
        x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
        x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
        return x >> 1

    def peek32(r, pos_off_r, o):
        oo = pos_off_r + o
        wsel = oo >> 5
        a = w[r][3]
        b = w[r][4]
        for j in (2, 1, 0):
            a = jnp.where(wsel == j, w[r][j], a)
            b = jnp.where(wsel == j, w[r][j + 1], b)
        a = a.astype(u32)
        b = b.astype(u32)
        sh = (oo & 31).astype(u32)
        return (a >> sh) | jnp.where(
            sh == 0, u32(0), b << ((32 - (oo & 31)).astype(u32) & 31)
        )

    def canon(r15, bound, kval):
        L = jnp.ones((8, LANE), i32)
        for l in range(1, MAXL):
            L = L + (r15 >= bound(l)).astype(i32)
        Kv = zeros() + kval(MAXL)
        for l in range(1, MAXL):
            Kv = jnp.where(L == l, kval(l), Kv)
        return L, Kv + (r15 >> (MAXL - L))

    # Freeze lanes approaching the staged window's end BEFORE they read
    # garbage: a frozen lane (done == 3) keeps its exact bit position, so
    # the host can re-stage a window at that position and resume — blocks
    # larger than one staged window decode across launches.  One step
    # consumes <= 48 bits and peeks <= 79+31 bits past pos, so stopping at
    # wwin*32 - 128 keeps every read in bounds.
    stop_bits = wwin * 32 - 128

    for u in range(U):
        for r in RR:
            done[r] = jnp.where(
                (done[r] == 0) & (pos[r] > stop_bits), 3, done[r])
        pos_off = [pos[r] - (base[r] << 5) for r in RR]
        act = [done[r] == 0 for r in RR]

        # -- sub 0: litlen symbol ----------------------------------------
        bits = [peek32(r, pos_off[r], 0) for r in RR]
        L1, idx1 = [None] * R, [None] * R
        for r in RR:
            r15 = bitrev15((bits[r] & 0x7FFF).astype(i32))
            L1[r], idx1[r] = canon(r15, lit_bound(r), lit_kval(r))
        e1 = sym_lookup([jnp.where(act[r], idx1[r], 0) for r in RR])

        cls1 = [e1[r] >> 13 for r in RR]
        is_lit1 = [act[r] & (cls1[r] == _CLS_LIT) for r in RR]
        is_len = [act[r] & (cls1[r] == _CLS_LEN) for r in RR]
        is_eob = [act[r] & (cls1[r] == _CLS_EOB) for r in RR]
        is_bad1 = [act[r] & (cls1[r] == _CLS_BAD) for r in RR]

        # -- sub 1: second literal (lit lanes) / distance (match lanes) --
        ext1 = [(e1[r] >> 9) & 0xF for r in RR]
        dpeek = [None] * R
        r15b, r15d = [None] * R, [None] * R
        for r in RR:
            # second literal peek comes from the SAME 32-bit window
            r15b[r] = bitrev15(
                ((bits[r] >> L1[r].astype(u32)).astype(i32)) & 0x7FFF)
            dpeek[r] = peek32(r, pos_off[r], L1[r] + ext1[r])
            r15d[r] = bitrev15((dpeek[r] & 0x7FFF).astype(i32))
        idx2 = [None] * R
        L2, Ld = [None] * R, [None] * R
        for r in RR:
            L2[r], i_lit = canon(r15b[r], lit_bound(r), lit_kval(r))
            Ld[r], i_dst = canon(r15d[r], dist_bound(r), dist_kval(r))
            idx2[r] = jnp.where(
                is_len[r], i_dst, jnp.where(is_lit1[r], i_lit, 0))
        e2 = sym_lookup(idx2)

        for r in RR:
            # literal path
            lit2_ok = is_lit1[r] & ((e2[r] >> 13) == _CLS_LIT)
            lit_pay = ((jnp.where(lit2_ok, 2, 1) << 16)
                       | ((e2[r] & 0xFF) << 8).astype(i32) * lit2_ok
                       | (e1[r] & 0x1FF))
            lit_consumed = L1[r] + jnp.where(lit2_ok, L2[r], 0)

            # match path
            run = (e1[r] & 0x1FF) + (
                (bits[r] >> L1[r].astype(u32)).astype(i32)
                & ((1 << ext1[r]) - 1))
            s = e2[r] & 0x1FF
            bad_d = is_len[r] & (s == 0x1FF)
            dext = jnp.maximum((s >> 1) - 1, 0)
            dbase = jnp.where(s < 2, s + 1, ((2 + (s & 1)) << dext) + 1)
            dist = dbase + ((dpeek[r] >> Ld[r].astype(u32)).astype(i32)
                            & ((1 << dext) - 1))
            m_pay = ((run - 3) << 15) | (dist - 1)
            m_consumed = L1[r] + ext1[r] + Ld[r] + dext

            is_err = is_bad1[r] | bad_d
            is_m = is_len[r] & ~bad_d
            rec = jnp.where(
                is_lit1[r], (REC_LITS << 28) | lit_pay,
                jnp.where(is_m, (REC_MATCH << 28) | m_pay,
                          jnp.where(is_eob[r], REC_EOB << 28,
                                    jnp.where(is_err, REC_ERR << 28, 0))))
            recs_ref[r, u] = rec

            pos[r] = pos[r] + jnp.where(
                is_lit1[r], lit_consumed,
                jnp.where(is_m, m_consumed,
                          jnp.where(is_eob[r], L1[r], 0)))
            done[r] = jnp.where(is_eob[r], 1,
                                jnp.where(is_err, 2, done[r]))

        # -- refill: <= 48 bits consumed -> <= 2 new words ----------------
        for _ in range(2):
            need_f = [(pos[r] >> 5) > base[r] for r in RR]
            for r in RR:
                for j in range(4):
                    w[r][j] = jnp.where(need_f[r], w[r][j + 1], w[r][j])
                base[r] = jnp.where(need_f[r], base[r] + 1, base[r])
            neww = word_at([base[r] + 4 for r in RR])
            for r in RR:
                w[r][4] = jnp.where(need_f[r], neww[r], w[r][4])

    for r in RR:
        state[r, 0] = pos[r]
        state[r, 1] = done[r]
        state[r, 2] = base[r]
        for j in range(5):
            state[r, 3 + j] = w[r][j]

    @pl.when(sb == num_sb - 1)
    def _finish():
        for r in RR:
            bpos_ref[r] = state[r, 0]


def decode_records_blocked(win, pos0, meta, tab, K: int, U: int = 16,
                           interpret: bool | None = None, R: int | None = None):
    """Decode foreign blocks into records, one lane per block.

    Args:
      win: i32[LB, wwin, 8, 128] per-lane bit windows (lane's stream words;
        the lane's first symbol bit is ``pos0`` bits into word 0).
      pos0: i32[LB, 8, 128] initial bit offsets (0..31).
      meta: i32[LB, 64, 8, 128] per-lane canonical metadata (foreign_meta,
        broadcast lane-wise by the caller).
      tab: i32[LB, _TPAIRS, 8, 128] per-lane pair-packed symbol tables.
      K: record slots per lane (K % U == 0).
      U: steps per grid cell.
      R: lane-blocks interleaved per kernel instance (see decode_blocked).

    Returns (recs i32[LB, K, 8, 128], bpos i32[LB, 8, 128], done
    i32[LB, 8, 128]) — done: 0 ran out of slots, 1 EOB, 2 invalid code.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    LB, wwin, _, _ = win.shape
    assert K % U == 0
    SB = K // U
    if wwin % 8 != 0:
        pad = 8 - wwin % 8
        win = jnp.pad(win, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wwin += pad

    if R is None:
        blk_bytes = (wwin + U + _TPAIRS + 64) * 8 * LANE * 4
        R = 1
        for cand in (2, 4, 8):
            if LB % cand == 0 and cand * blk_bytes <= 30 << 20:
                R = cand
    if R > 1 and LB % R != 0:
        pad_lb = (-LB) % R
        win = jnp.pad(win, ((0, pad_lb), (0, 0), (0, 0), (0, 0)))
        pos0 = jnp.pad(pos0, ((0, pad_lb), (0, 0), (0, 0)))
        meta = jnp.pad(meta, ((0, pad_lb), (0, 0), (0, 0), (0, 0)))
        tab = jnp.pad(tab, ((0, pad_lb), (0, 0), (0, 0), (0, 0)))
        recs, bpos, done = decode_records_blocked(
            win, pos0, meta, tab, K, U=U, interpret=interpret, R=R)
        return recs[:LB], bpos[:LB], done[:LB]

    kern = functools.partial(_kernel, wwin=wwin, U=U, R=R)
    f = pl.pallas_call(
        kern,
        grid=(LB // R, SB),
        in_specs=[
            pl.BlockSpec((R, wwin, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, _TPAIRS, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 64, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, U, 8, LANE), lambda lb, sb: (lb, sb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8, LANE), lambda lb, sb: (lb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((LB, K, 8, LANE), jnp.int32),
            jax.ShapeDtypeStruct((LB, 8, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((R, 8, 8, LANE), jnp.int32)],
        interpret=interpret,
    )
    recs, bpos = f(win, tab, meta, pos0.reshape(LB, 1, 8, LANE))
    kind = (recs >> 28) & 0xF
    has_eob = jnp.any(kind == REC_EOB, axis=1)
    has_err = jnp.any(kind == REC_ERR, axis=1)
    done = jnp.where(has_err, 2, jnp.where(has_eob, 1, 0)).astype(jnp.int32)
    return recs, bpos, done


# ---------------------------------------------------------------------------
# Header-validation kernel (discovery stage 2 on device)
# ---------------------------------------------------------------------------

_MAXCL = 7           # code-length codes are at most 7 bits
_VAL_STEPS = 320     # max CL sections per header (>= 316 lengths + slack)
_VAL_WWIN = 160      # words per lane window (header <= 4498 bits < 160*32)
# Position of symbol s in the header's 3-bit field list (RFC 1951 3.2.7).
_CLCL_INV = (3, 17, 15, 13, 11, 9, 7, 5, 4, 6, 8, 10, 12, 14, 16, 18, 0, 1, 2)


def _validate_kernel(win_ref, pos0_ref, relend_ref, act_ref,
                     good_ref, end_ref, state, meta, *,
                     wwin: int, U: int, R: int):
    """Decode each lane's CL-coded lengths section; exact semantics of
    parallel.discovery.validate_stage2 (the numpy oracle).

    Lane = one stage-1 candidate bit offset.  The first grid step parses
    HLIT/HDIST/HCLEN + the 19 CL code lengths from the lane's window,
    builds the 7-bit canonical decode parameters and each symbol's sorted
    position in (length, symbol) order (unused symbols follow in symbol
    order, mirroring the oracle's argsort key), and stores them as VMEM
    meta rows; each step then decodes one section (a plain length or a
    16/17/18 repeat), tracking litlen/dist Kraft sums, the EOB slot's
    length, and structural errors.

    meta rows per block r: 0..18 sym s -> sorted_pos | cl<<8;
    19..25 bound[1..7]; 26..32 kval[1..7]; 33 hlit; 34 total.
    state rows: 0 pos, 1 bad, 2 base, 3..7 w0..w4, 8 written, 9 prev,
    10 kraft_l, 11 kraft_d, 12 nz_d, 13 len256.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i32 = jnp.int32
    u32 = jnp.uint32
    sb = pl.program_id(1)
    num_sb = pl.num_programs(1)
    RR = range(R)

    def zeros():
        return jnp.zeros((8, LANE), i32)

    def word_at(widx):
        glo_s, ghi_s = jnp.min(widx[0]), jnp.max(widx[0])
        for r in range(1, R):
            glo_s = jnp.minimum(glo_s, jnp.min(widx[r]))
            ghi_s = jnp.maximum(ghi_s, jnp.max(widx[r]))
        glo = jnp.minimum(glo_s >> 3, wwin // 8)
        ghi = jnp.minimum((ghi_s >> 3) + 1, wwin // 8)

        def body(g, accs):
            accs = list(accs)
            w0 = g * 8
            rel = [widx[r] - (zeros() + w0) for r in RR]
            for j in range(8):
                for r in RR:
                    accs[r] = jnp.where(
                        rel[r] == j, win_ref[r, w0 + j], accs[r])
            return tuple(accs)

        return list(jax.lax.fori_loop(
            glo, ghi, body, tuple(zeros() for _ in RR)
        ))

    def peek32(w, pos_off_r, o):
        oo = pos_off_r + o
        wsel = oo >> 5
        a = w[3]
        b = w[4]
        for j in (2, 1, 0):
            a = jnp.where(wsel == j, w[j], a)
            b = jnp.where(wsel == j, w[j + 1], b)
        a = a.astype(u32)
        b = b.astype(u32)
        sh = (oo & 31).astype(u32)
        return (a >> sh) | jnp.where(
            sh == 0, u32(0), b << ((32 - (oo & 31)).astype(u32) & 31)
        )

    def bitrev7(x):
        x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
        x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
        x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
        x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
        return x >> 9

    @pl.when(sb == 0)
    def _init():
        for r in RR:
            w = [win_ref[r, j] for j in range(5)]
            p0 = pos0_ref[r, 0]
            hlit = (peek32(w, p0, 3) & 31).astype(i32) + 257
            hdist = (peek32(w, p0, 8) & 31).astype(i32) + 1
            ncl = (peek32(w, p0, 13) & 15).astype(i32) + 4
            # 19 CL code lengths (indexed by SYMBOL) + length histogram
            cnt = [zeros() for _ in range(_MAXCL + 1)]
            cls = []
            for sym in range(19):
                j = _CLCL_INV[sym]
                cl = (peek32(w, p0, 17 + 3 * j) & 7).astype(i32)
                cl = jnp.where(j < ncl, cl, 0)
                cls.append(cl)
                for L in range(1, _MAXCL + 1):
                    cnt[L] = cnt[L] + (cl == L).astype(i32)
            # canonical params; keep off[L] (= #used symbols shorter than L)
            code = zeros()
            acc = zeros()
            offs = [None] * (_MAXCL + 1)
            for L in range(1, _MAXCL + 1):
                first = code
                meta[r, 19 + L - 1] = (first + cnt[L]) << (_MAXCL - L)
                meta[r, 26 + L - 1] = acc - first
                offs[L] = acc
                acc = acc + cnt[L]
                code = (code + cnt[L]) << 1
            # sorted position of every symbol: used symbols at
            # off[len] + within-length rank; unused follow in symbol order
            offr = list(offs)
            unused = acc
            for sym in range(19):
                cl = cls[sym]
                p = unused
                for L in range(1, _MAXCL + 1):
                    p = jnp.where(cl == L, offr[L], p)
                meta[r, sym] = p | (cl << 8)
                for L in range(1, _MAXCL + 1):
                    offr[L] = offr[L] + (cl == L).astype(i32)
                unused = unused + (cl == 0).astype(i32)
            meta[r, 33] = hlit
            meta[r, 34] = hlit + hdist

            state[r, 0] = p0 + 17 + 3 * ncl
            state[r, 1] = (act_ref[r, 0] == 0).astype(i32)
            state[r, 2] = zeros()
            for j in range(5):
                state[r, 3 + j] = w[j]
            for j in (8, 9, 10, 11, 12, 13):
                state[r, j] = zeros()

    pos = [state[r, 0] for r in RR]
    bad = [state[r, 1] for r in RR]
    base = [state[r, 2] for r in RR]
    w = [[state[r, 3 + j] for j in range(5)] for r in RR]
    written = [state[r, 8] for r in RR]
    prev = [state[r, 9] for r in RR]
    kraft_l = [state[r, 10] for r in RR]
    kraft_d = [state[r, 11] for r in RR]
    nz_d = [state[r, 12] for r in RR]
    len256 = [state[r, 13] for r in RR]

    for _u in range(U):
        for r in RR:
            hlit = meta[r, 33]
            total = meta[r, 34]
            live = (bad[r] == 0) & (written[r] < total)
            pos_off = pos[r] - (base[r] << 5)
            bits = peek32(w[r], pos_off, 0)
            r7 = bitrev7((bits & 0x7F).astype(i32))
            L = jnp.ones((8, LANE), i32)
            for l in range(1, _MAXCL):
                b_l = meta[r, 19 + l - 1]
                L = L + ((r7 >= b_l) & (b_l < (1 << _MAXCL))).astype(i32)
            kv = zeros()
            for l in range(1, _MAXCL + 1):
                kv = jnp.where(L == l, meta[r, 26 + l - 1], kv)
            idx = kv + (r7 >> (_MAXCL - L))
            idx_ok = (idx >= 0) & (idx < 19)
            idx_c = jnp.clip(idx, 0, 18)
            sym = zeros() + 19
            slen = zeros()
            for s in range(19):
                m = (meta[r, s] & 0xFF) == idx_c
                sym = jnp.where(m, s, sym)
                slen = jnp.where(m, (meta[r, s] >> 8) & 0xFF, slen)
            valid = idx_ok & (slen == L) & (sym < 19)
            bad[r] = bad[r] | (live & ~valid).astype(i32)

            is_plain = sym <= 15
            ebase = jnp.where(sym == 16, 3, jnp.where(sym == 17, 3, 11))
            ebits = jnp.where(sym == 16, 2, jnp.where(sym == 17, 3, 7))
            ev = (peek32(w[r], pos_off, L).astype(i32)
                  & ((1 << ebits) - 1))
            rep = jnp.where(is_plain, 1, ebase + ev)
            value = jnp.where(is_plain, sym,
                              jnp.where(sym == 16, prev[r], 0))
            bad[r] = bad[r] | (live & (sym == 16)
                               & (written[r] == 0)).astype(i32)
            bad[r] = bad[r] | (live
                               & (written[r] + rep > total)).astype(i32)
            act = live & (bad[r] == 0)

            repa = jnp.where(act, rep, 0)
            vala = jnp.where(act, value, 0)
            l_cnt = jnp.clip(
                jnp.minimum(written[r] + repa, hlit) - written[r], 0, None)
            l_cnt = jnp.where(act, l_cnt, 0)
            d_cnt = repa - l_cnt
            nzv = vala > 0
            kshift = jnp.where(nzv, 1 << (15 - jnp.clip(vala, 0, 15)), 0)
            kraft_l[r] = kraft_l[r] + kshift * l_cnt
            kraft_d[r] = kraft_d[r] + kshift * d_cnt
            nz_d[r] = nz_d[r] + jnp.where(nzv, d_cnt, 0)
            hit256 = act & (written[r] <= 256) \
                & (256 < written[r] + repa) & (hlit > 256)
            len256[r] = jnp.where(hit256, vala, len256[r])
            prev[r] = jnp.where(act & is_plain, sym, prev[r])
            written[r] = written[r] + repa
            pos[r] = pos[r] + jnp.where(
                act, L + jnp.where(is_plain, 0, ebits), 0)
            bad[r] = bad[r] | (live & (pos[r] + 7
                               >= relend_ref[r, 0])).astype(i32)

        # refill: a section consumes <= 14 bits -> at most one new word
        need_f = [(pos[r] >> 5) > base[r] for r in RR]
        for r in RR:
            for j in range(4):
                w[r][j] = jnp.where(need_f[r], w[r][j + 1], w[r][j])
            base[r] = jnp.where(need_f[r], base[r] + 1, base[r])
        neww = word_at([base[r] + 4 for r in RR])
        for r in RR:
            w[r][4] = jnp.where(need_f[r], neww[r], w[r][4])

    for r in RR:
        state[r, 0] = pos[r]
        state[r, 1] = bad[r]
        state[r, 2] = base[r]
        for j in range(5):
            state[r, 3 + j] = w[r][j]
        state[r, 8] = written[r]
        state[r, 9] = prev[r]
        state[r, 10] = kraft_l[r]
        state[r, 11] = kraft_d[r]
        state[r, 12] = nz_d[r]
        state[r, 13] = len256[r]

    @pl.when(sb == num_sb - 1)
    def _finish():
        for r in RR:
            total = meta[r, 34]
            ok = ((state[r, 1] == 0) & (state[r, 8] == total)
                  & (state[r, 10] == (1 << 15)) & (state[r, 13] > 0)
                  & ((state[r, 11] == (1 << 15)) | (state[r, 12] <= 1)))
            good_ref[r] = (ok & (act_ref[r, 0] != 0)).astype(i32)
            end_ref[r] = state[r, 0]


def validate_headers_blocked(win, pos0, relend, active, U: int = 32,
                             interpret: bool | None = None,
                             R: int | None = None):
    """Validate candidate dynamic-block headers, one lane per candidate.

    Args:
      win: i32[LB, wwin, 8, 128] per-candidate windows (the candidate's
        header starts ``pos0`` bits into word 0; wwin >= _VAL_WWIN).
      pos0: i32[LB, 8, 128] initial bit offsets (0..31).
      relend: i32[LB, 8, 128] stream end in window-relative bits.
      active: i32[LB, 8, 128] 1 for real candidate lanes.

    Returns (good i32[LB, 8, 128], end i32[LB, 8, 128]): good == 1 for
    structurally valid headers, end = window-relative bit position just
    past the header (symbol start).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    LB, wwin, _, _ = win.shape
    assert wwin % 8 == 0
    SB = _VAL_STEPS // U
    assert SB * U == _VAL_STEPS

    if R is None:
        blk_bytes = (wwin + 16 + 35) * 8 * LANE * 4
        R = 1
        for cand in (2, 4, 8):
            if LB % cand == 0 and cand * blk_bytes <= 30 << 20:
                R = cand
    if R > 1 and LB % R != 0:
        pad_lb = (-LB) % R
        win = jnp.pad(win, ((0, pad_lb), (0, 0), (0, 0), (0, 0)))
        pos0 = jnp.pad(pos0, ((0, pad_lb), (0, 0), (0, 0)))
        relend = jnp.pad(relend, ((0, pad_lb), (0, 0), (0, 0)))
        active = jnp.pad(active, ((0, pad_lb), (0, 0), (0, 0)))
        good, end = validate_headers_blocked(
            win, pos0, relend, active, U=U, interpret=interpret, R=R)
        return good[:LB], end[:LB]

    kern = functools.partial(_validate_kernel, wwin=wwin, U=U, R=R)
    f = pl.pallas_call(
        kern,
        grid=(LB // R, SB),
        in_specs=[
            pl.BlockSpec((R, wwin, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, 8, LANE), lambda lb, sb: (lb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8, LANE), lambda lb, sb: (lb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((LB, 8, LANE), jnp.int32),
            jax.ShapeDtypeStruct((LB, 8, LANE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 16, 8, LANE), jnp.int32),
            pltpu.VMEM((R, 35, 8, LANE), jnp.int32),
        ],
        interpret=interpret,
    )
    return f(win, pos0.reshape(LB, 1, 8, LANE),
             relend.reshape(LB, 1, 8, LANE),
             active.reshape(LB, 1, 8, LANE))
