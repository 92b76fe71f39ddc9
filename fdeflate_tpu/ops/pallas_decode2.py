"""Fixed-geometry Pallas decoder v2: canonical (table-free) Huffman decode.

Round-2 production decode kernel for ultra-fast (trained-tree) streams.
Three design moves eliminate round 1's bottlenecks (VERDICT items 1-2):

* **Canonical decode instead of decode tables.**  The reference decodes
  through a 4096-entry lookup table (src/decompress.rs:647-830) because a
  CPU load is ~1 cycle; on TPU any dynamic per-lane table access costs
  ~2600-3900 cycles per 1024 lanes (measured, bench/probe_pallas2.py).  A
  canonical Huffman code needs no table for the LENGTH: bit-reverse the
  12-bit peek and compare against 11 static per-length bounds (pure VPU
  compares).  Only the code->symbol map remains a lookup - into a 286-entry
  packed table (~8x cheaper than 4096).

* **Fixed output geometry.**  The encoder splits runs at every S-byte
  output boundary (ops/ultrafast_kernel.py:_assign_tokens split_S), so lane
  k of a stream decodes EXACTLY S bytes at output offset k*S.  Every store
  in the kernel is static: step u writes output word u of the lane.  The
  pointer-doubling materialization phase (2/3 of round-1 decode time)
  disappears entirely, as does lane load imbalance.

* **Lane-blocked interchange.**  The encoder's bit-packing scatter writes
  each chunk's bits into a per-lane padded window `win[LB, wpad, 8, 128]`
  (same segment-sum cost as the linear layout), so the kernel needs no
  per-lane gathers from a shared stream, and the kernel's lane-major output
  `[LB, 8, 128, T]` reshapes to standard `[B, N]` bytes with ZERO data
  movement (B*C == LB*1024 lanes, stream-major).

Scope: trained-tree streams (the ultra-fast format).  The same kernel
generalizes to arbitrary canonical tables (dynamic blocks) by making the
bounds/K/symbol-table inputs per-lane-block instead of compile-time
constants - see decode_dynamic_blocked below.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..tables import (
    HUFFMAN_LENGTHS,
    LEN_SYM_TO_LEN_BASE,
    LEN_SYM_TO_LEN_EXTRA,
)

LANE = 128
MAXL = 12          # trained tree max code length
_CLS_LIT = 0
_CLS_EOB = 1
_CLS_LEN = 2
_TAB_PAD = 512     # symbol table padded entries (286 used)


@functools.lru_cache(maxsize=None)
def canonical_meta(lens_key=None):
    """Canonical-decode metadata for a code-length vector.

    Returns (bounds, kvals, packed):
      bounds[l], l in 1..MAXL: smallest 12-bit-scaled value NOT decodable
        at length <= l; code length of r12 = 1 + #{l in 1..MAXL-1: r12 >= bounds[l]}.
      kvals[l]: sym_offset[l] - first_code[l], so that
        sorted_index = kvals[L] + (r12 >> (MAXL - L)).
      packed[i] for the i-th symbol in (length, symbol) order:
        val | extra << 9 | cls << 13  (val: literal byte or length base;
        extra: extra-bit count for length symbols; cls: 0 lit / 1 EOB / 2 len).
    """
    if lens_key is None:
        lens = np.asarray(HUFFMAN_LENGTHS, dtype=np.int64)
    else:
        lens = np.asarray(lens_key, dtype=np.int64)
    assert lens.max() <= MAXL
    cnt = np.bincount(lens, minlength=MAXL + 1)
    cnt[0] = 0
    first = np.zeros(MAXL + 1, np.int64)
    code = 0
    for L in range(1, MAXL + 1):
        first[L] = code
        code = (code + cnt[L]) << 1
    bounds = [0] * (MAXL + 1)
    off = [0] * (MAXL + 1)
    kvals = [0] * (MAXL + 1)
    acc = 0
    for L in range(1, MAXL + 1):
        bounds[L] = int(first[L] + cnt[L]) << (MAXL - L)
        off[L] = acc
        acc += int(cnt[L])
        kvals[L] = off[L] - int(first[L])

    order = np.lexsort((np.arange(len(lens)), lens))
    order = order[lens[order] > 0]
    packed = np.zeros(_TAB_PAD, np.int32)
    for i, sym in enumerate(order):
        if sym < 256:
            val, extra, cls = int(sym), 0, _CLS_LIT
        elif sym == 256:
            val, extra, cls = 0, 0, _CLS_EOB
        else:
            val = int(LEN_SYM_TO_LEN_BASE[sym - 257])
            extra = int(LEN_SYM_TO_LEN_EXTRA[sym - 257])
            cls = _CLS_LEN
        packed[i] = val | (extra << 9) | (cls << 13)
    return tuple(bounds), tuple(kvals), packed


def _bitrev12_np(x):
    r = 0
    for i in range(12):
        r |= ((x >> i) & 1) << (11 - i)
    return r


def decode_chunk_np(words: np.ndarray, nbytes: int,
                    lens=None) -> tuple[np.ndarray, int]:
    """Numpy oracle: decode one fixed-geometry chunk (bit 0 of ``words``).

    ``lens``: optional code-length vector for a runtime <=12-bit tree
    (e.g. ops/septree's kernel tree); None = trained PNG tree.
    Returns (bytes u8[nbytes], bits_consumed).  Raises on EOB or overrun.
    """
    bounds, kvals, packed = canonical_meta(
        None if lens is None else tuple(int(x) for x in lens))
    out = np.zeros(nbytes, np.uint8)
    pos = 0
    opos = 0
    # via uint32 first: int32 inputs must not sign-extend into the peeks
    w = words.astype(np.uint32).astype(np.uint64)

    def peek(p, n):
        wi, sh = p >> 5, p & 31
        v = int(w[wi]) >> sh
        if wi + 1 < len(w):
            v |= int(w[wi + 1]) << (32 - sh)
        return v & ((1 << n) - 1)

    while opos < nbytes:
        r12 = _bitrev12_np(peek(pos, 12))
        L = 1
        for l in range(1, MAXL):
            if r12 >= bounds[l]:
                L += 1
        idx = kvals[L] + (r12 >> (MAXL - L))
        e = int(packed[idx])
        val, extra, cls = e & 0x1FF, (e >> 9) & 0xF, e >> 13
        if cls == _CLS_LIT:
            out[opos] = val
            opos += 1
            pos += L
        elif cls == _CLS_LEN:
            run = val + peek(pos + L, extra)
            dbit = peek(pos + L + extra, 1)
            if dbit != 0:
                raise ValueError("bad distance code")
            if opos + run > nbytes:
                raise ValueError("run overruns chunk quota")
            # ultra-fast runs are dist-1 zero runs; preceding literal was 0
            out[opos : opos + run] = out[opos - 1]
            opos += run
            pos += L + extra + 1
        else:
            raise ValueError("EOB inside chunk")
    return out, pos


def _kernel(win_ref, tab_ref, out_ref, bpos_ref, state, *,
            wwin: int, U: int, bounds, kvals, lane_major: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i32 = jnp.int32
    u32 = jnp.uint32
    sb = pl.program_id(1)
    num_sb = pl.num_programs(1)

    win = win_ref[0]            # [wwin, 8, 128]
    tab = tab_ref[...]          # [1, _TAB_PAD]
    iota_w = jax.lax.broadcasted_iota(i32, (wwin, 8, LANE), 0)
    iota_t = jax.lax.broadcasted_iota(i32, (8, LANE, _TAB_PAD), 2)

    def word_at(widx):
        sel = iota_w == widx[None]
        return jnp.sum(jnp.where(sel, win, 0), axis=0)

    def sym_lookup(idx):
        sel = iota_t == idx[:, :, None]
        return jnp.sum(jnp.where(sel, tab.reshape(1, 1, _TAB_PAD), 0), axis=2)

    # state rows: 0 pos, 1 run_rem, 2 base, 3..7 w0..w4 (160-bit window)
    @pl.when(sb == 0)
    def _init():
        state[0] = jnp.zeros((8, LANE), i32)
        state[1] = jnp.zeros((8, LANE), i32)
        state[2] = jnp.zeros((8, LANE), i32)
        for j in range(5):
            state[3 + j] = win[j]

    pos, run_rem, base = state[0], state[1], state[2]
    w = [state[3 + j] for j in range(5)]

    def bitrev12(x):
        # reverse-16 via masked swap rounds, then drop the low 4 bits
        x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
        x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
        x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
        x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
        return x >> 4

    for u in range(U):
        pos_off = pos - (base << 5)

        def peek32(o):
            oo = pos_off + o
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

        consumed = jnp.zeros((8, LANE), i32)
        word = jnp.zeros((8, LANE), u32)
        filled = jnp.zeros((8, LANE), i32)
        for _sub in range(4):
            space = 4 - filled
            take = jnp.minimum(run_rem, space)
            filled = filled + take
            run_rem = run_rem - take

            need = (filled < 4) & (run_rem == 0)
            bits = peek32(consumed)
            r12 = bitrev12((bits & 0xFFF).astype(i32))
            L = jnp.ones((8, LANE), i32)
            for l in range(1, MAXL):
                L = L + (r12 >= bounds[l]).astype(i32)
            Kv = jnp.full((8, LANE), kvals[MAXL], i32)
            for l in range(1, MAXL):
                Kv = jnp.where(L == l, kvals[l], Kv)
            idx = Kv + (r12 >> (MAXL - L))
            e = sym_lookup(jnp.where(need, idx, 0))
            val = e & 0x1FF
            extra = (e >> 9) & 0xF
            cls = e >> 13

            is_lit = need & (cls == _CLS_LIT)
            is_run = need & (cls == _CLS_LEN)
            word = word | jnp.where(
                is_lit, val.astype(u32) << (filled * 8).astype(u32), u32(0)
            )
            filled = filled + is_lit.astype(i32)
            run_val = val + ((bits >> L.astype(u32)).astype(i32)
                             & ((1 << extra) - 1))
            run_rem = jnp.where(is_run, run_val, run_rem)
            consumed = consumed + jnp.where(
                is_lit, L, jnp.where(is_run, L + extra + 1, 0)
            )

        # A run decoded in the last sub hasn't placed its zeros yet: take
        # them now so the word's byte accounting stays exact.
        take = jnp.minimum(run_rem, 4 - filled)
        filled = filled + take
        run_rem = run_rem - take

        pos = pos + consumed
        if lane_major:
            out_ref[0, :, :, u] = word.astype(i32)
        else:
            out_ref[0, u] = word.astype(i32)

        # Refill: valid streams consume <= 62 bits/step -> <= 2 new words.
        for _ in range(2):
            need_r = (pos >> 5) > base
            for j in range(4):
                w[j] = jnp.where(need_r, w[j + 1], w[j])
            base = jnp.where(need_r, base + 1, base)
            w[4] = jnp.where(need_r, word_at(base + 4), w[4])

    state[0], state[1], state[2] = pos, run_rem, base
    for j in range(5):
        state[3 + j] = w[j]

    @pl.when(sb == num_sb - 1)
    def _finish():
        bpos_ref[0] = state[0]


def _kernel_light(win_ref, tab_ref, meta_ref, out_ref, bpos_ref, state, *,
                  wwin: int, U: int, lane_major: bool, R: int = 1,
                  fast: bool = True, mid: tuple | None = None):
    """Compile-light kernel body: identical semantics to ``_kernel``.

    Canonical-decode metadata (bounds/kvals) arrives as a runtime SMEM
    input rather than compile-time constants, so ONE compiled kernel
    serves any <=12-bit canonical tree — the trained PNG tree and the
    per-batch adaptive trees of ops/adaptive.py hit the same executable
    (and the same persistent-cache entry).

    The remote Mosaic toolchain's compile time scales with program size, and
    the fully-unrolled select-reduces of ``_kernel`` (window refill over
    ``wwin`` words, symbol lookup over 512 entries, each instantiated 2-4x
    per unrolled step) produce programs in the 10^5-instruction range that
    take tens of minutes to compile over the accelerator tunnel.  This body
    keeps the per-step work identical but:

    * window refill and symbol lookup run as ``fori_loop``s with 8-wide
      unrolled bodies (program size O(U), not O(U * wwin));
    * the symbol table lives in SMEM as 256 packed *pairs* (two 15-bit
      entries per int32) read with scalar dynamic loads — halving the
      select-reduce depth and avoiding any VMEM lane-indexed access;
    * the lane-block window is never materialized as a value (the original
      ``win = win_ref[0]`` forces ~wwin vector registers through every
      unrolled select, which Mosaic must spill).

    ``R`` decodes R independent lane-blocks per kernel instance with their
    elementwise chains interleaved in the instruction stream.  The decode
    step is one long serial dependency chain; VPU calibration
    (bench/probe_vpu.py) measures ~1.3 ns/op for a serial chain vs
    ~0.2 ns/op for 8 interleaved chains, i.e. a fully serial kernel leaves
    ~5x of the issue width idle.  R-way interleaving recovers it: all state
    becomes length-R lists, and the two dynamic-bound scans (window refill,
    symbol lookup) are merged across the R blocks so their loop bodies
    interleave too (bounds = union over blocks; the per-iteration loads are
    per-block but the R select chains stay independent).

    ``fast`` (round 4): every dynamic-bound scan pays a cross-lane min/max
    -> scalar sync, and those syncs are ~68% of the kernel
    (bench/probe_ablate.py marginal re-measurement).  The fast path
    removes five of the six: symbol lookups become STATIC two-level
    sublane gathers (``tab_ref`` arrives as 18 (8, 128) tiles whose
    sublanes hold 8 consecutive pair-words; one take_along_axis per tile
    + a tile-select — no scan, no sync), and the two per-step refill
    rounds merge into ONE bounded scan that fetches both replacement
    words.  ``fast=False`` keeps the round-3 dynamic-scan body for A/B.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i32 = jnp.int32
    u32 = jnp.uint32
    sb = pl.program_id(1)
    num_sb = pl.num_programs(1)
    npairs = _TAB_PAD // 2
    RR = range(R)

    def zeros():
        return jnp.zeros((8, LANE), i32)

    if fast:
        # Hoist the canonical-metadata rows out of the per-(r, sub) chains:
        # the 12 bound rows + 12 kval rows are loop-invariant, and leaving
        # the loads inline costs ~400 redundant VMEM row loads per step.
        _bv = [None] + [meta_ref[l] for l in range(1, MAXL + 1)]
        _kv = [None] + [meta_ref[16 + l] for l in range(1, MAXL + 1)]
        # Sublane-varying kval tiles (round 5): row 13's sublane s holds
        # kvals[s+1], row 14's holds kvals[s+9].  One take_along_axis pair
        # + select replaces the 11-deep compare/select chain per sub
        # (~23 vector ops -> 6).
        _kvt0 = meta_ref[13]
        _kvt1 = meta_ref[14]

    # The canonical metadata and the pair-packed symbol table arrive as
    # PRE-BROADCAST VMEM inputs (meta_ref i32[32, 8, 128]: row l = bounds[l],
    # row 16+l = kvals[l]; tab_ref i32[npairs, 8, 128]: row p = pair p).  A
    # scalar (SMEM) operand inside a vector op forces a scalar->vector
    # broadcast at every use site, and Mosaic does not CSE them: with the
    # metadata in SMEM the step loop's compare/select chains emitted ~170
    # `vector.broadcast`s per decode step (measured via the debug=True
    # module dump), which dominated the kernel at ~7 us/step — scans, sub
    # arithmetic, and program size all ablated to noise next to it
    # (bench/probe_ablate.py).  Replicated VMEM rows turn every use into a
    # plain vector load; indexing per USE (not hoisting 26 row values to
    # kernel scope) keeps register pressure flat so R=8 doesn't spill.
    def bound_v(l):
        return _bv[l] if fast else meta_ref[l]

    def kval_v(l):
        return _kv[l] if fast else meta_ref[16 + l]

    # Both lookups below are select-reduce scans with DYNAMIC bounds: a
    # scalar min/max over the lane blocks bounds the scan to the index range
    # actually present this step.  Lanes in a block decode the same corpus
    # at the same byte rate, so their stream positions cluster (refill scans
    # a few 8-word groups, not all wwin), and exact-Kraft canonical codes
    # map ANY 12-bit peek to idx < nsyms with frequent symbols first (the
    # symbol scan covers the hot prefix, not all 256 pairs).  Worst case
    # degrades to the full scan, never past it.

    def word_at(widx):
        # widx: R arrays.  Clamp to the window: padding lanes decode garbage
        # from all-zero windows and can push widx past wwin; out-of-range
        # lanes read 0 (exactly like a full scan, which simply never
        # matched).
        glo_s, ghi_s = jnp.min(widx[0]), jnp.max(widx[0])
        for r in range(1, R):
            glo_s = jnp.minimum(glo_s, jnp.min(widx[r]))
            ghi_s = jnp.maximum(ghi_s, jnp.max(widx[r]))
        glo = jnp.minimum(glo_s >> 3, wwin // 8)
        ghi = jnp.minimum((ghi_s >> 3) + 1, wwin // 8)

        def body(g, accs):
            accs = list(accs)
            w0 = g * 8
            # one broadcast of the loop counter per iteration; the eight
            # per-word compares are then vector-vs-constant (no broadcasts)
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
        if mid is not None:
            # Affine-middle lookup (round 5): sublane gathers cost ~20 ns
            # per (8, 128) take vs ~3.6 ns per select (/tmp take-cost
            # microbench), so the 18-take full-table scan IS the kernel.
            # The trained tree's canonical order makes most of the table
            # redundant: its 171 max-length literals are CONTIGUOUS byte
            # values (43..213), so for idx in [n1, n2) the entry is just
            # idx + bias (cls=lit, extra=0) — no table.  Only the hot
            # prefix (idx < n1 <= 112, 7 tiles) and the non-literal tail
            # (< 16 entries, 1 tile) need gathers: 8 takes instead of 18.
            n1, n2, bias = mid
            w1 = (n1 + 15) // 16          # hot tiles
            his = [idx[r] >> 4 for r in RR]
            los = [(idx[r] >> 1) & 7 for r in RR]

            def body(g, accs):
                accs = list(accs)
                for r in RR:
                    cand = jnp.take_along_axis(tab_ref[g], los[r], axis=0)
                    accs[r] = jnp.where(his[r] == g, cand, accs[r])
                return tuple(accs)

            accs = jax.lax.fori_loop(
                0, w1, body, tuple(zeros() for _ in RR))
            out = []
            nlw = n2 >> 1                 # first pair-word of the tail
            for r in RR:
                e_hot = (accs[r] >> ((idx[r] & 1) * 16)) & 0x7FFF
                e_mid = idx[r] + bias
                cnl = jnp.take_along_axis(
                    tab_ref[w1], ((idx[r] >> 1) - nlw) & 7, axis=0)
                e_nl = (cnl >> ((idx[r] & 1) * 16)) & 0x7FFF
                out.append(jnp.where(
                    idx[r] >= n2, e_nl,
                    jnp.where(idx[r] >= n1, e_mid, e_hot)))
            return out
        if fast:
            # Static two-level sublane gather: tile g's sublanes hold
            # pair-words 8g..8g+7 (tab_ref is (18, 8, 128) in fast mode);
            # one take_along_axis per tile + a tile select — no scan
            # bound, no cross-lane sync.  fori_loop keeps the program
            # compact (an unrolled 18x16xU body explodes compile time).
            his = [idx[r] >> 4 for r in RR]
            los = [(idx[r] >> 1) & 7 for r in RR]

            def body(g, accs):
                accs = list(accs)
                for r in RR:
                    cand = jnp.take_along_axis(tab_ref[g], los[r], axis=0)
                    accs[r] = jnp.where(his[r] == g, cand, accs[r])
                return tuple(accs)

            accs = jax.lax.fori_loop(
                0, 18, body, tuple(zeros() for _ in RR))
            return [(accs[r] >> ((idx[r] & 1) * 16)) & 0x7FFF for r in RR]

        pidx = [ix >> 1 for ix in idx]
        m = jnp.max(pidx[0])
        for r in range(1, R):
            m = jnp.maximum(m, jnp.max(pidx[r]))
        ghi = jnp.minimum((m >> 3) + 1, npairs // 8)

        def body(g, accs):
            accs = list(accs)
            p0 = g * 8
            rel = [pidx[r] - (zeros() + p0) for r in RR]
            for j in range(8):
                v = tab_ref[p0 + j]
                for r in RR:
                    accs[r] = jnp.where(rel[r] == j, v, accs[r])
            return tuple(accs)

        accp = jax.lax.fori_loop(0, ghi, body, tuple(zeros() for _ in RR))
        return [(accp[r] >> ((idx[r] & 1) * 16)) & 0x7FFF for r in RR]

    def words_at2(w3idx):
        """Fetch words w3idx and w3idx+1 per lane in ONE bounded scan
        (fast refill: one cross-lane sync per step instead of two)."""
        glo_s, ghi_s = jnp.min(w3idx[0]), jnp.max(w3idx[0])
        for r in range(1, R):
            glo_s = jnp.minimum(glo_s, jnp.min(w3idx[r]))
            ghi_s = jnp.maximum(ghi_s, jnp.max(w3idx[r]))
        glo = jnp.minimum(glo_s >> 3, wwin // 8)
        ghi = jnp.minimum(((ghi_s + 1) >> 3) + 1, wwin // 8)

        def body(g, accs):
            a3, a4 = list(accs[0]), list(accs[1])
            w0 = g * 8
            rel = [w3idx[r] - (zeros() + w0) for r in RR]
            for j in range(8):
                for r in RR:
                    v = win_ref[r, w0 + j]
                    a3[r] = jnp.where(rel[r] == j, v, a3[r])
                    a4[r] = jnp.where(rel[r] == j - 1, v, a4[r])
            return (tuple(a3), tuple(a4))

        a3, a4 = jax.lax.fori_loop(
            glo, ghi, body,
            (tuple(zeros() for _ in RR), tuple(zeros() for _ in RR)),
        )
        return list(a3), list(a4)

    # state rows per block: 0 pos, 1 run_rem, 2 base, 3..7 w0..w4 (160 bits)
    @pl.when(sb == 0)
    def _init():
        for r in RR:
            state[r, 0] = zeros()
            state[r, 1] = zeros()
            state[r, 2] = zeros()
            for j in range(5):
                state[r, 3 + j] = win_ref[r, j]

    pos = [state[r, 0] for r in RR]
    run_rem = [state[r, 1] for r in RR]
    base = [state[r, 2] for r in RR]
    w = [[state[r, 3 + j] for j in range(5)] for r in RR]

    def bitrev12(x):
        x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
        x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
        x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
        x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
        return x >> 4

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

    for u in range(U):
        pos_off = [pos[r] - (base[r] << 5) for r in RR]

        consumed = [zeros() for _ in RR]
        word = [zeros().astype(u32) for _ in RR]
        filled = [zeros() for _ in RR]
        for _sub in range(4):
            need, bits, r12 = [None] * R, [None] * R, [None] * R
            for r in RR:
                space = 4 - filled[r]
                take = jnp.minimum(run_rem[r], space)
                filled[r] = filled[r] + take
                run_rem[r] = run_rem[r] - take
                need[r] = (filled[r] < 4) & (run_rem[r] == 0)
                bits[r] = peek32(r, pos_off[r], consumed[r])
                r12[r] = bitrev12((bits[r] & 0xFFF).astype(i32))
            L, idx = [None] * R, [None] * R
            for r in RR:
                Lr = jnp.ones((8, LANE), i32)
                for l in range(1, MAXL):
                    Lr = Lr + (r12[r] >= bound_v(l)).astype(i32)
                if fast:
                    # kvals via sublane gather: m in [0, 11]; m & 7 equals
                    # m - 8 for m >= 8, so both tiles share one index.
                    m = (Lr - 1) & 7
                    Kv = jnp.where(
                        Lr > 8,
                        jnp.take_along_axis(_kvt1, m, axis=0),
                        jnp.take_along_axis(_kvt0, m, axis=0))
                else:
                    Kv = zeros() + kval_v(MAXL)
                    for l in range(1, MAXL):
                        Kv = jnp.where(Lr == l, kval_v(l), Kv)
                L[r] = Lr
                idx[r] = Kv + (r12[r] >> (MAXL - Lr))
            e = sym_lookup([jnp.where(need[r], idx[r], 0) for r in RR])
            for r in RR:
                val = e[r] & 0x1FF
                extra = (e[r] >> 9) & 0xF
                cls = e[r] >> 13

                is_lit = need[r] & (cls == _CLS_LIT)
                is_run = need[r] & (cls == _CLS_LEN)
                word[r] = word[r] | jnp.where(
                    is_lit,
                    val.astype(u32) << (filled[r] * 8).astype(u32),
                    u32(0),
                )
                filled[r] = filled[r] + is_lit.astype(i32)
                run_val = val + ((bits[r] >> L[r].astype(u32)).astype(i32)
                                 & ((1 << extra) - 1))
                run_rem[r] = jnp.where(is_run, run_val, run_rem[r])
                consumed[r] = consumed[r] + jnp.where(
                    is_lit, L[r], jnp.where(is_run, L[r] + extra + 1, 0)
                )

        for r in RR:
            take = jnp.minimum(run_rem[r], 4 - filled[r])
            filled[r] = filled[r] + take
            run_rem[r] = run_rem[r] - take

            pos[r] = pos[r] + consumed[r]
            if lane_major:
                out_ref[r, :, :, u] = word[r].astype(i32)
            else:
                out_ref[r, u] = word[r].astype(i32)

        # Refill: valid streams consume <= 62 bits/step -> <= 2 new words.
        if fast:
            # Merged: advance by d in {0,1,2}, shift the ring by d, fetch
            # both replacement words in ONE bounded scan (one sync/step).
            d = [jnp.clip((pos[r] >> 5) - base[r], 0, 2) for r in RR]
            for r in RR:
                for j in range(3):
                    w[r][j] = jnp.where(
                        d[r] == 1, w[r][j + 1],
                        jnp.where(d[r] == 2, w[r][j + 2], w[r][j]))
                w[r][3] = jnp.where(d[r] == 1, w[r][4], w[r][3])
                base[r] = base[r] + d[r]
            a3, a4 = words_at2([base[r] + 3 for r in RR])
            for r in RR:
                w[r][3] = jnp.where(d[r] == 2, a3[r], w[r][3])
                w[r][4] = jnp.where(d[r] >= 1, a4[r], w[r][4])
        else:
            for _ in range(2):
                need_f = [(pos[r] >> 5) > base[r] for r in RR]
                for r in RR:
                    for j in range(4):
                        w[r][j] = jnp.where(need_f[r], w[r][j + 1],
                                            w[r][j])
                    base[r] = jnp.where(need_f[r], base[r] + 1, base[r])
                neww = word_at([base[r] + 4 for r in RR])
                for r in RR:
                    w[r][4] = jnp.where(need_f[r], neww[r], w[r][4])

    for r in RR:
        state[r, 0] = pos[r]
        state[r, 1] = run_rem[r]
        state[r, 2] = base[r]
        for j in range(5):
            state[r, 3 + j] = w[r][j]

    @pl.when(sb == num_sb - 1)
    def _finish():
        for r in RR:
            bpos_ref[r] = state[r, 0]


def sep_meta(lens=None):
    """Metadata rows for the class-separated kernel (ops/septree).

    Returns (meta i32[32], vals i32[64]):
      meta: rows 0..MAXL bounds, 16..16+MAXL kvals, row 15 = n_lit (the
        count of literal codes == the sorted index where the length class
        starts; the sep tree property makes every idx < n_lit a literal
        and idx - n_lit an affine symbol offset).
      vals: literal byte values by sorted index, FOUR per int32.
    """
    from .septree import kernel_tree

    if lens is None:
        lens, _ = kernel_tree()
    lens = np.asarray(lens, np.int64)
    bounds, kvals, packed = canonical_meta(tuple(int(x) for x in lens))
    n_lit = int(np.count_nonzero(lens[:256]))
    assert (lens[256:] == MAXL).all() and (lens[:256] <= MAXL - 1).all(), \
        "sep kernel needs the class-separated tree (ops/septree)"
    meta = np.zeros(32, np.int32)
    meta[: MAXL + 1] = bounds
    meta[16 : 16 + MAXL + 1] = kvals
    meta[15] = n_lit
    vals64 = np.zeros(64, np.int64)
    for i in range(n_lit):
        e = int(packed[i])
        assert (e >> 13) == _CLS_LIT
        vals64[i >> 2] |= (e & 0xFF) << ((i & 3) * 8)
    vals = vals64.astype(np.uint32).view(np.int32)
    return meta, vals


def _kernel_sep(win_ref, val_ref, meta_ref, out_ref, bpos_ref, state, *,
                wwin: int, U: int, lane_major: bool, R: int):
    """Class-separated decode kernel: table-free advance chain.

    Same contract as ``_kernel_light`` but requires a sep tree
    (ops/septree): code length 12 <=> length-symbol class, so the advance
    chain (positions, run lengths, extra bits) is pure arithmetic —
    cls = (L == 12), sym = 256 + (idx - n_lit), RFC 1951 closed forms for
    base/extra.  Only literal VALUES remain a lookup, and they do not feed
    the chain, so one step's <=4 of them merge into a single STATIC
    8-group scan over the 4-packed value table.  Per step there is exactly
    ONE dynamic-bound scan (the merged two-word refill) and therefore one
    cross-lane min/max -> scalar sync — the v2 kernel pays six, and those
    syncs are ~68% of its time (bench/probe_ablate.py, round-4 marginal).
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

    # NOTE: hoisting these rows to kernel scope was measured SLOWER here
    # (3.12 -> 2.58 GB/s): 25 extra live vregs spill the sep step's larger
    # working set.  _kernel_light keeps the hoist (+2%); this kernel loads
    # per use.
    def bound_v(l):
        return meta_ref[l]

    def kval_v(l):
        return meta_ref[16 + l]

    def words_at2(w3idx):
        """Fetch words w3idx and w3idx+1 per lane in ONE bounded scan."""
        glo_s, ghi_s = jnp.min(w3idx[0]), jnp.max(w3idx[0])
        for r in range(1, R):
            glo_s = jnp.minimum(glo_s, jnp.min(w3idx[r]))
            ghi_s = jnp.maximum(ghi_s, jnp.max(w3idx[r]))
        glo = jnp.minimum(glo_s >> 3, wwin // 8)
        ghi = jnp.minimum(((ghi_s + 1) >> 3) + 1, wwin // 8)

        def body(g, accs):
            a3, a4 = list(accs[0]), list(accs[1])
            w0 = g * 8
            rel = [w3idx[r] - (zeros() + w0) for r in RR]
            for j in range(8):
                for r in RR:
                    v = win_ref[r, w0 + j]
                    a3[r] = jnp.where(rel[r] == j, v, a3[r])
                    a4[r] = jnp.where(rel[r] == j - 1, v, a4[r])
            return (tuple(a3), tuple(a4))

        a3, a4 = jax.lax.fori_loop(
            glo, ghi, body,
            (tuple(zeros() for _ in RR), tuple(zeros() for _ in RR)),
        )
        return list(a3), list(a4)

    def val_lookup(qidx):
        """Literal-value lookup via SUBLANE GATHER: the 64 4-packed value
        words live in 8 (8, 128) tiles (val_ref[g][s, :] = word g*8+s);
        per tile one take_along_axis picks sublane qidx&7 per lane
        position and a compare on qidx>>3 selects the right tile.  ~24
        static ops, no scan, no cross-lane sync (round-1 probe: [8,128]
        axis-0 take_along_axis lowers correctly on Mosaic)."""
        hi = qidx >> 3
        lo = qidx & 7

        def body(g, acc):
            cand = jnp.take_along_axis(val_ref[g], lo, axis=0)
            return jnp.where(hi == g, cand, acc)

        return jax.lax.fori_loop(0, 8, body, zeros())

    # state rows per block: 0 pos, 1 run_rem, 2 base, 3..7 w0..w4
    @pl.when(sb == 0)
    def _init():
        for r in RR:
            state[r, 0] = zeros()
            state[r, 1] = zeros()
            state[r, 2] = zeros()
            for j in range(5):
                state[r, 3 + j] = win_ref[r, j]

    pos = [state[r, 0] for r in RR]
    run_rem = [state[r, 1] for r in RR]
    base = [state[r, 2] for r in RR]
    w = [[state[r, 3 + j] for j in range(5)] for r in RR]

    def bitrev12(x):
        x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
        x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
        x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
        x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
        return x >> 4

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

    for u in range(U):
        pos_off = [pos[r] - (base[r] << 5) for r in RR]

        consumed = [zeros() for _ in RR]
        filled = [zeros() for _ in RR]
        word = [zeros().astype(u32) for _ in RR]
        for _s4 in range(4):
            for r in RR:
                space = 4 - filled[r]
                take = jnp.minimum(run_rem[r], space)
                filled[r] = filled[r] + take
                run_rem[r] = run_rem[r] - take
                need = (filled[r] < 4) & (run_rem[r] == 0)

                bits = peek32(r, pos_off[r], consumed[r])
                r12 = bitrev12((bits & 0xFFF).astype(i32))
                L = jnp.ones((8, LANE), i32)
                for l in range(1, MAXL):
                    L = L + (r12 >= bound_v(l)).astype(i32)
                Kv = zeros() + kval_v(MAXL)
                for l in range(1, MAXL):
                    Kv = jnp.where(L == l, kval_v(l), Kv)
                idx = Kv + (r12 >> (MAXL - L))

                is12 = need & (L == MAXL)
                off = idx - meta_ref[15]
                sp = off - 1
                e = jnp.where(sp < 4, 0, (sp >> 2) - 1)
                e = jnp.where(sp == 28, 0, e)
                bse = jnp.where(sp < 4, sp + 3,
                                ((4 + (sp & 3)) << e) + 3)
                bse = jnp.where(sp == 28, 258, bse)
                run_val = bse + ((bits >> L.astype(u32)).astype(i32)
                                 & ((1 << e) - 1))

                is_run = is12 & (off > 0)
                is_lit = need & ~is12
                vw = val_lookup(idx >> 2)
                byte = (vw >> ((idx & 3) * 8)) & 0xFF
                word[r] = word[r] | jnp.where(
                    is_lit,
                    byte.astype(u32) << (filled[r] * 8).astype(u32),
                    u32(0))
                filled[r] = filled[r] + is_lit.astype(i32)
                run_rem[r] = jnp.where(is_run, run_val, run_rem[r])
                consumed[r] = consumed[r] + jnp.where(
                    is_lit, L,
                    jnp.where(is_run, L + e + 1,
                              jnp.where(is12, L, 0)))

        for r in RR:
            take = jnp.minimum(run_rem[r], 4 - filled[r])
            filled[r] = filled[r] + take
            run_rem[r] = run_rem[r] - take

            pos[r] = pos[r] + consumed[r]
            if lane_major:
                out_ref[r, :, :, u] = word[r].astype(i32)
            else:
                out_ref[r, u] = word[r].astype(i32)

        # Merged refill: <= 54 bits consumed -> base advances by d in
        # {0, 1, 2}; shift the register ring by d and fetch the <= 2 new
        # words in ONE bounded scan (one cross-lane sync per step).
        d = [jnp.clip((pos[r] >> 5) - base[r], 0, 2) for r in RR]
        for r in RR:
            for j in range(3):
                w[r][j] = jnp.where(
                    d[r] == 1, w[r][j + 1],
                    jnp.where(d[r] == 2, w[r][j + 2], w[r][j]))
            w[r][3] = jnp.where(d[r] == 1, w[r][4], w[r][3])
            base[r] = base[r] + d[r]
        a3, a4 = words_at2([base[r] + 3 for r in RR])
        for r in RR:
            w[r][3] = jnp.where(d[r] == 2, a3[r], w[r][3])
            w[r][4] = jnp.where(d[r] >= 1, a4[r], w[r][4])

    for r in RR:
        state[r, 0] = pos[r]
        state[r, 1] = run_rem[r]
        state[r, 2] = base[r]
        for j in range(5):
            state[r, 3 + j] = w[r][j]

    @pl.when(sb == num_sb - 1)
    def _finish():
        for r in RR:
            bpos_ref[r] = state[r, 0]


def decode_blocked_sep(win, T: int, U: int = 32,
                       interpret: bool | None = None,
                       lane_major: bool | None = None,
                       tables=None, R: int | None = None):
    """Decode fixed-geometry lane-blocked SEP-TREE streams.

    Drop-in sibling of ``decode_blocked`` for streams encoded with the
    class-separated tree (ops/septree; pass ``tree=sep_profile()`` to the
    encoder).  ``tables``: optional (meta i32[32], vals i32[64]) from
    ``sep_meta`` for a runtime sep tree; None selects the canonical
    kernel-tree profile.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if lane_major is None:
        lane_major = U % 128 == 0

    LB, wwin, _, _ = win.shape
    assert T % U == 0
    SB = T // U

    if wwin % 8 != 0:
        pad = 8 - wwin % 8
        win = jnp.pad(win, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wwin += pad

    blk_bytes = (wwin + U) * 8 * LANE * 4
    if R is None:
        R = 1
        for cand in (2, 4, 8):
            if LB % cand == 0 and cand * blk_bytes <= 30 << 20:
                R = cand
    if R > 1 and LB % R != 0:
        pad_lb = (-LB) % R
        win = jnp.pad(win, ((0, pad_lb), (0, 0), (0, 0), (0, 0)))
        out, bpos = decode_blocked_sep(
            win, T, U=U, interpret=interpret, lane_major=lane_major,
            tables=tables, R=R)
        return out[:LB], bpos[:LB]

    # Value tiles for the sublane-gather lookup: val_arg[g][s, :] holds
    # 4-packed value word g*8+s (broadcast across lanes).
    if tables is None:
        meta_np, vals_np = sep_meta()
        meta_arg = jnp.asarray(np.ascontiguousarray(
            np.broadcast_to(meta_np[:, None, None], (32, 8, LANE))))
        val_arg = jnp.asarray(np.ascontiguousarray(
            np.broadcast_to(vals_np.reshape(8, 8)[:, :, None],
                            (8, 8, LANE))))
    else:
        meta_in, vals_in = tables
        meta_arg = jnp.broadcast_to(meta_in.reshape(32, 1, 1), (32, 8, LANE))
        val_arg = jnp.broadcast_to(vals_in.reshape(8, 8, 1), (8, 8, LANE))

    kern = functools.partial(
        _kernel_sep, wwin=wwin, U=U, lane_major=lane_major, R=R)
    if lane_major:
        out_spec = pl.BlockSpec((R, 8, LANE, U), lambda lb, sb: (lb, 0, 0, sb),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((LB, 8, LANE, T), jnp.int32)
    else:
        out_spec = pl.BlockSpec((R, U, 8, LANE), lambda lb, sb: (lb, sb, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((LB, T, 8, LANE), jnp.int32)
    f = pl.pallas_call(
        kern,
        grid=(LB // R, SB),
        in_specs=[
            pl.BlockSpec((R, wwin, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8, LANE), lambda lb, sb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 8, LANE), lambda lb, sb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            out_spec,
            pl.BlockSpec((R, 8, LANE), lambda lb, sb: (lb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_shape,
            jax.ShapeDtypeStruct((LB, 8, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((R, 8, 8, LANE), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get(
                "FDN_DEC_VMEM",
                min(120 << 20, max(32 << 20, 2 * R * blk_bytes + (4 << 20))),
            ))),
    )
    out, bpos = f(win, val_arg, meta_arg)
    return out, bpos


def decode_blocked(win, T: int, U: int = 32, interpret: bool | None = None,
                   lane_major: bool | None = None, light: bool = True,
                   tables=None, R: int | None = None,
                   fast: bool | None = None):
    """Decode fixed-geometry lane-blocked streams.

    Args:
      win: i32[LB, wwin, 8, 128] per-lane bit windows (chunk bit 0 at word 0).
      T: output words per lane (chunk bytes / 4).
      U: steps per grid cell (T % U == 0).
      lane_major: True -> out i32[LB, 8, 128, T] (reshapes to standard
        [B, N] bytes with zero data movement; Mosaic requires U % 128 == 0).
        False -> out i32[LB, T, 8, 128] (step-major; pair with corner_turn).
        None -> lane-major when U % 128 == 0.
      light: use the compile-light kernel body (fori_loop select-reduces,
        SMEM pair-packed symbol table).  Semantically identical to the
        unrolled body, which is kept for A/B timing; the unrolled form
        produces ~10^5-instruction Mosaic programs whose remote compiles
        take tens of minutes on this platform.
      tables: optional (meta i32[1, 32], tabp i32[1, 256]) runtime
        canonical tree (ops/adaptive.decode_meta); None selects the
        trained PNG tree.  Light kernel only.
      R: lane-blocks interleaved per kernel instance (light kernel).  The
        decode step is a serial dependency chain; R independent chains fill
        the VPU issue pipeline (bench/probe_vpu.py: ~5x idle width at R=1).
        None -> largest of {1, 2, 4, 8} dividing LB whose VMEM working set
        (R window blocks + output block) stays under ~30 MiB (a 27 MiB
        working set is measured-good on TPU v5e: R=8 at S=2048 runs and
        beats R=1 by 1.4x).

      fast: sync-free lookups + merged refill (see _kernel_light); None
        -> True for the light kernel.  A/B switch for the round-3 body.

    Returns (out, bpos i32[LB, 8, 128]) — bpos is each lane's final bit
    position (== the encoder's chunk_bits when the decode is exact).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if lane_major is None:
        lane_major = U % 128 == 0
    if fast is None:
        fast = light

    LB, wwin, _, _ = win.shape
    assert T % U == 0
    assert not lane_major or U % 128 == 0 or U == T, \
        "lane-major out block needs U % 128 == 0 (Mosaic tiling)"
    SB = T // U
    bounds, kvals, packed = canonical_meta()

    if light and wwin % 8 != 0:
        pad = 8 - wwin % 8
        win = jnp.pad(win, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wwin += pad

    blk_bytes = (wwin + U) * 8 * LANE * 4
    if not light:
        R = 1
    elif R is None:
        R = 1
        for cand in (2, 4, 8):
            if LB % cand == 0 and cand * blk_bytes <= 30 << 20:
                R = cand
    if R > 1 and LB % R != 0:
        # Pad with zero-window lane-blocks (they decode garbage harmlessly —
        # same contract as padding lanes) and slice the outputs back.
        pad_lb = (-LB) % R
        win = jnp.pad(win, ((0, pad_lb), (0, 0), (0, 0), (0, 0)))
        out, bpos = decode_blocked(
            win, T, U=U, interpret=interpret, lane_major=lane_major,
            light=light, tables=tables, R=R, fast=fast)
        return out[:LB], bpos[:LB]

    # Affine-middle lookup structure (round 5, trained tree only): if the
    # max-length literals form one contiguous ascending run, the table
    # scan needs only the hot prefix + non-literal tail (8 takes vs 18 —
    # a take_along_axis costs ~6x a select, so the scan IS the kernel).
    mid = None
    if light and fast and tables is None:
        lens_np = np.asarray(HUFFMAN_LENGTHS, np.int64)
        n1 = int(((lens_np > 0) & (lens_np < MAXL)).sum())
        total = int((lens_np > 0).sum())
        if n1 <= 112 and n1 < total:
            base = int(packed[n1])
            o = 0
            while (n1 + o < total and int(packed[n1 + o]) == base + o
                   and base + o < 256):
                o += 1
            n2 = n1 + o
            if o > 0 and total - n2 <= 16 and (n2 >> 1) + 8 <= _TAB_PAD // 2:
                mid = (n1, n2, base - n1)

    if light:
        kern = functools.partial(
            _kernel_light, wwin=wwin, U=U, lane_major=lane_major, R=R,
            fast=fast, mid=mid,
        )
    else:
        assert tables is None, "runtime tables need the light kernel"
        kern = functools.partial(
            _kernel, wwin=wwin, U=U, bounds=bounds, kvals=kvals,
            lane_major=lane_major,
        )
    if lane_major:
        out_spec = pl.BlockSpec((R, 8, LANE, U), lambda lb, sb: (lb, 0, 0, sb),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((LB, 8, LANE, T), jnp.int32)
    else:
        out_spec = pl.BlockSpec((R, U, 8, LANE), lambda lb, sb: (lb, sb, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((LB, T, 8, LANE), jnp.int32)
    if light:
        # Two 15-bit entries per int32.  Table and canonical metadata are
        # PRE-BROADCAST across the (8, 128) lane grid and passed in VMEM
        # (~1.1 MiB total): every kernel use is then a plain vector load.
        # SMEM scalars here would cost a scalar->vector broadcast per use
        # site (~170/step, the round-2 kernel's dominant cost — see
        # _kernel_light).  Runtime (meta, tabp) rows from ops/adaptive keep
        # the one-executable-per-geometry property: the broadcast happens
        # outside the kernel, so any <=12-bit canonical tree still hits the
        # same compiled kernel.
        npairs = _TAB_PAD // 2
        if tables is None:
            p64 = packed.astype(np.int64)
            tab = (p64[0::2] | (p64[1::2] << 16)).astype(np.int32)
            meta_np = np.zeros(32, np.int32)
            meta_np[: MAXL + 1] = bounds
            meta_np[16 : 16 + MAXL + 1] = kvals
            meta3d = np.ascontiguousarray(np.broadcast_to(
                meta_np[:, None, None], (32, 8, LANE))).copy()
            # Rows 13/14: sublane-varying kval tiles for the fast kernel's
            # take_along_axis (sublane s = kvals[s+1] / kvals[s+9]).
            kv_pad = np.zeros(16, np.int32)
            kv_pad[: MAXL] = kvals[1:]
            meta3d[13] = np.broadcast_to(kv_pad[:8, None], (8, LANE))
            meta3d[14] = np.broadcast_to(kv_pad[8:16, None], (8, LANE))
            meta_arg = jnp.asarray(meta3d)
            if mid is not None:
                # Hot-prefix tiles + one non-literal-tail tile (the
                # affine middle needs no table).
                w1 = (mid[0] + 15) // 16
                nlw = mid[1] >> 1
                tab2 = np.concatenate(
                    [tab[: 8 * w1].reshape(w1, 8),
                     tab[nlw : nlw + 8].reshape(1, 8)], axis=0)
                tab_arg = jnp.asarray(np.ascontiguousarray(
                    np.broadcast_to(tab2[:, :, None], (w1 + 1, 8, LANE))))
            elif fast:
                # Tile layout for the sublane-gather lookup: tile g's
                # sublanes hold pair-words 8g..8g+7.
                tab_arg = jnp.asarray(np.ascontiguousarray(
                    np.broadcast_to(tab[:144].reshape(18, 8)[:, :, None],
                                    (18, 8, LANE))))
            else:
                tab_arg = jnp.asarray(np.ascontiguousarray(
                    np.broadcast_to(tab[:, None, None],
                                    (npairs, 8, LANE))))
        else:
            meta_in, tab_in = tables
            mv = meta_in.reshape(32)
            # kvals live at meta[17..17+MAXL); pad to 16 and split into the
            # two sublane-varying gather tiles (rows 13/14, as above).
            kv_pad = jnp.concatenate(
                [mv[17:17 + MAXL], jnp.zeros(16 - MAXL, jnp.int32)])
            meta_arg = jnp.concatenate([
                jnp.broadcast_to(mv[:13, None, None], (13, 8, LANE)),
                jnp.broadcast_to(kv_pad[:8, None], (8, LANE))[None],
                jnp.broadcast_to(kv_pad[8:, None], (8, LANE))[None],
                jnp.broadcast_to(mv[15:, None, None], (17, 8, LANE)),
            ], axis=0)
            if fast:
                tab_arg = jnp.broadcast_to(
                    tab_in.reshape(-1)[:144].reshape(18, 8, 1),
                    (18, 8, LANE))
            else:
                tab_arg = jnp.broadcast_to(
                    tab_in.reshape(npairs, 1, 1), (npairs, 8, LANE))
        if mid is not None:
            tab_rows = (mid[0] + 15) // 16 + 1
        else:
            tab_rows = 18 if fast else npairs
        in_specs = [
            pl.BlockSpec((R, wwin, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tab_rows, 8, LANE), lambda lb, sb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 8, LANE), lambda lb, sb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = (win, tab_arg, meta_arg)
        scratch = pltpu.VMEM((R, 8, 8, LANE), jnp.int32)
    else:
        in_specs = [
            pl.BlockSpec((1, wwin, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args = (win, jnp.asarray(packed.reshape(1, _TAB_PAD)))
        scratch = pltpu.VMEM((8, 8, LANE), jnp.int32)
    f = pl.pallas_call(
        kern,
        grid=(LB // R, SB),
        in_specs=in_specs,
        out_specs=[
            out_spec,
            pl.BlockSpec((R, 8, LANE), lambda lb, sb: (lb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            out_shape,
            jax.ShapeDtypeStruct((LB, 8, LANE), jnp.int32),
        ],
        scratch_shapes=[scratch],
        interpret=interpret,
        # R>1 carries R full chunk windows per grid cell (R=8 at S=2048 is a
        # ~27 MiB VMEM working set); without a declared budget XLA's 16 MiB
        # scoped-VMEM default rejects the compile (same failure first seen on
        # the pack kernel — see pallas_pack._vmem_params).  The budget is
        # sized from the actual R-dependent working set (the same blk_bytes
        # estimate that auto-selects R) plus the ~1.1 MiB broadcast tables
        # and 2x slack for Mosaic spills; FDN_DEC_VMEM overrides for probes.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get(
                "FDN_DEC_VMEM",
                min(120 << 20, max(32 << 20, 2 * R * blk_bytes + (4 << 20))),
            ))),
    )
    out, bpos = f(*args)
    return out, bpos


def adler_step_major(out_sm, B: int, C: int, S: int, lengths=None):
    """Per-stream Adler-32 straight from the kernel's step-major output.

    ``out_sm`` is i32[LB, T, 8, 128] — word w of lane (lb, s, l) at
    [lb, w, s, l].  The checksum needs only reductions over the T axis plus
    an ordered fold over each stream's C lanes (associative combine), so no
    transpose to byte order ever happens on device.

    Magnitude: the per-lane weighted sum is bounded by S*255*4*T = 255*S^2,
    which must stay below 2^31 -> S <= 2896.  Larger S splits the T axis.

    Returns uint32[B] checksums (full streams; ``lengths`` masks ragged
    tails when given — bytes past a stream's length must be zero, which the
    zero-filled windows of empty chunks guarantee).
    """
    import jax
    import jax.numpy as jnp

    from .adler32 import MOD

    i32 = jnp.int32
    u32 = jnp.uint32
    LB, T, _, _ = out_sm.shape
    assert 255 * S * S < (1 << 31), "split the T axis for S > 2896"
    w = out_sm
    b0 = w & 255
    b1 = (w >> 8) & 255
    b2 = (w >> 16) & 255
    b3 = (w >> 24) & 255
    sw = b0 + b1 + b2 + b3                      # [LB, T, 8, 128]
    jb = b1 + 2 * b2 + 3 * b3
    s_lane = jnp.sum(sw, axis=1)                # [LB, 8, 128]
    wt = (S - 4 * jnp.arange(T, dtype=i32))[None, :, None, None]
    w_lane = jnp.sum(wt * sw - jb, axis=1)      # < 255*S^2 < 2^31

    L = B * C
    s_k = (s_lane.reshape(-1)[:L] % MOD).astype(u32).reshape(B, C)
    w_k = (w_lane.reshape(-1)[:L] % MOD).astype(u32).reshape(B, C)

    if lengths is None:
        length = jnp.full((B,), C * S, i32)
    else:
        length = lengths.astype(i32)
    offs = (jnp.arange(C, dtype=i32) * S)[None, :]
    coeff = ((length[:, None] - offs - S) % MOD).astype(u32)
    contrib = (coeff * s_k) % MOD               # 65520^2 < 2^32
    a = (1 + jnp.sum(s_k, axis=1)) % MOD
    b = (
        length.astype(u32) % MOD
        + jnp.sum((contrib + w_k) % MOD, axis=1)
    ) % MOD
    return (b << 16) | a


def corner_turn(x, interpret: bool | None = None):
    """[LB, T, 8, 128] -> [LB, 8, 128, T] via per-block in-VMEM transposes.

    XLA's own lowering of this transpose runs at well under HBM bandwidth
    (bench/probe_pallas2.py P4); one (128, 8, 128)-block Mosaic relayout per
    grid cell keeps the shuffle on-chip.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    LB, T, _, _ = x.shape
    U = 128
    assert T % U == 0

    def kernel(x_ref, out_ref):
        out_ref[0] = jnp.transpose(x_ref[0], (1, 2, 0))

    f = pl.pallas_call(
        kernel,
        grid=(LB, T // U),
        in_specs=[pl.BlockSpec((1, U, 8, LANE), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, LANE, U), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LB, 8, LANE, T), jnp.int32),
        interpret=interpret,
    )
    return f(x)


def corner_turn_rev(x, interpret: bool | None = None):
    """[LB, 8, 128, T] -> [LB, T, 8, 128] — the inverse of corner_turn.

    Same rationale: XLA's lowering of this relayout runs well under HBM
    bandwidth (measured 2.8 ms for the 16 MiB assign-kernel input prep,
    bench/probe_encstages.py s0), while a per-block in-VMEM transpose
    streams it.  Used by pallas_assign.blocked_input to produce the
    word-major kernel input from lane-major byte rows.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    LB, _, _, T = x.shape
    U = 128
    assert T % U == 0

    def kernel(x_ref, out_ref):
        out_ref[0] = jnp.transpose(x_ref[0], (2, 0, 1))

    f = pl.pallas_call(
        kernel,
        grid=(LB, T // U),
        in_specs=[pl.BlockSpec((1, 8, LANE, U), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, U, 8, LANE), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LB, T, 8, LANE), jnp.int32),
        interpret=interpret,
    )
    return f(x)
