"""TPU LZ77 match finding + device dynamic-block encode (no pointer chasing).

The reference finds matches by chasing per-bucket linked lists
(src/compress/matchfinder/hashchain.rs:69-96) — a serial, latency-bound
design.  The TPU reformulation (SURVEY section 7, hard part 3) hashes EVERY
position at once and turns "previous occurrences of my 4-byte prefix" into a
sorted-neighborhood problem:

 1. key[i] = hash12(bytes[i..i+4]) << 20 | i  — one int32 per position;
    jnp.sort along the stream puts equal-hash positions adjacent, position-
    ascending.  Candidate j for position i = the sorted predecessor(s).
 2. Verified, capped extension: unaligned 4-byte words W[i] compare for
    both sides (gathers), lengths accumulate while all previous words
    matched (cap _EXT bytes).
 3. Greedy tiling exactly like a serial greedy parser would — via pointer
    doubling on next[i] = i + max(len[i], 1): the visited set from position
    0 computes in log2(N) scatter/gather rounds, no sequential walk.
 4. Adjacent accepted matches with the same distance MERGE (a zero run is
    a chain of dist-1 matches; periodic data a chain of dist-p matches), so
    the capped extension still yields full-length (<= 258) backrefs.
 5. Symbols pack with the ultrafast packer's machinery: per-byte token
    assignment, prefix-sum bit positions, pair-combined segment-sum scatter.
    Backrefs spread over four 1-byte slots (len code / len extra / dist
    code / dist extra, each <= 15+13 bits) so pair packing stays within u32.

Huffman trees are built on the host from device-computed frequencies (a
[B, 316] readback); codes upload as small tables.  One dynamic block per
stream (DEFLATE does not bound block symbol counts).
"""

from __future__ import annotations

import numpy as np

from ..tables import (
    DIST_SYM_TO_DIST_BASE,
    DIST_SYM_TO_DIST_EXTRA,
    DISTANCE_TO_SYM,
    LENGTH_TO_LEN_EXTRA,
    LENGTH_TO_SYMBOL,
)

_EXT = 32          # capped per-candidate extension (merging recovers runs)
_HBITS = 12        # sort-key hash bits; leaves 20 bits of position (N < 1M)
_WINDOW = 32768


def _hash12(w32):
    import jax.numpy as jnp

    h = (w32.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)) >> jnp.uint32(20)
    return h.astype(jnp.int32)


def find_matches(data, lengths, depth: int = 2, min_match: int = 4,
                 hash_bytes: int = 4, cost_filter: bool = True,
                 backext: bool = True, lit_bits8=None):
    """Per-position verified match (length, distance), capped at _EXT bytes.

    data: u8[B, N] (N < 2^20); lengths: i32[B].
    Returns (mlen i32[B, N], mdist i32[B, N]) — zero length = no match.
    ``hash_bytes=8`` groups on an 8-byte prefix (fewer collisions; finds the
    long matches a 4-byte bucket's nearest predecessors miss).
    ``lit_bits8``: i32[B], estimated literal cost in EIGHTHS of a bit
    (stream order-0 entropy; see stream_lit_bits8).  Candidate selection
    maximizes the bit-saving score lit_bits8*len - 8*dist_extra instead
    of raw length — the flat 5-bits/byte estimate overvalued far matches
    on low-entropy corpora (measured on IDAT: depth 4 ENLARGED output by
    0.24% vs depth 2 under length-max selection; score-max restores
    depth monotonicity).  None falls back to 5 bits/byte.
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    B, N = data.shape
    # Positions pack into the key's low 20 bits; N == 2^20 still fits
    # (max index 2^20 - 1).  Sentinel keys for padding lanes can collide
    # with hash-2047 keys near the top of the range, but candidates are
    # only HINTS — the byte-verified extension rejects false ones.
    assert N <= (1 << 20)
    d = data.astype(i32)
    if lit_bits8 is None:
        lit8 = jnp.full((B, 1), 40, i32)  # 5 bits/byte
    else:
        lit8 = lit_bits8.astype(i32).reshape(B, 1)

    # Unaligned 4-byte little-endian words at every byte offset.
    def sh(k):
        return jnp.concatenate([d[:, k:], jnp.zeros((B, k), i32)], axis=1)

    W = d | (sh(1) << 8) | (sh(2) << 16) | (sh(3) << 24)

    idx = jax.lax.broadcasted_iota(i32, (B, N), 1)
    valid = idx + min_match <= lengths[:, None]
    if hash_bytes == 8:
        W2 = jnp.concatenate([W[:, 4:], jnp.zeros((B, 4), i32)], axis=1)
        hsrc = W ^ (W2 * jnp.int32(0x01000193))
    else:
        hsrc = W
    key = jnp.where(
        valid,
        (_hash12(hsrc) << 20) | idx,
        (jnp.int32(1) << 31) - 1 - (N - idx),
    )
    s = jnp.sort(key, axis=1)
    spos = s & ((1 << 20) - 1)
    shash = s >> 20

    best_len = jnp.zeros((B, N), i32)
    best_dist = jnp.zeros((B, N), i32)
    best_score = jnp.zeros((B, N), i32)
    for k in range(1, depth + 1):
        cand = jnp.concatenate(
            [jnp.zeros((B, k), i32), spos[:, :-k]], axis=1
        )
        same = jnp.concatenate(
            [jnp.zeros((B, k), bool), shash[:, k:] == shash[:, :-k]], axis=1
        )
        pos = spos
        dist = pos - cand
        ok = same & (dist > 0) & (dist <= _WINDOW)

        # verified extension: words at pos+4j vs cand+4j
        ln = jnp.zeros((B, N), i32)
        alive = ok
        for j in range(0, _EXT, 4):
            a = jnp.take_along_axis(W, jnp.minimum(pos + j, N - 1), axis=1)
            b = jnp.take_along_axis(W, jnp.minimum(cand + j, N - 1), axis=1)
            x = a ^ b
            tzb = jnp.where(
                x == 0, 4,
                jnp.where(x & 0xFF, 0,
                          jnp.where(x & 0xFF00, 1,
                                    jnp.where(x & 0xFF0000, 2, 3))),
            )
            ln = ln + jnp.where(alive, tzb, 0)
            alive = alive & (x == 0)
        ln = jnp.minimum(ln, lengths[:, None] - pos)  # clamp at stream tail
        ln = jnp.where(ok & (ln >= min_match), ln, 0)

        # Profitability filter (device twin of the block writer's demotion
        # pass): a short match at a far distance costs more bits than its
        # literals.  Estimated match cost 13 + dist-extra bits vs the
        # stream's literal entropy.
        dext = jnp.asarray(DIST_SYM_TO_DIST_EXTRA.astype(np.int32))[
            jnp.asarray(DISTANCE_TO_SYM.astype(np.int32))[
                jnp.clip(dist - 1, 0, _WINDOW - 1)
            ]
        ]
        if cost_filter:
            ln = jnp.where((13 + dext) * 8 <= lit8 * ln, ln, 0)

        # Backward extension (the reference's fizzle,
        # src/compress/matchfinder/mod.rs:51-110 extends every match back
        # to the anchor): count matching bytes BEFORE (pos, cand) from the
        # top of the preceding 4-byte words, up to 8.  The extended match
        # is a second candidate at position pos - b with length ln + b —
        # on match-dense text this recovers the host finders' fizzle wins
        # (measured: device depth-64 trailed host L2 by ~1% without it).
        def back4(off):
            a = jnp.take_along_axis(W, jnp.maximum(pos - off, 0), axis=1)
            c = jnp.take_along_axis(W, jnp.maximum(cand - off, 0), axis=1)
            x = a ^ c
            return jnp.where(
                x == 0, 4,
                jnp.where(x & jnp.int32(-16777216), 0,  # top byte 0xFF000000
                          jnp.where(x & 0xFF0000, 1,
                                    jnp.where(x & 0xFF00, 2, 3))))

        if backext:
            b1 = jnp.where((pos >= 4) & (cand >= 4), back4(4), 0)
            b2 = jnp.where((b1 == 4) & (pos >= 8) & (cand >= 8),
                           back4(8), 0)
            bext = jnp.where(ln > 0, b1 + b2, 0)
        else:
            bext = jnp.zeros_like(ln)

        # Scatter back to position order, keeping the best-SCORING
        # candidate: pack (score << 21 | len << 15 | WINDOW - dist) so
        # max() prefers the biggest estimated bit saving (whole-bit
        # literal cost, floor of the stream entropy — conservative), then
        # longer, then nearer.  score < 2^10, len <= 48 < 2^6,
        # WINDOW - dist < 2^15: 31 bits, fits int32.
        rows = jax.lax.broadcasted_iota(i32, (B, N), 0)
        litb = jnp.clip(lit8 >> 3, 2, 12)

        def packed_for(length):
            sc = jnp.clip(litb * length - dext, 1, (1 << 10) - 1)
            return (sc << 21) | (length << 15) | (_WINDOW - dist)

        flat = (rows * N + pos).reshape(-1)
        packed = jnp.where(ln > 0, packed_for(ln), 0)
        flat_b = (rows * N + pos - bext).reshape(-1)
        packed_b = jnp.where(
            (ln > 0) & (bext > 0), packed_for(ln + bext), 0)
        pmax = jnp.zeros(B * N, i32).at[flat].max(
            packed.reshape(-1)
        ).at[flat_b].max(
            packed_b.reshape(-1)
        ).reshape(B, N)
        cand_len = (pmax >> 15) & 0x3F
        cand_dist = _WINDOW - (pmax & 0x7FFF)
        cand_score = pmax >> 21
        better = cand_score > best_score
        best_len = jnp.where(better, cand_len, best_len)
        best_dist = jnp.where(better, cand_dist, best_dist)
        best_score = jnp.where(better, cand_score, best_score)

    return best_len, best_dist


def stream_lit_bits8(data, lengths):
    """i32[B]: per-stream order-0 byte entropy in EIGHTHS of a bit,
    clipped to [16, 96] (2..12 bits/byte) — the literal-cost estimate for
    match scoring.  A flat estimate misprices matches on low-entropy
    corpora (IDAT literals cost ~2.6 bits, not 5); the reference prices
    with real code lengths but only in its demotion pass
    (src/compress/bitstream.rs), the search itself being nearest-first."""
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    B, N = data.shape
    rows = jax.lax.broadcasted_iota(i32, (B, N), 0)
    idx = jax.lax.broadcasted_iota(i32, (B, N), 1)
    in_s = idx < lengths[:, None]
    flat = jnp.where(in_s, rows * 256 + data.astype(i32), B * 256)
    hist = jnp.zeros(B * 256 + 1, i32).at[flat.reshape(-1)].add(1)[
        : B * 256].reshape(B, 256)
    n = jnp.maximum(lengths.astype(jnp.float32), 1.0)
    pf = hist.astype(jnp.float32) / n[:, None]
    H = -jnp.sum(
        jnp.where(hist > 0, pf * jnp.log2(jnp.maximum(pf, 1e-12)), 0.0),
        axis=1)
    return jnp.clip((H * 8.0 + 0.5).astype(i32), 16, 96)


def extend_winners(data, mlen, mdist, lengths, limit: int = 260):
    """Fully extend each position's chosen match up to ``limit`` bytes.

    The depth loop compares candidates under the cheap _EXT-byte cap (the
    hash-chain finders' quick-reject); the WINNER then extends once, like
    the reference's per-match extension (matchfinder/mod.rs) — measured on
    IDAT this collapses ~1700 fragmented 51-byte-average matches into
    ~700 host-sized ones and closes a 2.6% size gap.  Overlapping forward
    copies (dist < 4) extend correctly: the word compare at pos+j vs
    cand+j is exactly the run-continuation condition.
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    B, N = mlen.shape
    d = data.astype(i32)

    def sh(k):
        return jnp.concatenate([d[:, k:], jnp.zeros((B, k), i32)], axis=1)

    W = d | (sh(1) << 8) | (sh(2) << 16) | (sh(3) << 24)
    idx = jax.lax.broadcasted_iota(i32, (B, N), 1)
    pos = idx
    cand = idx - mdist
    # Capped matches may continue past the compare window.  Back-extended
    # winners (find_matches' fizzle) arrive with mlen in [_EXT, _EXT + 8],
    # so the comparison must resume at the ACTUAL current length, not the
    # static _EXT offset — the loop gathers at data-dependent pos + ln.
    alive = mlen >= _EXT
    ln = mlen
    for _ in range((limit - _EXT) // 4 + 1):
        a = jnp.take_along_axis(
            W, jnp.minimum(pos + ln, N - 1), axis=1)
        b = jnp.take_along_axis(
            W, jnp.clip(cand + ln, 0, N - 1), axis=1
        )
        x = a ^ b
        tzb = jnp.where(
            x == 0, 4,
            jnp.where(x & 0xFF, 0,
                      jnp.where(x & 0xFF00, 1,
                                jnp.where(x & 0xFF0000, 2, 3))),
        )
        ln = ln + jnp.where(alive, tzb, 0)
        alive = alive & (x == 0) & (ln < limit)
    ln = jnp.minimum(jnp.minimum(ln, limit), lengths[:, None] - pos)
    return jnp.where(mlen > 0, ln, 0), mdist


def greedy_tile(mlen, mdist, lengths, min_match: int = 4):
    """Greedy non-overlapping symbol tiling via pointer doubling.

    Returns (sym_start bool[B, N], is_match bool[B, N]) — exactly the set a
    serial greedy walk from position 0 would accept.
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    B, N = mlen.shape
    idx = jax.lax.broadcasted_iota(i32, (B, N), 1)
    use = mlen >= min_match
    nxt = jnp.where(use, idx + mlen, idx + 1)
    nxt = jnp.minimum(nxt, N)

    visited = (idx == 0)
    jump = jnp.concatenate([nxt, jnp.full((B, 1), N, i32)], axis=1)  # [B,N+1]
    rows = jax.lax.broadcasted_iota(i32, (B, N + 1), 0)
    steps = int(np.ceil(np.log2(max(N, 2))))
    vis = jnp.concatenate([visited, jnp.zeros((B, 1), bool)], axis=1)
    for _ in range(steps):
        # propagate: every visited position marks its 2^k-jump target, then
        # the jump table squares
        flat = (rows * (N + 1) + jump).reshape(-1)
        vis = vis | jnp.zeros(B * (N + 1), bool).at[flat].max(
            vis.reshape(-1)
        ).reshape(B, N + 1)
        jump = jnp.take_along_axis(jump, jump, axis=1)
    sym_start = vis[:, :N] & (idx < lengths[:, None])
    is_match = sym_start & use
    return sym_start, is_match


def merge_chains(sym_start, is_match, mdist, lengths):
    """Merge adjacent same-distance accepted matches into long segments.

    Returns (seg_start bool, seg_len i32, seg_dist i32) per byte — seg_len
    only meaningful at segment starts.
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    B, N = sym_start.shape
    idx = jax.lax.broadcasted_iota(i32, (B, N), 1)
    rows = jax.lax.broadcasted_iota(i32, (B, N), 0)

    # incoming[i] = distance of an accepted match ENDING exactly at i
    # (accepted matches tile, so at most one). Scatter end -> dist.
    is_m = is_match
    # symbol length at start: for match = run to next symbol start
    nxt_sym = jnp.where(sym_start, idx, N)
    # next symbol start AFTER i: reversed cummin of starts > i
    rev = nxt_sym[:, ::-1]
    nsa = jax.lax.cummin(
        jnp.concatenate([jnp.full((B, 1), N, i32), rev[:, :-1]], axis=1),
        axis=1,
    )[:, ::-1]  # next start strictly after i
    sym_len = jnp.where(sym_start, jnp.minimum(nsa, lengths[:, None]) - idx, 0)

    end = jnp.minimum(idx + sym_len, N)
    flat = (rows * (N + 1) + jnp.where(is_m, end, N)).reshape(-1)
    incoming = jnp.zeros(B * (N + 1), i32).at[flat].max(
        jnp.where(is_m, mdist, 0).reshape(-1)
    ).reshape(B, N + 1)[:, :N]

    continuation = is_m & (incoming == mdist) & (mdist > 0)
    seg_start = is_m & ~continuation

    # segment length: next boundary (symbol start that is not a
    # continuation) after the segment start
    bound = sym_start & ~continuation
    bpos = jnp.where(bound, idx, N)
    brev = bpos[:, ::-1]
    nba = jax.lax.cummin(
        jnp.concatenate([jnp.full((B, 1), N, i32), brev[:, :-1]], axis=1),
        axis=1,
    )[:, ::-1]
    seg_len = jnp.where(
        seg_start, jnp.minimum(nba, lengths[:, None]) - idx, 0
    )
    return seg_start, seg_len, jnp.where(seg_start, mdist, 0)


def _segments(data, lengths, depth: int, min_match: int,
              backext: bool = True):
    """Device: matches -> greedy tiling -> merged segments.

    Two hash passes: 4-byte buckets (short/near matches, cost-filtered) and
    8-byte buckets (long matches the 4-byte buckets' nearest predecessors
    miss); the longer verified match wins per position."""
    import jax.numpy as jnp

    lit8 = stream_lit_bits8(data, lengths)
    mlen, mdist = find_matches(data, lengths, depth=depth,
                               min_match=min_match, backext=backext,
                               lit_bits8=lit8)
    ml8, md8 = find_matches(data, lengths, depth=max(depth // 2, 1),
                            min_match=max(min_match, 8), hash_bytes=8,
                            cost_filter=False, backext=backext,
                            lit_bits8=lit8)

    # Cost-aware pass combination: a longer-but-farther match only wins if
    # its estimated net bits (5 bits/byte saved minus the distance extra
    # cost) beat the near candidate's — the host finders' nearest-first
    # bias expressed as a score (measured: preferring raw length pulls avg
    # match distance from ~250 to ~1700 on IDAT and costs ~2% size).
    dext_t = jnp.asarray(DIST_SYM_TO_DIST_EXTRA.astype(np.int32))
    dsym_t = jnp.asarray(DISTANCE_TO_SYM.astype(np.int32))

    litb = (lit8 >> 3)[:, None]

    def score(ln, d):
        dext = dext_t[dsym_t[jnp.clip(d - 1, 0, _WINDOW - 1)]]
        return jnp.where(ln > 0, litb * ln - dext, -(1 << 20))

    better = score(ml8, md8) > score(mlen, mdist)
    mlen = jnp.where(better, ml8, mlen)
    mdist = jnp.where(better, md8, mdist)
    mlen, mdist = extend_winners(data, mlen, mdist, lengths)

    # One-step deferral (the host greedy's m2-overlap rule,
    # parse/greedy.rs): a match is dropped when the NEXT position starts a
    # strictly longer one — the tiling then emits one literal and takes
    # the longer match instead of blocking it.
    nxt_len = jnp.concatenate(
        [mlen[:, 1:], jnp.zeros((mlen.shape[0], 1), mlen.dtype)], axis=1
    )
    mlen = jnp.where(nxt_len > mlen, 0, mlen)

    sym_start, is_match = greedy_tile(mlen, mdist, lengths,
                                      min_match=min_match)
    return merge_chains(sym_start, is_match, mdist, lengths)


def _roles_and_freqs(data, lengths, segments, min_match: int):
    """Per-byte token roles + symbol frequencies from merged segments.

    Returns (roles, freqs) where roles = (lit_mask, sub_start, sub_len,
    sub_dist) dense [B, N] arrays and freqs = (litlen u32[B, 286],
    dist u32[B, 30]).
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    B, N = data.shape
    idx = jax.lax.broadcasted_iota(i32, (B, N), 1)
    in_stream = idx < lengths[:, None]
    seg_start, seg_len, seg_dist = segments

    # Propagate segment info to every covered byte.
    sstart = jax.lax.cummax(jnp.where(seg_start, idx, -1), axis=1)
    send = jax.lax.cummax(
        jnp.where(seg_start, idx + seg_len, 0), axis=1
    )
    covered = (sstart >= 0) & (idx < send)
    s_clamp = jnp.maximum(sstart, 0)
    d = jnp.take_along_axis(seg_dist, s_clamp, axis=1)
    Lseg = jnp.take_along_axis(seg_len, s_clamp, axis=1)

    q = idx - s_clamp
    nfull = Lseg // 258
    tail = Lseg - 258 * nfull
    k = q // 258
    r = q - 258 * k
    tail_ok = tail >= min_match
    in_full = covered & (k < nfull)
    in_tail = covered & (k == nfull) & tail_ok & (r < tail)
    tail_lit = covered & ~in_full & ~in_tail  # short tail -> literals

    sub_start = (in_full | in_tail) & (r == 0)
    sub_len = jnp.where(sub_start, jnp.where(in_full, 258, tail), 0)
    lit_mask = in_stream & (~covered | tail_lit)

    # Frequencies.
    d8 = data.astype(i32)
    rows = jax.lax.broadcasted_iota(i32, (B, N), 0)
    lit_flat = jnp.where(lit_mask, rows * 286 + d8, B * 286)
    lsym = jnp.asarray(LENGTH_TO_SYMBOL.astype(np.int32))[
        jnp.clip(sub_len - 3, 0, 255)
    ]
    len_flat = jnp.where(sub_start, rows * 286 + lsym, B * 286)
    ones = jnp.ones((B, N), i32)
    freq_l = (
        jnp.zeros(B * 286 + 1, i32)
        .at[lit_flat.reshape(-1)].add(ones.reshape(-1))
        .at[len_flat.reshape(-1)].add(ones.reshape(-1))
    )[: B * 286].reshape(B, 286)
    freq_l = freq_l.at[:, 256].add(1)  # EOB

    dsym = jnp.asarray(DISTANCE_TO_SYM.astype(np.int32))[
        jnp.clip(d - 1, 0, _WINDOW - 1)
    ]
    dist_flat = jnp.where(sub_start, rows * 30 + dsym, B * 30)
    freq_d = (
        jnp.zeros(B * 30 + 1, i32)
        .at[dist_flat.reshape(-1)].add(ones.reshape(-1))
    )[: B * 30].reshape(B, 30)

    roles = (lit_mask, sub_start, sub_len, jnp.where(sub_start, d, 0))
    return roles, (freq_l, freq_d)


def _stage1(data, lengths, depth: int, min_match: int,
            backext: bool = True):
    """Segments + first-pass roles/freqs + whole-stream byte histogram."""
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    B, N = data.shape
    segments = _segments(data, lengths, depth, min_match,
                         backext=backext)
    roles, freqs = _roles_and_freqs(data, lengths, segments, min_match)

    idx = jax.lax.broadcasted_iota(i32, (B, N), 1)
    rows = jax.lax.broadcasted_iota(i32, (B, N), 0)
    in_stream = idx < lengths[:, None]
    flat = jnp.where(in_stream, rows * 256 + data.astype(i32), B * 256)
    hist = (
        jnp.zeros(B * 256 + 1, i32)
        .at[flat.reshape(-1)].add(jnp.ones((B, N), i32).reshape(-1))
    )[: B * 256].reshape(B, 256)
    return segments, roles, freqs, hist


def _demote_segments(data, lengths, segments, shadow_cost, lit_lens,
                     dist_lens, min_match: int):
    """Device stage 1.5: drop merged segments whose literal encoding is
    cheaper (twin of models/bitstream._demote_unprofitable, evaluated with
    the host-provided shadow literal costs and first-pass code lengths).
    Returns the demoted segments plus recomputed roles/freqs.
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    B, N = data.shape
    seg_start, seg_len, seg_dist = segments
    idx = jax.lax.broadcasted_iota(i32, (B, N), 1)
    in_stream = idx < lengths[:, None]

    c = jnp.where(
        in_stream, jnp.take_along_axis(shadow_cost, data.astype(i32), 1), 0
    )
    prefix = jnp.cumsum(c, axis=1)  # inclusive

    L = seg_len
    d = seg_dist
    nfull = L // 258
    tail = L - 258 * nfull
    tail_ok = tail >= min_match
    cov_end = idx + 258 * nfull + jnp.where(tail_ok, tail, 0)

    # literal bits over the sub-run-covered region [s, cov_end)
    pe = jnp.take_along_axis(prefix, jnp.clip(cov_end - 1, 0, N - 1), 1)
    ps = jnp.take_along_axis(prefix, jnp.clip(idx - 1, 0, N - 1), 1)
    ps = jnp.where(idx == 0, 0, ps)
    lit_bits = pe - ps

    lsym_t = jnp.asarray(LENGTH_TO_SYMBOL.astype(np.int32))
    lext_t = jnp.asarray(LENGTH_TO_LEN_EXTRA.astype(np.int32))
    dsym_t = jnp.asarray(DISTANCE_TO_SYM.astype(np.int32))
    dext_t = jnp.asarray(DIST_SYM_TO_DIST_EXTRA.astype(np.int32))

    l258 = lsym_t[255]
    bits258 = jnp.take_along_axis(
        lit_lens, jnp.full((B, N), l258, i32), 1
    )
    lsT = lsym_t[jnp.clip(tail - 3, 0, 255)]
    bitsT = jnp.take_along_axis(lit_lens, jnp.clip(lsT, 0, 285), 1) + \
        lext_t[jnp.clip(tail - 3, 0, 255)]
    ds = dsym_t[jnp.clip(d - 1, 0, _WINDOW - 1)]
    bitsD = jnp.take_along_axis(dist_lens, jnp.clip(ds, 0, 29), 1) + \
        dext_t[jnp.clip(ds, 0, 29)]

    match_bits = nfull * (bits258 + bitsD) + jnp.where(
        tail_ok, bitsT + bitsD, 0
    )
    demote = seg_start & (lit_bits < match_bits + 3)

    keep = ~demote
    segments2 = (
        seg_start & keep,
        jnp.where(keep, seg_len, 0),
        jnp.where(keep, seg_dist, 0),
    )
    roles, freqs = _roles_and_freqs(data, lengths, segments2, min_match)
    return segments2, roles, freqs


def _pack_symbols(data, lengths, roles, lit_codes, lit_lens, dist_codes,
                  dist_lens, header_bits, header_words):
    """Device stage 2: per-byte tokens -> bit positions -> word scatter.

    lit_codes/lens: i32[B, 286]; dist_codes/lens: i32[B, 30];
    header_bits: i32[B] (symbols start there); header_words: i32[B, HW]
    (host-assembled zlib magic + dynamic header bit prefix).
    Returns (words u32[B, W], total_bits i32[B]).
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    u32 = jnp.uint32
    B, N = data.shape
    lit_mask, sub_start, sub_len, sub_dist = roles
    idx = jax.lax.broadcasted_iota(i32, (B, N), 1)
    d8 = data.astype(i32)

    lsym_t = jnp.asarray(LENGTH_TO_SYMBOL.astype(np.int32))
    lext_t = jnp.asarray(LENGTH_TO_LEN_EXTRA.astype(np.int32))
    dsym_t = jnp.asarray(DISTANCE_TO_SYM.astype(np.int32))
    dbase_t = jnp.asarray(DIST_SYM_TO_DIST_BASE.astype(np.int32))
    dext_t = jnp.asarray(DIST_SYM_TO_DIST_EXTRA.astype(np.int32))

    # Shift role info to the 4 slots of each sub-run.
    def shifted(a, k):
        pad = jnp.zeros((B, k), a.dtype)
        return jnp.concatenate([pad, a[:, : N - k]], axis=1)

    v = jnp.zeros((B, N), i32)
    nb = jnp.zeros((B, N), i32)

    # literal slots
    lv = jnp.take_along_axis(lit_codes, d8, axis=1)
    ln = jnp.take_along_axis(lit_lens, d8, axis=1)
    v = jnp.where(lit_mask, lv, v)
    nb = jnp.where(lit_mask, ln, nb)

    # slot 0: length code
    LL = sub_len
    ls = lsym_t[jnp.clip(LL - 3, 0, 255)]
    lcode = jnp.take_along_axis(lit_codes, jnp.clip(ls, 0, 285), axis=1)
    llen = jnp.take_along_axis(lit_lens, jnp.clip(ls, 0, 285), axis=1)
    v = jnp.where(sub_start, lcode, v)
    nb = jnp.where(sub_start, llen, nb)

    # slot 1: length extra bits
    s1 = shifted(sub_start, 1)
    LL1 = shifted(LL, 1)
    lext = lext_t[jnp.clip(LL1 - 3, 0, 255)]
    v = jnp.where(s1, (LL1 - 3) & ((1 << lext) - 1), v)
    nb = jnp.where(s1, lext, nb)

    # slot 2: dist code
    s2 = shifted(sub_start, 2)
    d2 = shifted(sub_dist, 2)
    ds = dsym_t[jnp.clip(d2 - 1, 0, _WINDOW - 1)]
    dcode = jnp.take_along_axis(dist_codes, jnp.clip(ds, 0, 29), axis=1)
    dlen = jnp.take_along_axis(dist_lens, jnp.clip(ds, 0, 29), axis=1)
    v = jnp.where(s2, dcode, v)
    nb = jnp.where(s2, dlen, nb)

    # slot 3: dist extra bits
    s3 = shifted(sub_start, 3)
    d3 = shifted(sub_dist, 3)
    ds3 = dsym_t[jnp.clip(d3 - 1, 0, _WINDOW - 1)]
    dext = dext_t[jnp.clip(ds3, 0, 29)]
    dbase = dbase_t[jnp.clip(ds3, 0, 29)]
    v = jnp.where(s3, d3 - dbase, v)
    nb = jnp.where(s3, dext, nb)

    nb = jnp.where(idx < lengths[:, None], nb, 0)
    v = jnp.where(nb > 0, v, 0)

    # ---- pack: cumsum + pair-combined scatter (ultrafast packer shape) ----
    cum = jnp.cumsum(nb, axis=1)
    eof_pos = header_bits + cum[:, -1]
    ecode = jnp.take_along_axis(lit_codes, jnp.full((B, 1), 256, i32), 1)[:, 0]
    elen = jnp.take_along_axis(lit_lens, jnp.full((B, 1), 256, i32), 1)[:, 0]
    total_bits = ((eof_pos + elen + 7) // 8) * 8

    v0 = v[:, 0::2].astype(u32)
    v1 = v[:, 1::2].astype(u32)
    n0 = nb[:, 0::2]
    n1 = nb[:, 1::2]
    vp = (v0 | (v1 << n0.astype(u32))).astype(u32)
    npair = n0 + n1
    positions = header_bits[:, None] + cum[:, 1::2] - npair

    HW = header_words.shape[1]
    W = max((N * 16 + 600) // 32 + 4, HW + 2)
    wi = positions >> 5
    sh = (positions & 31).astype(u32)
    lo = (vp << sh).astype(u32)
    hi = ((vp >> 1) >> (31 - sh).astype(u32)).astype(u32)
    valid = npair > 0
    rows2 = jax.lax.broadcasted_iota(i32, (B, N // 2), 0)
    flat_lo = jnp.where(valid, rows2 * W + wi, B * W)
    flat_hi = jnp.where(valid, rows2 * W + wi + 1, B * W)
    words = jax.ops.segment_sum(
        jnp.where(valid, lo.astype(i32), 0).reshape(-1),
        flat_lo.reshape(-1), num_segments=B * W + 1,
    )
    words = words + jax.ops.segment_sum(
        jnp.where(valid, hi.astype(i32), 0).reshape(-1),
        flat_hi.reshape(-1), num_segments=B * W + 1,
    )
    words = words[: B * W].reshape(B, W).astype(u32)

    words = words.at[:, :HW].add(header_words.astype(u32))

    eof_wi = eof_pos >> 5
    eof_sh = (eof_pos & 31).astype(u32)
    ec = ecode.astype(u32)
    rows1 = jnp.arange(B)
    words = words.at[rows1, eof_wi].add((ec << eof_sh).astype(u32))
    words = words.at[rows1, eof_wi + 1].add(
        ((ec >> 1) >> (31 - eof_sh).astype(u32)).astype(u32)
    )
    return words, total_bits.astype(i32)


def _host_header(freq_l: np.ndarray, freq_d: np.ndarray):
    """Build one stream's dynamic-block header + code tables on the host.

    Returns (header_bits, header_words u32[], lit_lens, lit_codes,
    dist_lens, dist_codes).  Header = zlib magic + BFINAL=1/BTYPE=10 +
    HLIT/HDIST/HCLEN + CL-coded lengths WITH the RFC 1951 16/17/18
    run codes.  (The reference skips the run codes,
    src/compress/bitstream.rs:133-141; using them saves ~10-19 bytes per
    stream, which is what lets the single-block device encoder beat the
    reference's 16k-symbol adaptive blocks on every corpus —
    bench/sizes_device.py.)
    """
    from ..models.bitstream import build_huffman_tree
    from ..ops.bitio import BitWriter
    from ..tables import CLCL_ORDER

    lengths, codes, _ = build_huffman_tree(freq_l.astype(np.int64), 15)
    dist_lengths, dist_codes, _ = build_huffman_tree(
        freq_d.astype(np.int64), 15
    )
    num_litlen = 286
    while num_litlen > 257 and lengths[num_litlen - 1] == 0:
        num_litlen -= 1
    num_dist = 30
    while num_dist > 1 and dist_lengths[num_dist - 1] == 0:
        num_dist -= 1

    seq = np.concatenate([lengths[:num_litlen], dist_lengths[:num_dist]])
    toks = []  # (cl_symbol, extra_val, extra_bits)
    i = 0
    while i < len(seq):
        v = int(seq[i])
        j = i + 1
        while j < len(seq) and int(seq[j]) == v:
            j += 1
        run = j - i
        if v == 0:
            while run >= 11:
                r = min(run, 138)
                toks.append((18, r - 11, 7))
                run -= r
            if run >= 3:
                toks.append((17, run - 3, 3))
                run = 0
            toks.extend([(0, 0, 0)] * run)
        else:
            toks.append((v, 0, 0))
            run -= 1
            while run >= 3:
                r = min(run, 6)
                toks.append((16, r - 3, 2))
                run -= r
            toks.extend([(v, 0, 0)] * run)
        i = j

    cl_freq = np.bincount([t[0] for t in toks], minlength=19)[:19]
    cl_lengths, cl_codes, _ = build_huffman_tree(cl_freq, 7)
    num_cl = 19
    while num_cl > 4 and cl_lengths[CLCL_ORDER[num_cl - 1]] == 0:
        num_cl -= 1

    sink = bytearray()
    w = BitWriter(sink)
    w.write_bits(0x9C78, 16)  # zlib magic
    w.write_bits(0b101, 3)    # BFINAL=1, BTYPE=dynamic
    w.write_bits(num_litlen - 257, 5)
    w.write_bits(num_dist - 1, 5)
    w.write_bits(num_cl - 4, 4)
    for j in range(num_cl):
        w.write_bits(int(cl_lengths[CLCL_ORDER[j]]), 3)
    for sym, ev, eb in toks:
        w.write_bits(int(cl_codes[sym]), int(cl_lengths[sym]))
        if eb:
            w.write_bits(ev, eb)
    hbits = w.bit_position
    w.flush()
    raw = bytes(sink) + bytes((-len(sink)) % 4)
    hwords = np.frombuffer(raw, "<u4")
    return hbits, hwords, lengths, codes, dist_lengths, dist_codes


# Device level map (VERDICT r4 #7): search effort per general level,
# mirroring the reference's ladder (/root/reference/src/compress/mod.rs:
# 75-88 — 1 = single-probe hash table min_match 8, 2 = chain depth 8
# min_match 8, 3 = chain depth 16 min_match 4) in sorted-neighborhood
# terms: k-predecessor probe depth.  The device encoder always runs its
# cost model (demotion + distance-aware scoring), so a given depth
# dominates the host finder of the same level on size; depths are chosen
# so each level's size is <= the emulated-fdeflate port's on all five
# benchmark corpora (bench/sizes_device.py).
DEVICE_LEVELS = {
    1: dict(depth=4, min_match=4),
    2: dict(depth=8, min_match=4),
    3: dict(depth=16, min_match=4),
}


def compress_batch_device(streams: list[bytes], level: int = 2) -> list[bytes]:
    """Device batch encode at a general compression level (1-3).

    Routes the reference's level knob onto the match-scan encoder's probe
    depth (DEVICE_LEVELS).  Levels >= 4 clamp to 3 (the lazy-parser levels
    remain host-side; SURVEY C7).  Output: standard zlib, one dynamic
    block per stream.
    """
    cfg = DEVICE_LEVELS[max(1, min(int(level), 3))]
    return compress_batch_matched(streams, **cfg)


def compress_batch_matched(streams: list[bytes], depth: int = 2,
                           min_match: int = 4, backext: bool = True,
                           passes: int = 2) -> list[bytes]:
    """Device batch encode with LZ77 matching (levels 1-3 capability).

    Three device launches with small host hops: (1) match scan -> roles +
    frequencies + byte histogram; host builds first-pass trees and shadow
    literal costs; (1.5) segment demotion (the block writer's cost model,
    evaluated on device) -> final roles/frequencies; host builds the final
    trees + headers; (2) bit packing.  Output: one dynamic block per
    stream, valid zlib.
    """
    import zlib

    import functools

    import jax
    import jax.numpy as jnp

    from ..models.bitstream import build_huffman_tree

    B = len(streams)
    lengths_np = np.array([len(s) for s in streams], np.int32)
    N = max(8, int(-(-int(lengths_np.max(initial=1)) // 8) * 8))
    buf = np.zeros((B, N), np.uint8)
    for i, s in enumerate(streams):
        buf[i, : len(s)] = np.frombuffer(s, np.uint8)
    data = jnp.asarray(buf)
    lengths = jnp.asarray(lengths_np)

    stage1 = jax.jit(functools.partial(
        _stage1, depth=depth, min_match=min_match, backext=backext))
    segments, roles, (freq_l, freq_d), hist = stage1(data, lengths)
    fl = np.asarray(freq_l)
    fd = np.asarray(freq_d)
    hist_np = np.asarray(hist)

    # Shadow literal costs + first-pass code lengths for the demotion pass.
    shadow = np.zeros((B, 256), np.int32)
    fp_lit = np.zeros((B, 286), np.int32)
    fp_dist = np.zeros((B, 30), np.int32)
    for b in range(B):
        sl, _, _ = build_huffman_tree(hist_np[b].astype(np.int64), 15)
        shadow[b] = np.where(sl > 0, sl, 15)
        ll, _, _ = build_huffman_tree(fl[b].astype(np.int64), 15)
        dl, _, _ = build_huffman_tree(fd[b].astype(np.int64), 15)
        fp_lit[b] = ll
        fp_dist[b] = dl

    stage15 = jax.jit(functools.partial(_demote_segments,
                                        min_match=min_match))
    for _pass in range(passes):
        segments, roles, (freq_l, freq_d) = stage15(
            data, lengths, segments, jnp.asarray(shadow),
            jnp.asarray(fp_lit), jnp.asarray(fp_dist),
        )
        fl = np.asarray(freq_l)
        fd = np.asarray(freq_d)
        for b in range(B):
            ll, _, _ = build_huffman_tree(fl[b].astype(np.int64), 15)
            dl, _, _ = build_huffman_tree(fd[b].astype(np.int64), 15)
            fp_lit[b] = ll
            fp_dist[b] = dl

    HW = 48  # up to 1536 header bits (zlib magic + worst-case trees)
    header_words = np.zeros((B, HW), np.uint32)
    header_bits = np.zeros(B, np.int32)
    lit_codes = np.zeros((B, 286), np.int32)
    lit_lens = np.zeros((B, 286), np.int32)
    dist_codes = np.zeros((B, 30), np.int32)
    dist_lens = np.zeros((B, 30), np.int32)
    for b in range(B):
        hbits, hwords, ll, lc, dl, dc = _host_header(fl[b], fd[b])
        assert hbits <= HW * 32
        header_bits[b] = hbits
        header_words[b, : len(hwords)] = hwords[:HW]
        lit_lens[b] = ll
        lit_codes[b] = lc
        dist_lens[b] = dl
        dist_codes[b] = dc

    stage2 = jax.jit(_pack_symbols)
    words, total_bits = stage2(
        data, lengths, roles,
        jnp.asarray(lit_codes), jnp.asarray(lit_lens),
        jnp.asarray(dist_codes), jnp.asarray(dist_lens),
        jnp.asarray(header_bits), jnp.asarray(header_words.view(np.int32)),
    )
    words_np = np.asarray(words)
    tb = np.asarray(total_bits)

    out = []
    for b in range(B):
        nbytes = int(tb[b]) // 8
        raw = words_np[b].tobytes()[:nbytes]
        out.append(raw + zlib.adler32(streams[b]).to_bytes(4, "big"))
    return out
