"""Speculative chunked decode: intra-stream parallelism (SURVEY.md P2).

A DEFLATE block's bit stream is strictly sequential, but Huffman codes
self-synchronize: a decoder started at a wrong bit offset almost always
re-aligns with the true symbol boundaries within a few symbols.  This module
exploits that (the rapidgzip / "Massively-Parallel Lossless Data
Decompression" approach, see PAPERS.md):

1. split the compressed payload of a block into C chunks at byte boundaries;
2. decode every chunk speculatively on its own device lane, starting at the
   chunk's first bit, recording every visited bit position
   (ops/inflate.decode_symbols with per-lane ``bit_stop``);
3. stitch: the true entry position of chunk i+1 is chunk i's exit; if that
   position was visited by chunk i+1's speculative decode, its record suffix
   from there on is exact.  Unsynced chunks (rare) are re-decoded from their
   now-known entries in one follow-up device pass;
4. concatenate the per-chunk record ranges and materialize with the
   vectorized pointer-doubling expansion.  Back-reference distance bounds
   are validated after stitching, when absolute output positions are known.

Scope: the compressed payload must be a single compressed block with known
tables (fixed, or dynamic with the header parsed on the host) — exactly the
shape of ultra-fast/fdeflate streams and PNG IDAT payloads.  Multi-block
streams fall back to per-block sequential chunking via ops/inflate.
"""

from __future__ import annotations

import functools
import zlib

import numpy as np

from .. import errors as E
from ..ops import inflate as I


@functools.lru_cache(maxsize=16)
def _jit_decode_stop(max_steps: int):
    import jax

    return jax.jit(
        functools.partial(I.decode_symbols, max_steps=max_steps, chain=1)
    )


def _chunk_decode(words, starts, stops, bit_end, tables, max_steps):
    """Speculatively decode C chunks (one lane each).  Returns records+state."""
    import jax.numpy as jnp

    C = len(starts)
    litlen, sec, dist, dsec = tables
    decode = _jit_decode_stop(max_steps)
    return decode(
        words,
        jnp.asarray(starts, jnp.int32),
        jnp.asarray(np.full(C, bit_end, np.int64).astype(np.int32)),
        jnp.asarray(np.full(C, 1 << 30, np.int32)),  # disable dist checks
        jnp.ones(C, bool),
        jnp.zeros(C, jnp.int32),
        jnp.asarray(litlen[None].astype(np.uint32)),
        jnp.asarray((sec if len(sec) else np.zeros(1, np.uint16))[None].astype(np.uint32)),
        jnp.asarray(dist[None].astype(np.uint32)),
        jnp.asarray((dsec if len(dsec) else np.zeros(1, np.uint16))[None].astype(np.uint32)),
        bit_stop=jnp.asarray(stops, jnp.int32),
    )


def decompress_speculative(
    data: bytes,
    num_chunks: int = 16,
    chunk_symbol_slack: float = 1.25,
) -> bytes:
    """Decode a single-compressed-block zlib stream with chunk parallelism.

    Falls back to the lane-per-stream batch decoder for streams this scheme
    does not cover (stored blocks, multiple blocks).
    """
    import jax.numpy as jnp

    st = I._StreamState(data)
    I._advance_headers(st)
    if st.error is not None:
        raise st.error
    if st.done or not st.in_block or st.out:
        # Empty, stored-prefixed, or header-only stream: generic path.
        return _fallback(data)
    if not st.last_block:
        return _fallback(data)  # multi-block: per-block path

    payload_start = st.bitpos
    bit_end = len(data) * 8
    # Chunk boundaries at byte granularity across the payload.
    payload_bits = bit_end - payload_start - 32  # minus checksum
    if payload_bits <= 0 or num_chunks < 2:
        return _fallback(data)
    chunk_bits = max((payload_bits // num_chunks) & ~7, 64)
    starts = [payload_start]
    b = (payload_start + chunk_bits + 7) & ~7
    while b < payload_start + payload_bits and len(starts) < num_chunks:
        starts.append(b)
        b += chunk_bits
    C = len(starts)
    stops = starts[1:] + [bit_end]

    words_np = np.zeros((C, (len(data) + 3) // 4 + 2), np.uint32)
    padded = data + bytes((-len(data)) % 4) + bytes(8)
    words_np[:] = np.frombuffer(padded, "<u4")

    # Steps bound: every decode step consumes >= 1 bit, so chunk_bits + 1 is
    # the hard ceiling; start from a typical-density estimate and escalate if
    # any lane exhausts its budget.
    max_steps = max(512, 1 << int(np.ceil(np.log2(chunk_bits // 4 + 64))))
    tables = st.tables
    words = jnp.asarray(words_np)
    for _attempt in range(3):
        records, (bpos, opos, status) = _chunk_decode(
            words, np.array(starts, np.int32),
            np.array(stops, np.int32), bit_end, tables, max_steps,
        )
        status = np.asarray(status)
        if not (status == I._OK).any():
            break
        if max_steps > chunk_bits:
            break
        max_steps *= 4
    else:
        return _fallback(data)
    if (status == I._OK).any():
        return _fallback(data)
    rl, rlh, rc, rn, rd, rp = (np.array(r) for r in records)  # writable copies
    bpos = np.array(bpos)
    status = np.array(status)

    # ---- stitch -----------------------------------------------------------
    # Walk chunks left to right; track the true entry position.
    sel_ranges: list[tuple[int, int, int]] = []  # (lane, first_step, last_step+1)
    entry = payload_start
    lane = 0
    redecodes = 0
    while lane < C:
        if entry >= stops[lane] and lane < C - 1:
            # The previous chunk's decode ran past this whole chunk.
            lane += 1
            continue
        col = rp[:, lane]
        nsteps = int((col >= 0).sum())
        hit = np.nonzero(col[:nsteps] == entry)[0]
        if len(hit) == 0:
            # No sync: re-decode this chunk from the exact entry.
            redecodes += 1
            if redecodes > C + 2:
                return _fallback(data)
            sub_records, (sb, so, ss) = _chunk_decode(
                jnp.asarray(words_np[:1]), np.array([entry], np.int32),
                np.array([stops[lane]], np.int32), bit_end, tables, max_steps,
            )
            srl, srlh, src_, srn, srd, srp = (np.asarray(r) for r in sub_records)
            rl[:, lane] = srl[:, 0]
            rlh[:, lane] = srlh[:, 0]
            rc[:, lane] = src_[:, 0]
            rn[:, lane] = srn[:, 0]
            rd[:, lane] = srd[:, 0]
            rp[:, lane] = srp[:, 0]
            bpos[lane] = np.asarray(sb)[0]
            status[lane] = np.asarray(ss)[0]
            continue
        first = int(hit[0])
        if int(status[lane]) == I._OK:
            # Ran out of steps before reaching its stop: shouldn't happen
            # with the slack bound; be safe.
            return _fallback(data)
        sel_ranges.append((lane, first, nsteps))
        if int(status[lane]) == I._EOB:
            entry = int(bpos[lane])
            break
        if int(status[lane]) != I._STOPPED:
            raise E.error_for_status(int(status[lane]))
        entry = int(bpos[lane])
        lane += 1
    else:
        # Never reached EOB.
        raise E.InsufficientInput()

    # ---- assemble stitched records ---------------------------------------
    parts = [
        (rl[f:e, ln], rlh[f:e, ln], rc[f:e, ln], rn[f:e, ln], rd[f:e, ln])
        for ln, f, e in sel_ranges
    ]
    lit = np.concatenate([p[0] for p in parts])
    lith = np.concatenate([p[1] for p in parts])
    cnt = np.concatenate([p[2] for p in parts])
    lng = np.concatenate([p[3] for p in parts])
    dst = np.concatenate([p[4] for p in parts])

    # Validate distances now that absolute positions are known.
    adv = cnt.astype(np.int64) + lng
    startpos = np.cumsum(adv) - adv
    bad = (dst > 0) & (dst > startpos)
    if bad.any():
        raise E.DistanceTooFarBack()

    total = int(adv.sum())

    # ---- materialize ------------------------------------------------------
    # Pad the record count to a bucket so the jit cache stays small; zero
    # records are no-ops.
    K = 1 << max(8, int(np.ceil(np.log2(max(len(lit), 1)))))
    pad = K - len(lit)
    lit = np.pad(lit, (0, pad))
    lith = np.pad(lith, (0, pad))
    cnt = np.pad(cnt, (0, pad))
    lng = np.pad(lng, (0, pad))
    dst = np.pad(dst, (0, pad))
    cap = 1 << max(8, int(np.ceil(np.log2(max(total, 1)))))
    out, _ = I._jit_materialize(cap)(
        (
            jnp.asarray(lit.reshape(K, 1)),
            jnp.asarray(lith.reshape(K, 1)),
            jnp.asarray(cnt.reshape(K, 1)),
            jnp.asarray(lng.reshape(K, 1)),
            jnp.asarray(dst.reshape(K, 1)),
        ),
        jnp.zeros((1, I.WINDOW), jnp.uint8),
        jnp.asarray([total], jnp.int32),
    )
    result = np.asarray(out)[0, :total].tobytes()

    # ---- checksum ---------------------------------------------------------
    ck_pos = (entry + 7) & ~7
    stored = int.from_bytes(data[ck_pos // 8 : ck_pos // 8 + 4], "big")
    if stored != zlib.adler32(result):
        raise E.WrongChecksum()
    return result


def _fallback(data: bytes) -> bytes:
    result = I.decompress_batch([data])[0]
    if isinstance(result, E.DecompressionError):
        raise result
    return result
