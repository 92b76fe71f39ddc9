"""Batched speculative decode: streams x chunks lane parallelism.

Combines P1 (one lane per stream) with P2 (speculative chunks within a
stream): a batch of B single-block streams decodes on B*C device lanes.
This multiplies the lane count feeding the symbol-decode loop — the loop's
iteration count drops by ~C, which is what sets wall-clock time on TPU.

Pipeline:
  1. host parses every stream's header, builds/dedups tables;
  2. one device pass decodes all B*C chunks speculatively (chain=1 so every
     symbol boundary is recorded);
  3. host stitches each stream left-to-right through its chunks; chunks
     whose true entry was not visited are re-decoded from the exact entry —
     all unsynced chunks across the whole batch re-run in ONE device pass
     per round (self-synchronization makes rounds rare);
  4. stitched records materialize per stream with the pointer-doubling
     expansion; distances validate against absolute output positions;
  5. Adler-32 verification.

Streams outside the scheme's scope (multi-block, stored prefixes) fall back
to ops/inflate.decompress_batch.
"""

from __future__ import annotations

import functools
import zlib

import numpy as np

from .. import errors as E
from ..ops import inflate as I


@functools.lru_cache(maxsize=16)
def _jit_decode(max_steps: int):
    import jax

    return jax.jit(
        functools.partial(I.decode_symbols, max_steps=max_steps, chain=1)
    )


def decompress_batch_speculative(
    streams: list[bytes],
    chunks_per_stream: int = 16,
    verify_checksum: bool = True,
) -> list[bytes | E.DecompressionError]:
    import jax.numpy as jnp

    B = len(streams)
    results: list[bytes | E.DecompressionError | None] = [None] * B

    # ---- host framing ----------------------------------------------------
    lanes = []  # (stream_idx, start_bit, stop_bit)
    fallback_idx = []
    metas = []
    for si, data in enumerate(streams):
        st = I._StreamState(data)
        I._advance_headers(st)
        if st.error is not None:
            results[si] = st.error
            continue
        if st.done or not st.in_block or st.out or not st.last_block:
            fallback_idx.append(si)
            continue
        payload_start = st.bitpos
        bit_end = len(data) * 8
        payload_bits = bit_end - payload_start - 32
        if payload_bits <= 64 * 2:
            fallback_idx.append(si)
            continue
        chunk_bits = max((payload_bits // chunks_per_stream) & ~7, 64)
        starts = [payload_start]
        b = (payload_start + chunk_bits + 7) & ~7
        while b < payload_start + payload_bits and len(starts) < chunks_per_stream:
            starts.append(b)
            b += chunk_bits
        stops = starts[1:] + [bit_end]
        lane0 = len(lanes)
        for s, e in zip(starts, stops):
            lanes.append((si, s, e))
        metas.append(
            dict(si=si, lane0=lane0, nlanes=len(starts), start=payload_start,
                 bit_end=bit_end, tables=st.tables, chunk_bits=chunk_bits)
        )

    # Fall back where needed.
    if fallback_idx:
        fb = I.decompress_batch([streams[i] for i in fallback_idx])
        for i, r in zip(fallback_idx, fb):
            results[i] = r
    if not metas:
        return [r if r is not None else E.InsufficientInput() for r in results]

    # ---- device pass 1: speculative chunk decode -------------------------
    # Pad the lane count to a power-of-two bucket so jit caches stay small
    # across varying batch compositions; padded lanes are inert (bit range
    # of size zero).  Chunk lanes of the same stream share one row of the
    # words array via the stream_row indirection.
    L_real = len(lanes)
    L = 1 << max(3, int(np.ceil(np.log2(max(L_real, 1)))))
    while len(lanes) < L:
        lanes.append((metas[0]["si"], 0, 0))
    Wmax = max((len(streams[m["si"]]) + 3) // 4 for m in metas) + 2
    Wmax = 1 << int(np.ceil(np.log2(Wmax)))
    words_np = np.zeros((len(metas), Wmax), np.uint32)
    stream_to_row = {}
    for row, m in enumerate(metas):
        data = streams[m["si"]]
        padded = data + bytes((-len(data)) % 4) + bytes(8)
        words_np[row, : len(padded) // 4] = np.frombuffer(padded, "<u4")
        stream_to_row[m["si"]] = row
    lane_srow = np.array(
        [stream_to_row[si] for si, _, _ in lanes], np.int32
    )

    # Deduplicate table sets across the batch.
    table_rows: dict[bytes, int] = {}
    stacked = []
    lane_tid = np.zeros(L, np.int32)
    for m in metas:
        t = m["tables"]
        key = t[0].tobytes() + t[2].tobytes() + t[1].tobytes() + t[3].tobytes()
        if key not in table_rows:
            table_rows[key] = len(stacked)
            stacked.append(t)
        for li in range(m["lane0"], m["lane0"] + m["nlanes"]):
            lane_tid[li] = table_rows[key]
    T = len(stacked)
    sec_max = max([len(t[1]) for t in stacked] + [1])
    dsec_max = max([len(t[3]) for t in stacked] + [1])
    litlen_np = np.zeros((T, I.DEFAULT_LITLEN_TABLE_SIZE), np.uint32)
    sec_np = np.zeros((T, sec_max), np.uint32)
    dist_np = np.zeros((T, I.DEFAULT_DIST_TABLE_SIZE), np.uint32)
    dsec_np = np.zeros((T, dsec_max), np.uint32)
    for t, (ll, ls, dd, ds) in enumerate(stacked):
        litlen_np[t] = ll
        sec_np[t, : len(ls)] = ls
        dist_np[t] = dd
        dsec_np[t, : len(ds)] = ds

    starts_np = np.array([s for _, s, _ in lanes], np.int32)
    stops_np = np.array([e for _, _, e in lanes], np.int32)
    ends_np = np.zeros(L, np.int32)
    ends_np[:L_real] = [
        m["bit_end"] for m in metas for _ in range(m["nlanes"])
    ]
    max_chunk_bits = max(m["chunk_bits"] for m in metas)
    max_steps = max(512, 1 << int(np.ceil(np.log2(max_chunk_bits // 4 + 64))))

    decode = _jit_decode(max_steps)
    t_args = (
        jnp.asarray(litlen_np), jnp.asarray(sec_np),
        jnp.asarray(dist_np), jnp.asarray(dsec_np),
    )

    words = jnp.asarray(words_np)

    def run(starts, stops, ends, tid, srow):
        return decode(
            words,
            jnp.asarray(starts),
            jnp.asarray(ends),
            jnp.asarray(np.full(len(starts), 1 << 30, np.int32)),
            jnp.ones(len(starts), bool),
            jnp.asarray(tid),
            *t_args,
            bit_stop=jnp.asarray(stops),
            stream_row=jnp.asarray(srow),
        )

    for _attempt in range(3):
        records, (bpos, opos, status) = run(
            starts_np, stops_np, ends_np, lane_tid, lane_srow
        )
        status = np.array(status)
        if not (status == I._OK).any() or max_steps > max_chunk_bits:
            break
        max_steps *= 4
        decode = _jit_decode(max_steps)

    recs = [np.array(r) for r in records]  # rl, rlh, rc, rn, rd, rp
    bpos = np.array(bpos)

    # ---- stitch + batched re-decode rounds -------------------------------
    for _round in range(chunks_per_stream + 2):
        pending = []  # (lane_index, entry)
        for m in metas:
            if results[m["si"]] is not None:
                continue
            entry = m["start"]
            li = m["lane0"]
            last = m["lane0"] + m["nlanes"] - 1
            m["ranges"] = []
            m["incomplete"] = False
            while li <= last:
                lane_stop = int(stops_np[li])
                if entry >= lane_stop and li < last:
                    li += 1
                    continue
                if int(status[li]) == I._OK:
                    m["incomplete"] = True  # ran out of steps
                    break
                col = recs[5][:, li]
                nsteps = int((col >= 0).sum())
                hits = np.nonzero(col[:nsteps] == entry)[0]
                if len(hits) == 0:
                    pending.append((li, entry))
                    m["incomplete"] = True
                    break
                first = int(hits[0])
                m["ranges"].append((li, first, nsteps))
                s = int(status[li])
                entry = int(bpos[li])
                if s == I._EOB:
                    m["eob_pos"] = entry
                    break
                if s != I._STOPPED:
                    results[m["si"]] = E.error_for_status(s)
                    break
                li += 1
            else:
                results[m["si"]] = E.InsufficientInput()
            if (
                results[m["si"]] is None
                and not m["incomplete"]
                and "eob_pos" not in m
            ):
                results[m["si"]] = E.InsufficientInput()
        if not pending:
            break
        # Re-decode all unsynced chunks in one pass from exact entries
        # (padded to a power-of-two bucket; pad lanes are inert).
        P = 1 << max(2, int(np.ceil(np.log2(len(pending)))))
        idxs = np.zeros(P, np.int64)
        entries = np.zeros(P, np.int32)
        idxs[: len(pending)] = [li for li, _ in pending]
        entries[: len(pending)] = [e for _, e in pending]
        sub_stops = stops_np[idxs].copy()
        sub_ends = ends_np[idxs].copy()
        sub_stops[len(pending):] = 0
        sub_ends[len(pending):] = 0
        sub_records, (sb, so, ss) = run(
            entries, sub_stops, sub_ends, lane_tid[idxs], lane_srow[idxs]
        )
        sub = [np.array(r) for r in sub_records]
        for j, (li, _) in enumerate(pending):
            for r in range(6):
                recs[r][:, li] = sub[r][:, j]
            bpos[li] = np.array(sb)[j]
            status[li] = np.array(ss)[j]
    # Streams whose lanes exhausted the step budget use the generic path.
    exhausted = [
        m["si"]
        for m in metas
        if results[m["si"]] is None and m.get("incomplete") and "eob_pos" not in m
    ]
    if exhausted:
        fb = I.decompress_batch([streams[i] for i in exhausted])
        for i, r in zip(exhausted, fb):
            results[i] = r

    # ---- materialize per stream ------------------------------------------
    ready = [m for m in metas if results[m["si"]] is None and "eob_pos" in m]
    if ready:
        parts_per_stream = []
        Kmax = 0
        for m in ready:
            rl = np.concatenate([recs[0][f:e, ln] for ln, f, e in m["ranges"]])
            rlh = np.concatenate([recs[1][f:e, ln] for ln, f, e in m["ranges"]])
            rc = np.concatenate([recs[2][f:e, ln] for ln, f, e in m["ranges"]])
            rn = np.concatenate([recs[3][f:e, ln] for ln, f, e in m["ranges"]])
            rd = np.concatenate([recs[4][f:e, ln] for ln, f, e in m["ranges"]])
            adv = rc.astype(np.int64) + rn
            startpos = np.cumsum(adv) - adv
            if ((rd > 0) & (rd > startpos)).any():
                results[m["si"]] = E.DistanceTooFarBack()
                continue
            total = int(adv.sum())
            parts_per_stream.append((m, rl, rlh, rc, rn, rd, total))
            Kmax = max(Kmax, len(rl))

        if parts_per_stream:
            K = 1 << max(8, int(np.ceil(np.log2(max(Kmax, 1)))))
            NB = len(parts_per_stream)
            arrs = [
                np.zeros((K, NB), dt)
                for dt in (np.uint32, np.uint32, np.int8, np.int32, np.int32)
            ]
            produced = np.zeros(NB, np.int32)
            for j, (m, rl, rlh, rc, rn, rd, total) in enumerate(parts_per_stream):
                n = len(rl)
                arrs[0][:n, j] = rl
                arrs[1][:n, j] = rlh
                arrs[2][:n, j] = rc
                arrs[3][:n, j] = rn
                arrs[4][:n, j] = rd
                produced[j] = total
            cap = 1 << max(8, int(np.ceil(np.log2(max(int(produced.max()), 1)))))
            out, _ = I._jit_materialize(cap)(
                tuple(jnp.asarray(a) for a in arrs),
                jnp.zeros((NB, I.WINDOW), jnp.uint8),
                jnp.asarray(produced),
            )
            out = np.asarray(out)
            for j, (m, *_rest, total) in enumerate(parts_per_stream):
                data = streams[m["si"]]
                result = out[j, :total].tobytes()
                if verify_checksum:
                    ck_pos = (m["eob_pos"] + 7) & ~7
                    stored = int.from_bytes(
                        data[ck_pos // 8 : ck_pos // 8 + 4], "big"
                    )
                    if stored != zlib.adler32(result):
                        results[m["si"]] = E.WrongChecksum()
                        continue
                results[m["si"]] = result

    return [r if r is not None else E.InsufficientInput() for r in results]
