"""Fully fused device codec pipeline: encode -> chunked decode -> stitch ->
materialize -> verify, in ONE XLA program with only scalars read back.

This is the production shape for device-resident data (and the benchmark
path): the host never touches records, words, or outputs — speculative chunk
stitching itself is vectorized on device:

* chunk lane k's true entry is lane k-1's exit (a property of speculative
  decode: the exit is the same wherever the lane was entered, once synced);
* a lane is synced iff its entry appears among its recorded step positions;
* records before the sync point and lanes after the end-of-block lane mask
  to no-ops, then records rearrange lane-major and materialize with the
  pointer-doubling expansion;
* distances validate against post-stitch absolute positions, and the
  decoded bytes checksum on-device against the encoder's Adler-32.

Streams that fail to sync (rare) or exhaust the step budget report
``ok=False`` and are re-decoded by the host path
(parallel/batch_speculative).
"""

from __future__ import annotations

import functools

import numpy as np

from ..huffman import build_table
from ..ops import inflate as I
from ..tables import (
    DEFAULT_DIST_TABLE_SIZE,
    DEFAULT_LITLEN_TABLE_SIZE,
    DISTANCE_TABLE_ENTRIES,
    HUFFMAN_LENGTHS,
    LITLEN_TABLE_ENTRIES,
)


@functools.lru_cache(maxsize=1)
def _trained_tables():
    litlen = build_table(
        HUFFMAN_LENGTHS, LITLEN_TABLE_ENTRIES, DEFAULT_LITLEN_TABLE_SIZE,
        is_distance_table=False, double_literal=True,
    )
    dl = np.zeros(32, np.int64)
    dl[0] = 1
    dist = build_table(
        dl, DISTANCE_TABLE_ENTRIES, DEFAULT_DIST_TABLE_SIZE,
        is_distance_table=True, double_literal=False,
    )
    return (
        litlen.primary[None].astype(np.uint32),
        np.zeros((1, 1), np.uint32),
        dist.primary[None].astype(np.uint32),
        np.zeros((1, 1), np.uint32),
        litlen.first_len[None].astype(np.int32),
    )


def stitch_and_materialize(
    records, bpos, status, starts, payload_start, C: int, out_capacity: int,
    ptr_rounds: int | None = None,
):
    """Device-side stitch of speculative chunk records + materialization.

    Args:
      records: 6-tuple from decode_symbols, each [K, B*C] (stream-major
        lanes, chain=1).
      bpos/status: [B*C] lane exit positions / statuses.
      starts: [B*C] lane start bit positions.
      payload_start: [B] first payload bit of each stream.
      out_capacity: static output bound per stream.

    Returns (out u8[B, cap], produced i32[B], ok bool[B]).
    """
    import jax
    import jax.numpy as jnp

    rl, rlh, rc, rn, rd, rp = records
    K, L = rl.shape
    B = L // C
    i32 = jnp.int32

    # True entry per lane: previous lane's exit; payload start for lane 0.
    k = jnp.tile(jnp.arange(C, dtype=i32), B)
    prev_exit = jnp.concatenate([bpos[:1] * 0, bpos[:-1]])
    entries = jnp.where(k == 0, jnp.repeat(payload_start, C), prev_exit)

    # Sync point: first step whose position equals the entry.
    hit = rp == entries[None, :]
    synced = jnp.any(hit, axis=0)
    step_iota = jax.lax.broadcasted_iota(i32, (K, L), 0)
    first = jnp.min(jnp.where(hit, step_iota, K), axis=0)  # K when unsynced

    # End-of-block lane per stream; lanes after it are dropped.
    st2 = status.reshape(B, C)
    is_eob = st2 == I._EOB
    eob_k = jnp.min(
        jnp.where(is_eob, jnp.arange(C, dtype=i32)[None, :], C), axis=1
    )  # C when no EOB
    has_eob = eob_k < C

    lane_used = k <= jnp.repeat(eob_k, C)
    keep = lane_used[None, :] & (step_iota >= first[None, :])

    # Stream validity: every used lane synced, no error statuses, EOB found.
    lane_err = (status != I._EOB) & (status != I._STOPPED)
    ok = (
        has_eob
        & jnp.all((synced | ~lane_used).reshape(B, C), axis=1)
        & jnp.all((~lane_err | ~lane_used).reshape(B, C), axis=1)
    )

    # Mask pre-sync records / dropped lanes to no-ops.
    rc_m = jnp.where(keep, rc, 0)
    rn_m = jnp.where(keep, rn, 0)
    rd_m = jnp.where(keep, rd, 0)
    rl_m = jnp.where(keep, rl, 0)
    rlh_m = jnp.where(keep, rlh, 0)

    # Rearrange [K, B*C] -> [C*K, B]: concatenate lanes of each stream.
    def rearrange(a):
        return (
            a.reshape(K, B, C).transpose(2, 0, 1).reshape(C * K, B)
        )

    rl2 = rearrange(rl_m)
    rlh2 = rearrange(rlh_m)
    rc2 = rearrange(rc_m)
    rn2 = rearrange(rn_m)
    rd2 = rearrange(rd_m)

    # Distance validation at absolute output positions.
    adv = rc2.astype(i32) + rn2  # [C*K, B]
    pos = jnp.cumsum(adv, axis=0) - adv
    bad_dist = jnp.any((rd2 > 0) & (rd2 > pos), axis=0)
    ok = ok & ~bad_dist
    produced = jnp.sum(adv, axis=0)

    out, _ = I.materialize(
        (rl2, rlh2, rc2, rn2, rd2),
        jnp.zeros((B, I.WINDOW), jnp.uint8),
        produced,
        out_capacity=out_capacity,
        ptr_rounds=ptr_rounds,
    )
    return out, produced, ok


def indexed_materialize(records, status, starts_mat, C: int, out_capacity: int,
                        ptr_rounds: int | None = None):
    """Assemble output from exactly-indexed chunk lanes (no stitching).

    Every lane started at an exact symbol boundary from the encoder's chunk
    index, so all records are valid; lanes with an empty bit range are
    inert.  Returns (out, produced, ok).
    """
    import jax
    import jax.numpy as jnp

    rl, rlh, rc, rn, rd, rp = records
    K, L = rl.shape
    B = L // C
    i32 = jnp.int32

    # Validity: no error statuses; the last non-empty lane reached EOB.
    st2 = status.reshape(B, C)
    lane_err = (st2 != I._EOB) & (st2 != I._STOPPED)
    # Lanes that were active (start < stop) must not error; EOB must appear.
    ok = ~jnp.any(lane_err, axis=1) & jnp.any(st2 == I._EOB, axis=1)

    def rearrange(a):
        return a.reshape(K, B, C).transpose(2, 0, 1).reshape(C * K, B)

    rl2 = rearrange(rl)
    rlh2 = rearrange(rlh)
    rc2 = rearrange(rc)
    rn2 = rearrange(rn)
    rd2 = rearrange(rd)

    adv = rc2.astype(i32) + rn2
    pos = jnp.cumsum(adv, axis=0) - adv
    bad_dist = jnp.any((rd2 > 0) & (rd2 > pos), axis=0)
    ok = ok & ~bad_dist
    produced = jnp.sum(adv, axis=0)

    out, _ = I.materialize(
        (rl2, rlh2, rc2, rn2, rd2),
        jnp.zeros((B, I.WINDOW), jnp.uint8),
        produced,
        out_capacity=out_capacity,
        ptr_rounds=ptr_rounds,
    )
    return out, produced, ok


def indexed_decode_step(C: int, max_steps: int, out_capacity: int, chain: int = 4,
                        ptr_rounds: int | None = None):
    """Jittable chunk-parallel decoder for indexed ultra-fast streams.

    fn(words u32[B, W], total_bits i32[B], chunk_starts i32[B, C]) ->
      (out u8[B, cap], produced i32[B], ok bool[B]).
    """
    import jax.numpy as jnp

    from ..ops.inflate import decode_symbols

    tables = _trained_tables()

    def step(words, total_bits, chunk_starts):
        i32 = jnp.int32
        B = words.shape[0]
        L = B * C
        starts = chunk_starts.reshape(-1)
        next_start = jnp.concatenate(
            [chunk_starts[:, 1:], jnp.full((B, 1), 1 << 30, i32)], axis=1
        ).reshape(-1)
        bits_l = jnp.repeat(total_bits, C)
        stops = jnp.minimum(next_start, bits_l)
        srow = jnp.repeat(jnp.arange(B, dtype=i32), C)
        active = starts < stops

        t = [jnp.asarray(x) for x in tables]
        records, (bpos, opos, status) = decode_symbols(
            words, starts, bits_l,
            jnp.full((L,), 1 << 30, i32),
            active, jnp.zeros((L,), i32),
            t[0], t[1], t[2], t[3],
            max_steps=max_steps, bit_stop=stops, chain=chain,
            stream_row=srow, litlen_first=t[4],
        )
        return indexed_materialize(
            records, jnp.where(active, status, I._STOPPED), starts, C,
            out_capacity=out_capacity, ptr_rounds=ptr_rounds,
        )

    return step


def decompress_batch_indexed(
    streams: list[bytes], index: np.ndarray, max_steps: int | None = None
) -> list[bytes]:
    """Decode indexed ultra-fast streams with chunk-parallel device lanes.

    ``index`` comes from ``compress_batch_ultra_fast(..., with_index=C)``.
    Falls back to the generic decoder for any stream the indexed pipeline
    rejects.  Checksums verify on host during assembly.
    """
    import functools as ft

    import jax
    import jax.numpy as jnp
    import zlib

    from .. import errors as E

    B = len(streams)
    C = index.shape[1]
    Wmax = 1 << int(np.ceil(np.log2(max(len(s) for s in streams) // 4 + 2)))
    words_np = np.zeros((B, Wmax), np.uint32)
    bits = np.zeros(B, np.int32)
    for i, s in enumerate(streams):
        body = s[:-4]  # trailing adler is framing, not bitstream
        padded = body + bytes((-len(body)) % 4) + bytes(8)
        words_np[i, : len(padded) // 4] = np.frombuffer(padded, "<u4")
        bits[i] = len(body) * 8
    # Output capacity isn't known up front (runs expand); `produced` from
    # the decode records is exact, so grow and retry on underestimate.
    cap = 1 << int(
        np.ceil(np.log2(max(int(b) for b in bits) // 2 + 256))
    )
    if max_steps is None:
        max_steps = max(2048, cap // C)
    for _ in range(8):
        step = jax.jit(indexed_decode_step(C, max_steps, cap))
        out, produced, ok = step(
            jnp.asarray(words_np), jnp.asarray(bits), jnp.asarray(index)
        )
        produced = np.asarray(produced)
        if int(produced.max(initial=0)) <= cap:
            break
        cap = 1 << int(np.ceil(np.log2(int(produced.max()))))
    out = np.asarray(out)
    ok = np.asarray(ok)

    results: list[bytes] = []
    for i, s in enumerate(streams):
        if not ok[i]:
            from ..ops.inflate import decompress_batch

            r = decompress_batch([s])[0]
            if isinstance(r, E.DecompressionError):
                raise r
            results.append(r)
            continue
        data = out[i, : produced[i]].tobytes()
        if zlib.adler32(data) != int.from_bytes(s[-4:], "big"):
            raise E.WrongChecksum()
        results.append(data)
    return results


def fused_ultrafast_roundtrip_v2(C: int, N: int, U: int = 32,
                                 R: int | None = None):
    """Round-2 fused pipeline: fixed-geometry encode -> canonical Pallas
    decode -> checksum verify, one XLA program, scalars-only readback.

    The encoder emits lane-blocked chunk windows (ops/ultrafast_kernel.
    encode_ultrafast_blocked); the kernel (ops/pallas_decode2) decodes every
    chunk to its statically-known S-byte output range; verification compares
    each lane's exit bit position against the encoder's chunk_bits AND the
    decoded Adler-32 (computed straight off the kernel's step-major layout)
    against the encoder's.  No materialization phase, no transposes.

    Returns fn(data u8[B, N], lengths i32[B]) ->
      (out_sm i32[LB, T, 8, 128], bpos_ok bool[B], ck_ok bool[B]).
    """
    import jax.numpy as jnp

    from ..ops.pallas_decode2 import adler_step_major, decode_blocked
    from ..ops.ultrafast_kernel import encode_ultrafast_blocked

    assert N % C == 0
    S = N // C
    T = S // 4

    def step(data, lengths):
        B = data.shape[0]
        win, chunk_bits, adler = encode_ultrafast_blocked(data, lengths, C)
        out_sm, bpos = decode_blocked(win, T=T, U=U, lane_major=False, R=R)
        L = B * C
        bp = bpos.reshape(-1)[:L].reshape(B, C)
        # Exit positions are meaningful only for fully-covered chunks; a
        # partial tail lane pads with zero bits (which decode to the trained
        # tree's zero literal, so the checksum still covers it exactly).
        offs = jnp.arange(C, dtype=jnp.int32)[None, :] * S
        full = offs + S <= lengths.astype(jnp.int32)[:, None]
        bpos_ok = jnp.all((bp == chunk_bits) | ~full, axis=1)
        ck = adler_step_major(out_sm, B, C, S, lengths)
        ck_ok = ck == adler
        return out_sm, bpos_ok, ck_ok

    return step


def zlib_encode_step(C: int, tree=None):
    """Headline encode leg: linear (framed, standard-zlib) words + index.

    fn(data u8[B, N], lengths i32[B]) -> (words u32[B, W], total_bits i32[B],
    adler u32[B], chunk_starts i32[B, C], eof_pos i32[B]).  ``words`` +
    ``total_bits`` + ``adler`` assemble into byte streams any zlib inflater
    accepts (ops/ultrafast_kernel.finalize_streams); the chunk index and
    eof position are sidecar metadata for the chunk-parallel decode leg.

    ``tree``: optional ops/septree.TreeProfile — encode with the
    class-separated throughput tree (its streams decode through the
    sync-free sep kernel); None keeps the trained tree.
    """
    from ..ops.ultrafast_kernel import encode_ultrafast_batch

    def step(data, lengths):
        return encode_ultrafast_batch(
            data, lengths, num_chunks=C, fixed_geometry=True,
            return_eof=True, tree=tree
        )

    return step


def zlib_decode_step(C: int, N: int, wwin: int, U: int = 32,
                     R: int | None = None, tree=None):
    """Decode leg over STANDARD zlib artifacts: repack -> v2 kernel -> verify.

    The input is the linear framed stream exactly as the encode leg emits
    it (and as ``zlib.decompress`` accepts it); per-lane windows are staged
    by the DMA repack kernel (ops/repack) at the chunk index's bit offsets.
    Equivalent decode capability bar: the reference's hot loop over the
    ultra-fast stream (/root/reference/src/decompress.rs:611-830).

    fn(words, chunk_starts, eof_pos, adler, lengths) ->
      (out_sm i32[LB, T, 8, 128], bpos_ok bool[B], ck_ok bool[B]).
    ``bpos_ok`` checks every full chunk's exit bit position against the
    index (exact symbol-level agreement); ``ck_ok`` the decoded Adler-32
    against the encoder's.
    """
    import jax.numpy as jnp

    from ..ops.pallas_decode2 import (
        adler_step_major,
        decode_blocked,
        decode_blocked_sep,
    )
    from ..ops.repack import stage_blocked_from_linear

    assert N % C == 0
    S = N // C
    T = S // 4

    def step(words, chunk_starts, eof_pos, adler, lengths):
        B = words.shape[0]
        win = stage_blocked_from_linear(words, chunk_starts, C, wwin)
        if tree is None:
            out_sm, bpos = decode_blocked(win, T=T, U=U, lane_major=False,
                                          R=R)
        else:
            out_sm, bpos = decode_blocked_sep(win, T=T, U=U,
                                              lane_major=False, R=R)
        L = B * C
        bp = bpos.reshape(-1)[:L].reshape(B, C)
        expected = (
            jnp.concatenate([chunk_starts[:, 1:], eof_pos[:, None]], axis=1)
            - chunk_starts
        )
        offs = jnp.arange(C, dtype=jnp.int32)[None, :] * S
        full = offs + S <= lengths.astype(jnp.int32)[:, None]
        bpos_ok = jnp.all((bp == expected) | ~full, axis=1)
        ck = adler_step_major(out_sm, B, C, S, lengths)
        ck_ok = ck == adler
        return out_sm, bpos_ok, ck_ok

    return step


def fused_zlib_roundtrip(C: int, N: int, wwin: int, U: int = 32,
                         R: int | None = None, tree=None):
    """One-program roundtrip through a STANDARD zlib artifact.

    encode (linear framed words) -> DMA repack -> v2 canonical decode ->
    bpos + Adler verify; scalars-only readback.  Unlike
    fused_ultrafast_roundtrip_v2, the byte stream between the two legs is
    a valid zlib stream (the bench spot-checks it with zlib.decompress).
    ``tree``: optional sep-tree throughput profile (see zlib_encode_step).
    """

    enc = zlib_encode_step(C, tree=tree)
    dec = zlib_decode_step(C, N, wwin, U=U, R=R, tree=tree)

    def step(data, lengths):
        words, total_bits, adler, starts, eof = enc(data, lengths)
        out_sm, bpos_ok, ck_ok = dec(words, starts, eof, adler, lengths)
        return out_sm, bpos_ok, ck_ok

    return step


def fused_adaptive_roundtrip(C: int, N: int, U: int = 8):
    """Adaptive-tree fused pipeline: on-device tree build -> blocked encode
    -> canonical Pallas decode with runtime tables -> checksum verify.

    Like fused_ultrafast_roundtrip_v2 but the Huffman tree is built on
    device for THIS batch (ops/adaptive: histogram -> length-limited DP ->
    canonical codes), closing the reference's per-block dynamic-table
    capability (src/lib.rs:42-101, src/huffman.rs:18-184) with zero host
    round-trips.  The decode kernel executable is shared with the
    trained-tree pipeline (tables are runtime SMEM inputs).

    Returns fn(data u8[B, N], lengths i32[B]) ->
      (out_sm, bpos_ok bool[B], ck_ok bool[B], total_bits i32).
    """
    import jax.numpy as jnp

    from ..ops.adaptive import encode_adaptive_blocked
    from ..ops.pallas_decode2 import adler_step_major, decode_blocked

    assert N % C == 0
    S = N // C
    T = S // 4

    def step(data, lengths):
        B = data.shape[0]
        win, chunk_bits, adler, lens, meta, tabp = encode_adaptive_blocked(
            data, lengths, C
        )
        out_sm, bpos = decode_blocked(
            win, T=T, U=U, lane_major=False, tables=(meta, tabp)
        )
        L = B * C
        bp = bpos.reshape(-1)[:L].reshape(B, C)
        offs = jnp.arange(C, dtype=jnp.int32)[None, :] * S
        full = offs + S <= lengths.astype(jnp.int32)[:, None]
        bpos_ok = jnp.all((bp == chunk_bits) | ~full, axis=1)
        ck = adler_step_major(out_sm, B, C, S, lengths)
        ck_ok = ck == adler
        return out_sm, bpos_ok, ck_ok, jnp.sum(chunk_bits)

    return step


def fused_ultrafast_roundtrip(C: int, max_steps: int, N: int, chain: int = 4,
                              ptr_rounds: int | None = None,
                              lut_matmul: bool = False):
    """Build the jittable fused encode->decode->verify step.

    The encoder emits an exact chunk index (symbol-boundary bit positions),
    so decode lanes start at true entries — chunk parallelism without the
    self-synchronization assumption, which run-structured streams violate.

    Returns fn(data u8[B, N], lengths i32[B]) ->
      (decoded u8[B, N], produced i32[B], ok bool[B], checksum_ok bool[B]).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.adler32 import adler32_jax
    from ..ops.inflate import decode_symbols
    from ..ops.ultrafast_kernel import encode_ultrafast_batch

    tables = _trained_tables()

    def step(data, lengths):
        i32 = jnp.int32
        B = data.shape[0]
        L = B * C
        words, total_bits, adler, chunk_starts = encode_ultrafast_batch(
            data, lengths, num_chunks=C
        )

        starts = chunk_starts.reshape(-1)  # [B*C], stream-major
        next_start = jnp.concatenate(
            [chunk_starts[:, 1:], jnp.full((B, 1), 1 << 30, i32)], axis=1
        ).reshape(-1)
        bits_l = jnp.repeat(total_bits, C)
        stops = jnp.minimum(next_start, bits_l)
        srow = jnp.repeat(jnp.arange(B, dtype=i32), C)
        active = starts < stops

        t = [jnp.asarray(x) for x in tables]
        records, (bpos, opos, status) = decode_symbols(
            words,
            starts,
            bits_l,
            jnp.full((L,), 1 << 30, i32),  # absolute positions checked later
            active,
            jnp.zeros((L,), i32),
            t[0], t[1], t[2], t[3],
            max_steps=max_steps,
            bit_stop=stops,
            chain=chain,
            stream_row=srow,
            litlen_first=t[4],
            lut_matmul=lut_matmul,
        )
        out, produced, ok = indexed_materialize(
            records, jnp.where(active, status, I._STOPPED), starts, C,
            out_capacity=N, ptr_rounds=ptr_rounds,
        )
        ck = jax.vmap(adler32_jax)(out, produced)
        ck_ok = ck == adler
        return out, produced, ok, ck_ok

    return step
