"""Foreign-stream block-boundary discovery + block-parallel decode (P2).

Chunk-parallel decode of zlib streams that carry NO side-channel index — the
rapidgzip approach (PAPERS.md): every bit offset is screened as a possible
dynamic-block header, candidates are validated in two vectorized stages, the
surviving (almost surely real) headers become decode-lane entry points, and a
host chain-walk splices the lanes whose exits line up.  Huffman
self-synchronization is never assumed (it fails on run-structured streams,
PERF_NOTES.md) — only *structural header validation*, which false-positives
at ~1e-5 per bit after stage 2.

Stage 1 (vectorized over every bit offset): BTYPE==dynamic, HLIT/HDIST
bounds, and an exact Kraft-completeness check of the 19-symbol code-length
(CL) tree.  Measured pass rate ~0.1% of offsets.  Runs as shifted-slice
elementwise XLA on TPU backends (`scan_stage1_device`) or numpy elsewhere.

Stage 2 (vectorized over stage-1 survivors): fully decode the CL-coded
lengths section with per-candidate canonical decode parameters, tracking
litlen/dist Kraft sums incrementally; require litlen exactly complete with
a nonzero end-of-block code, and the distance tree exactly complete or
degenerate (<= 1 code, reference semantics src/huffman.rs:40-59).  Runs as
the header-validation Pallas kernel on TPU (`validate_stage2_device`,
one lane per candidate) or numpy elsewhere; the numpy form is the oracle.

Chain decode: one kernel lane per surviving candidate (plus the known first
block), each decoding its block's records until end-of-block (window
restages let blocks larger than one staged window resume); a lane whose EOB
exit equals the next confirmed header's offset hands the chain on.  Streams
the chain cannot cover (stored/fixed blocks, false boundaries, budget
overruns) fall back to the sequential host/device path.  `try_foreign_batch`
merges many streams' blocks into shared launches.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from .. import errors as E
from ..ops import inflate as I

_MAXCL = 7  # CL codes are at most 7 bits


def _fields(bits, offs, k, w):
    v = np.zeros(len(offs), np.int32)
    for j in range(w):
        v |= bits[offs + k + j] << j
    return v


def scan_stage1(payload: bytes, min_tail_bits: int = 400) -> np.ndarray:
    """Bit offsets passing the vectorized dynamic-header screen."""
    bits = np.unpackbits(
        np.frombuffer(payload, np.uint8), bitorder="little"
    ).astype(np.int32)
    n = len(bits)
    if n <= min_tail_bits:
        return np.zeros(0, np.int64)
    offs = np.arange(0, n - min_tail_bits, dtype=np.int64)
    cand = offs[(bits[offs + 1] == 0) & (bits[offs + 2] == 1)]
    hlit = _fields(bits, cand, 3, 5)
    hdist = _fields(bits, cand, 8, 5)
    cand = cand[(hlit <= 29) & (hdist <= 29)]
    ncl = _fields(bits, cand, 13, 4) + 4
    kraft = np.zeros(len(cand), np.int64)
    nz = np.zeros(len(cand), np.int32)
    for j in range(19):
        cl = _fields(bits, cand, 17 + 3 * j, 3)
        use = (j < ncl) & (cl > 0)
        kraft += np.where(use, 1 << (_MAXCL - cl), 0)
        nz += use
    return cand[(kraft == (1 << _MAXCL)) & (nz >= 2)]


# DEFLATE order of code-length code lengths (RFC 1951 3.2.7).
_CLCL = np.array(
    [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15],
    np.int64,
)


def validate_stage2(payload: bytes, cands: np.ndarray, chunk: int = 65536):
    """Decode each candidate's CL-coded lengths section; keep structurally
    valid headers.  Returns (offsets, header_end_bits) — both int64 arrays,
    sorted.  Vectorized over candidates in chunks.

    The ~320-step decode loop reads the stream through a precomputed 7-bit
    lookahead table (one int16 per bit offset, built with shifted slices):
    2 gathers per step instead of 14 bit gathers, all bookkeeping int32.
    """
    bits = np.unpackbits(
        np.frombuffer(payload, np.uint8), bitorder="little"
    ).astype(np.int32)
    n = len(bits)
    # v7_all[p] = the 7 bits at offset p (zeros past the end).
    bits8 = np.unpackbits(
        np.frombuffer(payload, np.uint8), bitorder="little")
    bp = np.concatenate([bits8, np.zeros(16, np.uint8)]).astype(np.int16)
    v7_all = np.zeros(n + 8, np.int16)
    for j in range(7):
        v7_all += bp[j : j + n + 8] << j
    keep_off = []
    keep_end = []
    for lo in range(0, len(cands), chunk):
        c = cands[lo : lo + chunk]
        K = len(c)
        if K == 0:
            continue
        hlit = _fields(bits, c, 3, 5).astype(np.int32) + 257
        hdist = _fields(bits, c, 8, 5).astype(np.int32) + 1
        ncl = _fields(bits, c, 13, 4).astype(np.int32) + 4
        cl = np.zeros((K, 19), np.int32)  # indexed by symbol (0..18)
        for j in range(19):
            v = _fields(bits, c, 17 + 3 * j, 3)
            sym = _CLCL[j]
            cl[:, sym] = np.where(j < ncl, v, 0)

        # Per-candidate canonical decode parameters for the CL tree.
        cnt = np.zeros((K, _MAXCL + 1), np.int32)
        for L in range(1, _MAXCL + 1):
            cnt[:, L] = (cl == L).sum(axis=1)
        first = np.zeros((K, _MAXCL + 1), np.int32)
        code = np.zeros(K, np.int32)
        bound = np.zeros((K, _MAXCL + 1), np.int32)
        off = np.zeros((K, _MAXCL + 1), np.int32)
        acc = np.zeros(K, np.int32)
        for L in range(1, _MAXCL + 1):
            first[:, L] = code
            bound[:, L] = (code + cnt[:, L]) << (_MAXCL - L)
            off[:, L] = acc
            acc += cnt[:, L]
            code = (code + cnt[:, L]) << 1
        kval = off - first
        order = np.argsort(
            np.where(cl > 0, cl, 99) * 32 + np.arange(19)[None, :],
            axis=1, kind="stable",
        ).astype(np.int32)  # (length, symbol) order; unused symbols last

        rev7 = np.array(
            [int(format(x, "07b")[::-1], 2) for x in range(128)], np.int32
        )

        pos = c.astype(np.int64) + 17 + 3 * ncl
        total = hlit + hdist
        written = np.zeros(K, np.int32)
        prev = np.zeros(K, np.int32)
        kraft_l = np.zeros(K, np.int32)
        kraft_d = np.zeros(K, np.int32)
        nz_d = np.zeros(K, np.int32)
        len256 = np.zeros(K, np.int32)
        bad = np.zeros(K, bool)

        def add_lengths(value, start, count):
            """Accumulate Kraft/bookkeeping for `count` slots of `value`."""
            nonlocal kraft_l, kraft_d, nz_d, len256
            l_cnt = np.clip(np.minimum(start + count, hlit) - start, 0, None)
            d_cnt = count - l_cnt
            nzv = value > 0
            kl = np.where(nzv, (1 << (15 - value)) * l_cnt, 0)
            kd = np.where(nzv, (1 << (15 - value)) * d_cnt, 0)
            kraft_l += kl
            kraft_d += kd
            nz_d += np.where(nzv, d_cnt, 0)
            hit256 = (start <= 256) & (256 < start + count) & (hlit > 256)
            len256 = np.where(hit256, value, len256)

        for _step in range(320):
            live = ~bad & (written < total)
            if not live.any():
                break
            p = np.where(live, pos, 0)
            v7 = v7_all[np.minimum(p, n)].astype(np.int32)
            r7 = rev7[v7]
            L = np.ones(K, np.int32)
            for l in range(1, _MAXCL):
                L += (r7 >= bound[:, l]) & (bound[:, l] < (1 << _MAXCL))
            # bound rows are monotone; cap by lengths that exist
            idx = np.take_along_axis(kval, L[:, None], 1)[:, 0] + (
                r7 >> (_MAXCL - L)
            )
            idx_ok = (idx >= 0) & (idx < 19)
            sym = np.take_along_axis(
                order, np.clip(idx, 0, 18)[:, None], 1
            )[:, 0]
            slen = np.take_along_axis(cl, sym[:, None], 1)[:, 0]
            valid = idx_ok & (slen == L)
            bad |= live & ~valid

            is_plain = sym <= 15
            base = np.where(sym == 16, 3, np.where(sym == 17, 3, 11))
            ebits = np.where(sym == 16, 2, np.where(sym == 17, 3, 7))
            ev = v7_all[np.minimum(p + L, n)].astype(np.int32) & (
                (1 << ebits) - 1
            )
            rep = np.where(is_plain, 1, base + ev)
            value = np.where(is_plain, sym, np.where(sym == 16, prev, 0))
            bad |= live & (sym == 16) & (written == 0)
            bad |= live & (written + rep > total)

            act = live & ~bad
            add_lengths(
                np.where(act, value, 0),
                np.where(act, written, 0),
                np.where(act, rep, 0),
            )
            prev = np.where(act & is_plain, sym, prev)
            written = np.where(act, written + rep, written)
            pos = np.where(act, pos + L + np.where(is_plain, 0, ebits), pos)
            bad |= live & (pos + 7 >= n)

        done = ~bad & (written == total)
        good = (
            done
            & (kraft_l == (1 << 15))
            & (len256 > 0)
            & ((kraft_d == (1 << 15)) | (nz_d <= 1))
        )
        keep_off.append(c[good])
        keep_end.append(pos[good])
    if not keep_off:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(keep_off), np.concatenate(keep_end)


@functools.lru_cache(maxsize=6)
def _jit_stage1(NB: int, M: int):
    """Jitted stage-1 screen over every bit offset.

    Pure shifted-slice elementwise math over an int8 bit array — no
    gathers (a per-offset gather formulation would cost ~9 cycles/elem
    through XLA; slices are bandwidth-speed).  Returns the first M
    passing offsets (on-device cumsum compaction) plus the total count.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(bytes_d, n_bits):
        i32 = jnp.int32
        bits8 = (bytes_d[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
        bits = bits8.reshape(-1).astype(jnp.int8)  # [8*nb], nb*8 >= NB+96

        def sl(k):
            return jax.lax.slice(bits, (k,), (k + NB,))

        ok = (sl(1) == 0) & (sl(2) == 1)
        hlit = jnp.zeros(NB, i32)
        for j in range(5):
            hlit = hlit | (sl(3 + j).astype(i32) << j)
        hdist = jnp.zeros(NB, i32)
        for j in range(5):
            hdist = hdist | (sl(8 + j).astype(i32) << j)
        ok = ok & (hlit <= 29) & (hdist <= 29)
        ncl = jnp.zeros(NB, i32)
        for j in range(4):
            ncl = ncl | (sl(13 + j).astype(i32) << j)
        ncl = ncl + 4
        kraft = jnp.zeros(NB, i32)
        nz = jnp.zeros(NB, i32)
        for j in range(19):
            cl = (sl(17 + 3 * j).astype(i32)
                  | (sl(18 + 3 * j).astype(i32) << 1)
                  | (sl(19 + 3 * j).astype(i32) << 2))
            use = (j < ncl) & (cl > 0)
            kraft = kraft + jnp.where(use, 1 << (_MAXCL - cl), 0)
            nz = nz + use.astype(i32)
        ok = ok & (kraft == (1 << _MAXCL)) & (nz >= 2)
        ok = ok & (jnp.arange(NB, dtype=i32) < n_bits)

        csum = jnp.cumsum(ok.astype(i32))
        pos = jnp.where(ok, csum - 1, M)
        out = jnp.zeros(M, i32).at[pos].set(
            jnp.arange(NB, dtype=i32), mode="drop")
        return out, csum[-1]

    return run


def scan_stage1_device(payload: bytes, min_tail_bits: int = 400):
    """Device-side stage-1 screen (vs the numpy `scan_stage1`): ~elementwise
    bandwidth on TPU where the host scan costs ~1 us/bit.  Returns the same
    sorted candidate offsets."""
    n_bits = len(payload) * 8 - min_tail_bits
    if n_bits <= 0:
        return np.zeros(0, np.int64)
    # Bucket the padded size so the jit cache stays small.
    NB = max(1 << 16, 1 << (n_bits - 1).bit_length())
    nb_bytes = (NB + 96) // 8 + 16
    M = max(4096, NB // 128)  # ~0.8% slots vs ~0.1% measured pass rate
    buf = np.zeros(nb_bytes, np.uint8)
    buf[: len(payload)] = np.frombuffer(payload, np.uint8)
    out, count = _jit_stage1(NB, M)(buf, np.int32(n_bits))
    count = int(np.asarray(count))
    if count > M:  # overflow: fall back to the exact host scan
        return scan_stage1(payload, min_tail_bits)
    return np.sort(np.asarray(out)[:count]).astype(np.int64)


@functools.lru_cache(maxsize=6)
def _jit_stage2(LB: int):
    """Jitted (window gather -> header-validation kernel)."""
    import jax
    import jax.numpy as jnp

    from ..ops import pallas_inflate as PI

    wwin = PI._VAL_WWIN

    @jax.jit
    def run(words_d, starts_d, pos0_d, relend_d, act_d):
        words_ext = jnp.concatenate([words_d, jnp.zeros((1,), jnp.int32)])
        idx = jnp.minimum(
            starts_d.reshape(LB, 1, 8, 128)
            + jnp.arange(wwin, dtype=jnp.int32).reshape(1, wwin, 1, 1),
            words_d.shape[0],
        )
        win = jnp.take(words_ext, idx, axis=0)
        return PI.validate_headers_blocked(win, pos0_d, relend_d, act_d)

    return run


def validate_stage2_device(payload: bytes, cands: np.ndarray,
                           words_dev=None):
    """Device-side stage 2: one kernel lane per candidate (the ~320-step
    CL-section decode that costs ~2 s/8 MiB in numpy).  Same results as
    `validate_stage2` (the numpy oracle)."""
    L = len(cands)
    if L == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    import jax.numpy as jnp

    if words_dev is None:
        words_dev = stage_words(payload)
    n_bits = len(payload) * 8
    LB = (L + 1023) // 1024
    nlanes = LB * 1024

    start_w = np.zeros(nlanes, np.int32)
    pos0 = np.zeros(nlanes, np.int32)
    relend = np.zeros(nlanes, np.int32)
    act = np.zeros(nlanes, np.int32)
    start_w[:L] = (cands >> 5).astype(np.int32)
    pos0[:L] = (cands & 31).astype(np.int32)
    relend[:L] = (n_bits - (cands >> 5) * 32).astype(np.int32)
    act[:L] = 1

    def blocked1(a):  # [nlanes] -> [LB, 8, 128]
        return np.ascontiguousarray(a.reshape(LB, 8, 128))

    good, end = _jit_stage2(LB)(
        words_dev,
        jnp.asarray(blocked1(start_w)),
        jnp.asarray(blocked1(pos0)),
        jnp.asarray(blocked1(relend)),
        jnp.asarray(blocked1(act)),
    )
    good_np = np.asarray(good).reshape(nlanes)[:L] != 0
    end_np = np.asarray(end).reshape(nlanes)[:L].astype(np.int64)
    offs = cands[good_np]
    ends = end_np[good_np] + (offs >> 5) * 32
    return offs.astype(np.int64), ends


def find_block_boundaries(payload: bytes, words_dev=None):
    """Full scan: (offsets, header_end_bits) of validated dynamic headers.

    On TPU backends both stages run on the accelerator: stage 1 (the
    per-bit-offset structural screen) as shifted-slice elementwise XLA,
    stage 2 (full CL-section decode of the ~0.1% survivors) as the
    header-validation Pallas kernel.  On other backends both stages are
    vectorized numpy/jitted-CPU.
    """
    import jax

    if jax.default_backend() == "tpu":
        c1 = scan_stage1_device(payload)
        return validate_stage2_device(payload, c1, words_dev=words_dev)
    c1 = scan_stage1(payload)
    return validate_stage2(payload, c1)


def decompress_foreign(data: bytes, max_steps: int = 6144) -> bytes:
    """Block-parallel decode of a foreign (un-indexed) zlib stream.

    Discovers dynamic-block headers structurally, decodes every candidate
    block in its own device lane until end-of-block, then chain-walks on the
    host: block k is confirmed when its EOB exit is exactly the next
    confirmed header's offset.  Any break in the chain (stored/fixed blocks,
    a block larger than the step budget, a false boundary) falls back to the
    sequential path for the whole stream — correctness never depends on the
    discovery.  The final Adler-32 is always verified.
    """

    def fallback() -> bytes:
        r = I.decompress_batch(
            [data], max_steps=max_steps, try_parallel=False
        )[0]
        if isinstance(r, E.DecompressionError):
            raise r
        return r

    if len(data) >= 7:
        cmf, flg = data[0], data[1]
        if cmf & 0x0F != 0x08 or ((cmf << 8) | flg) % 31 != 0 or flg & 0x20:
            raise E.BadZlibHeader()
    r = try_foreign(data, max_steps=max_steps)
    return r if r is not None else fallback()


def _scan_parse(data: bytes, words_dev=None):
    """zlib header check + boundary scan + per-candidate header parse.

    Returns the lane list [(off, bfinal, sym_start, lengths, hlit)] —
    sorted by offset, first lane at bit 16 — or None when the stream
    cannot enter the block-parallel path.
    """
    if len(data) < 7:
        return None
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 0x08 or ((cmf << 8) | flg) % 31 != 0 or flg & 0x20:
        return None

    offsets, _hdr_ends = find_block_boundaries(data, words_dev=words_dev)
    if 16 not in set(offsets.tolist()):
        return None  # first block not dynamic (stored/fixed)

    lanes = []
    for off in offsets.tolist():
        r = I._HostBitReader(data, off)
        bfinal = r.take(1)
        btype = r.take(2)
        if btype != 0b10:
            continue
        try:
            lengths, hlit = I._parse_dynamic_lengths(r)
        except E.DecompressionError:
            continue
        lanes.append((off, bool(bfinal), r.pos, lengths, hlit))
    if not lanes or lanes[0][0] != 16:
        return None
    return lanes


def try_foreign(data: bytes, max_steps: int = 6144,
                engine: str = "auto", words_dev=None,
                return_device: bool = False, materialize: str | None = None):
    """`decompress_foreign` without the fallback: bytes on a confirmed,
    checksum-verified chain decode; None when the stream needs the
    sequential path.  A handful of decode launches (window restages for
    blocks larger than one staged window) + one materialize launch total.

    ``engine`` selects the symbol-phase decoder: "pallas" runs the
    canonical record kernel (ops/pallas_inflate — per-lane runtime trees,
    ~13 ns/lane-step), "xla" the table-gather ``decode_symbols`` loop,
    "auto" picks pallas on TPU backends and xla elsewhere (the kernel's
    interpret mode is far too slow for production CPU decode).

    ``words_dev`` (pallas engine): pre-uploaded little-endian i32 stream
    words (`stage_words`), so repeat decodes of one stream skip the
    host->device payload transfer.  ``return_device=True`` keeps the
    result on device — returns (out u8[1, cap], produced int) with the
    Adler-32 verified ON DEVICE (only the checksum scalar reads back)
    instead of downloading the output bytes.
    """
    import zlib

    import jax
    import jax.numpy as jnp

    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "xla"

    lanes = _scan_parse(data, words_dev=words_dev)
    if lanes is None:
        return None

    L = len(lanes)
    if engine == "pallas":
        decoded = _pallas_lane_decode(data, lanes, max_steps,
                                      words_dev=words_dev)
        if decoded is None:
            return None
        records, raw_recs, bpos_np, eob_np, lane_adv = decoded
    else:
        records, bpos_np, eob_np = _xla_lane_decode(data, lanes, max_steps)
        raw_recs = None
        lane_adv = None

    # Chain walk: confirm blocks whose EOB exit is the next header's start.
    by_off = {off: i for i, (off, *_rest) in enumerate(lanes)}
    chain: list[int] = []
    cur = 16
    final_exit = None
    while True:
        i = by_off.get(cur)
        if i is None or not eob_np[i]:
            return None
        chain.append(i)
        if lanes[i][1]:  # BFINAL
            final_exit = int(bpos_np[i])
            break
        cur = int(bpos_np[i])

    if materialize is None:
        materialize = os.environ.get("FDN_FOREIGN_MATERIALIZE", "device")
    if (materialize == "host" and raw_recs is not None
            and not return_device):
        # Consumer-side materialization: the kernel did the parallel symbol
        # phase; the memcpy-bound LZ77 expansion runs on the host that
        # consumes the bytes (native/fdeflate_native.cpp fdn_materialize).
        from ..models import native as N

        cols = jnp.asarray(np.asarray(chain, np.int32))
        raw_chain = jnp.take(raw_recs, cols, axis=1)  # [K, n] chain order
        flat = np.asarray(jnp.transpose(raw_chain).reshape(-1))
        kind = (flat >> 28) & 0xF
        pay = flat & 0x0FFFFFFF
        adv = np.where(kind == 1, (pay >> 16) & 3,
                       np.where(kind == 2, ((pay >> 15) & 0xFF) + 3, 0))
        result = N.materialize_records(flat, int(adv.sum()))
        if result is not None:
            tb = (final_exit + 7) & ~7
            stored = int.from_bytes(data[tb // 8 : tb // 8 + 4], "big")
            if stored == zlib.adler32(result):
                return result
        return None  # malformed records / no native backend

    # Stitch: mask non-chain lanes inert, keep lane order (offsets sorted),
    # rearrange [K, L] -> [L*K, 1] and materialize once.  The whole block —
    # mask, bad-dist check, materialize, on-device Adler — runs as ONE
    # jitted program (round 2 dispatched its ~100 jnp ops eagerly, each
    # paying this platform's ~30 ms launch floor: the 0.003 GB/s foreign
    # number was mostly dispatch).  Capacity comes from the decode
    # launches' per-lane byte counts, so no record readback is needed.
    K = records[0].shape[0]
    mask_np = np.zeros(L, bool)
    mask_np[chain] = True
    if lane_adv is None:
        rc_, rn_ = records[2], records[3]
        lane_adv = np.asarray(
            jnp.sum(rc_.astype(jnp.int32) + rn_, axis=0)).astype(np.int64)
    produced = int(lane_adv[mask_np].sum())
    cap = _cap_bucket(produced)

    out, ck, bad_dist = _jit_stitch(K, L, cap)(
        *records[:5], jnp.asarray(mask_np), jnp.int32(produced))

    # Trailer: byte-align after the final block, 4 bytes big-endian.
    tb = (final_exit + 7) & ~7
    stored = int.from_bytes(data[tb // 8 : tb // 8 + 4], "big")
    if return_device:
        # Device-resident contract: verify the checksum ON DEVICE; only two
        # scalars read back over the (slow) host link.
        if bool(np.asarray(bad_dist)) or stored != int(np.asarray(ck)):
            return None
        return out, produced
    if bool(np.asarray(bad_dist)):
        return None
    result = np.asarray(out)[0, :produced].tobytes()
    if stored != zlib.adler32(result):
        return None  # chain was structurally plausible but wrong
    return result


def _cap_bucket(produced: int) -> int:
    """Materialize capacity bucket: {1, 1.5} * 2^k covering ``produced``.

    Every materialize pass is output-capacity-sized, so pure power-of-two
    bucketing wastes up to 2x on streams just past a boundary (an 8.4 MB
    output would pay 16.8M-element passes); the extra 1.5*2^k bucket caps
    the overshoot at 33% for one more compile-cache entry per octave.
    """
    produced = max(produced, 256)
    p2 = 1 << int(np.ceil(np.log2(produced)))
    if 3 * p2 // 4 >= produced:
        return 3 * p2 // 4
    return p2


@functools.lru_cache(maxsize=16)
def _jit_stitch(K: int, L: int, cap: int):
    """One-program stitch: mask chain lanes, validate distances,
    materialize, Adler-32 — scalars + output stay on device."""
    import jax
    import jax.numpy as jnp

    from ..ops.adler32 import adler32_jax

    @jax.jit
    def run(rl, rlh, rc, rn, rd, mask, produced):
        m = mask[None, :]
        rl = jnp.where(m, rl, 0)
        rlh = jnp.where(m, rlh, 0)
        rc = jnp.where(m, rc, 0)
        rn = jnp.where(m, rn, 0)
        rd = jnp.where(m, rd, 0)

        def rearrange(a):
            return a.T.reshape(L * K, 1)

        rl2, rlh2, rc2, rn2, rd2 = map(rearrange, (rl, rlh, rc, rn, rd))
        adv = rc2.astype(jnp.int32) + rn2
        pos = jnp.cumsum(adv, axis=0) - adv
        bad_dist = jnp.any((rd2 > 0) & (rd2 > pos))
        out, _ = I.materialize(
            (rl2, rlh2, rc2, rn2, rd2),
            jnp.zeros((1, I.WINDOW), jnp.uint8),
            produced[None],
            out_capacity=cap,
            want_window=False,
            max_lit_bytes=2,  # foreign records pack <= 2 literals
        )
        ck = adler32_jax(out[0], length=produced)
        return out, ck, bad_dist

    return run


def try_foreign_batch(streams: list[bytes], max_steps: int = 6144,
                      engine: str = "auto"):
    """Block-parallel decode of MANY foreign streams in shared launches.

    Per-stream `try_foreign` leaves most kernel lanes idle (a 1 MiB stream
    has ~10 blocks vs the 1024 lanes of one lane-block); this merges every
    stream's discovered blocks into one global lane list, decodes them in
    shared kernel launches against the concatenated stream words, then
    chain-walks and materializes per stream (one materialize for all
    confirmed streams).  Returns, per stream, the decompressed bytes or
    None (caller falls back for that stream).
    """
    import zlib

    import jax
    import jax.numpy as jnp

    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "xla"
    S = len(streams)
    if engine != "pallas" or S <= 1:
        return [try_foreign(s, max_steps=max_steps, engine=engine)
                for s in streams]

    results: list[bytes | None] = [None] * S

    padded = [s + bytes((-len(s)) % 4) + bytes(8) for s in streams]
    word_base = np.zeros(S + 1, np.int64)
    word_base[1:] = np.cumsum([len(p) // 4 for p in padded])
    words_dev = jnp.asarray(
        np.frombuffer(b"".join(padded), "<u4").astype(np.int32))

    glanes = []           # global lanes, stream-major
    lane_range = {}       # si -> (lo, hi) into glanes
    for si, s in enumerate(streams):
        lanes = _scan_parse(
            s, words_dev=words_dev[word_base[si]:word_base[si + 1]])
        if lanes is None:
            continue
        lo = len(glanes)
        gbase = int(word_base[si]) * 32
        for off, bfinal, sym_start, lengths, hlit in lanes:
            glanes.append((off, bfinal, gbase + sym_start, lengths, hlit))
        lane_range[si] = (lo, len(glanes))
    if not glanes:
        return results

    decoded = _pallas_lane_decode(b"", glanes, max_steps,
                                  words_dev=words_dev)
    if decoded is None:
        return results
    records, _raw, bpos_np, eob_np, lane_adv = decoded
    L_all = len(glanes)
    K = records[0].shape[0]

    # Per-stream chain walks (bit positions converted back to local).
    mask_np = np.zeros(L_all, bool)
    finals = {}  # si -> final_exit local bit position
    for si, (lo, hi) in lane_range.items():
        gbase = int(word_base[si]) * 32
        by_off = {glanes[i][0]: i for i in range(lo, hi)}
        chain = []
        cur = 16
        while True:
            i = by_off.get(cur)
            if i is None or not eob_np[i]:
                chain = None
                break
            chain.append(i)
            if glanes[i][1]:  # BFINAL
                finals[si] = int(bpos_np[i]) - gbase
                break
            cur = int(bpos_np[i]) - gbase
        if chain:
            mask_np[chain] = True
        else:
            finals.pop(si, None)
    confirmed = sorted(finals.keys())
    if not confirmed:
        return results
    Sc = len(confirmed)

    # Stitch: lane-major flatten; stream si's records are the contiguous
    # flat range [lo*K, hi*K); pad columns to the widest stream.  One
    # jitted program (mask, column gather, bad-dist check, materialize) —
    # the eager formulation paid this platform's ~30 ms dispatch floor
    # per op.  Capacity/column sizes come from the decode launches'
    # per-lane byte counts, so nothing reads back before the launch.
    lo_np = np.array([lane_range[si][0] for si in confirmed], np.int32)
    width_np = np.array(
        [(lane_range[si][1] - lane_range[si][0]) * K for si in confirmed],
        np.int32)
    Kcol = 1 << int(np.ceil(np.log2(max(int(width_np.max()), 16))))
    produced_np = np.zeros(Sc, np.int64)
    for ci, si in enumerate(confirmed):
        lo, hi = lane_range[si]
        sel = mask_np[lo:hi]
        produced_np[ci] = lane_adv[lo:hi][sel].sum()
    cap = _cap_bucket(int(produced_np.max()))

    out, bad = _jit_stitch_batch(K, L_all, Sc, Kcol, cap)(
        *records[:5], jnp.asarray(mask_np), jnp.asarray(lo_np),
        jnp.asarray(width_np), jnp.asarray(produced_np.astype(np.int32)))
    bad = np.asarray(bad)
    out_np = np.asarray(out)

    for ci, si in enumerate(confirmed):
        if bad[ci]:
            continue
        data = streams[si]
        result = out_np[ci, : produced_np[ci]].tobytes()
        tb = (finals[si] + 7) & ~7
        stored = int.from_bytes(data[tb // 8 : tb // 8 + 4], "big")
        if stored == zlib.adler32(result):
            results[si] = result
    return results


@functools.lru_cache(maxsize=16)
def _jit_stitch_batch(K: int, L_all: int, Sc: int, Kcol: int, cap: int):
    """Batched stitch: per-stream record columns -> materialized outputs."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(rl, rlh, rc, rn, rd, mask, lo, width, produced):
        m = mask[None, :]
        rl = jnp.where(m, rl, 0)
        rc = jnp.where(m, rc, 0)
        rn = jnp.where(m, rn, 0)
        rd = jnp.where(m, rd, 0)

        ks = jnp.arange(Kcol, dtype=jnp.int32)[:, None]
        valid = ks < width[None, :]
        idx = jnp.where(valid, lo[None, :] * K + ks, L_all * K)

        def columns(a):
            flat = jnp.concatenate(
                [a.T.reshape(-1), jnp.zeros((1,), a.dtype)])
            return jnp.take(flat, idx, axis=0)

        rl2, rlh2, rc2, rn2, rd2 = (
            columns(rl), columns(rlh), columns(rc), columns(rn),
            columns(rd))
        adv = rc2.astype(jnp.int32) + rn2
        pos = jnp.cumsum(adv, axis=0) - adv
        bad = jnp.any((rd2 > 0) & (rd2 > pos), axis=0)
        prod_ok = jnp.where(bad, 0, produced)
        out, _ = I.materialize(
            (rl2, rlh2, rc2, rn2, rd2),
            jnp.zeros((Sc, I.WINDOW), jnp.uint8),
            prod_ok,
            out_capacity=cap,
            want_window=False,
            max_lit_bytes=2,
        )
        return out, bad

    return run


def _xla_lane_decode(data: bytes, lanes, max_steps: int):
    """Decode every candidate lane with the XLA table-gather loop.

    Returns (records (rl, rlh, rc, rn, rd) each [K, L], bpos i64[L],
    eob bool[L]).
    """
    import jax.numpy as jnp

    L = len(lanes)
    # Real zlib blocks run to 16384 symbols (one decode step per match);
    # a short budget would decode every lane and then fail the chain walk,
    # wasting the whole launch.  decode_symbols early-exits once all lanes
    # finish, so the bigger budget costs only record memory.
    max_steps = max(max_steps, 18432)
    Wmax = (len(data) + 3) // 4 + 2
    words_np = np.zeros((1, Wmax), np.uint32)
    padded = data + bytes((-len(data)) % 4) + bytes(8)
    words_np[0, : len(padded) // 4] = np.frombuffer(padded, "<u4")

    # Build + stack reference-format tables (blocks rarely share trees).
    tables = []
    for off, bfinal, sym_start, lengths, hlit in lanes:
        tables.append(I._tables_from_lengths(lengths, hlit))
    sec_max = max(max(len(t[1]) for t in tables), 1)
    dsec_max = max(max(len(t[3]) for t in tables), 1)
    from ..tables import DEFAULT_DIST_TABLE_SIZE, DEFAULT_LITLEN_TABLE_SIZE

    litlen_np = np.zeros((L, DEFAULT_LITLEN_TABLE_SIZE), np.uint32)
    sec_np = np.zeros((L, sec_max), np.uint32)
    dist_np = np.zeros((L, DEFAULT_DIST_TABLE_SIZE), np.uint32)
    dsec_np = np.zeros((L, dsec_max), np.uint32)
    starts = np.zeros(L, np.int32)
    for i, ((off, bfinal, sym_start, _le, _hl), (ll, ls, dd, ds)) in enumerate(
            zip(lanes, tables)):
        litlen_np[i] = ll
        sec_np[i, : len(ls)] = ls
        dist_np[i] = dd
        dsec_np[i, : len(ds)] = ds
        starts[i] = sym_start

    bit_end = np.int32(len(data) * 8)
    records, (bpos, opos, status) = I.decode_symbols(
        jnp.asarray(words_np),
        jnp.asarray(starts),
        jnp.full((L,), bit_end, jnp.int32),
        jnp.full((L,), 1 << 30, jnp.int32),
        jnp.ones((L,), bool),
        jnp.arange(L, dtype=jnp.int32),
        jnp.asarray(litlen_np),
        jnp.asarray(sec_np),
        jnp.asarray(dist_np),
        jnp.asarray(dsec_np),
        max_steps=max_steps,
        chain=4,
        stream_row=jnp.zeros((L,), jnp.int32),
    )
    return (records[:5], np.asarray(bpos),
            np.asarray(status) == I._EOB)


# Words of compressed block staged per lane per launch.  Bounds the kernel's
# VMEM working set (wwin * 4 KiB per lane-block); blocks bigger than one
# window freeze at the edge and resume from a re-staged window.  Tunable for
# hardware sweeps (smaller windows allow R-way lane-block interleaving).
_WWIN_CAP = int(os.environ.get("FDN_FOREIGN_WWIN", "6144"))


@functools.lru_cache(maxsize=16)
def _jit_pallas_lanes(LB: int, L: int, wwin: int, K: int):
    """Jitted (window gather -> record kernel -> unpack -> mask)."""
    import jax
    import jax.numpy as jnp

    from ..ops import pallas_inflate as PI

    nlanes = LB * 1024

    @jax.jit
    def run(words_d, starts_d, pos0_d, meta_d, tab_d, active_d):
        win = _stage_windows(words_d, starts_d, LB, wwin)
        recs, bpos, done = PI.decode_records_blocked(
            win, pos0_d, meta_d, tab_d, K=K)
        # step-major [K, nlanes] records for the stitcher; lanes already
        # finished in an earlier launch decode garbage -> mask them inert
        recs_t = jnp.transpose(recs, (1, 0, 2, 3)).reshape(K, nlanes)
        recs_t = jnp.where(active_d[None, :], recs_t[:, :L], 0)
        records = PI.recs_to_records(recs_t)
        # Per-lane output bytes this launch: lets the host size the
        # materialize capacity without an extra eager record reduction.
        rl, rlh, rc, rn, rd = records[:5]
        lane_adv = jnp.sum(rc.astype(jnp.int32) + rn, axis=0)
        return (records, recs_t, bpos.reshape(nlanes),
                done.reshape(nlanes), lane_adv)

    return run


def _stage_windows(words_d, starts_d, LB: int, wwin: int):
    """Per-lane decode windows from flat stream words (slab DMA on TPU;
    see ops/repack.stage_windows_flat)."""
    import jax.numpy as jnp

    from ..ops.repack import SLAB, stage_windows_flat

    i32 = jnp.int32
    flat = jnp.concatenate(
        [words_d, jnp.zeros((wwin + 3 * SLAB,), i32)])
    return stage_windows_flat(flat, starts_d.reshape(-1), LB, wwin)


def stage_words(data: bytes):
    """Upload a stream's little-endian i32 words once for repeated
    `try_foreign(..., words_dev=...)` calls."""
    import jax.numpy as jnp

    padded = data + bytes((-len(data)) % 4) + bytes(8)
    return jnp.asarray(np.frombuffer(padded, "<u4").astype(np.int32))


def _pallas_lane_decode(data: bytes, lanes, max_steps: int, words_dev=None):
    """Decode every candidate lane with the canonical record kernel.

    One kernel launch decodes every block in its own lane (per-lane runtime
    trees); the stream words upload ONCE and the per-lane bit windows are
    gathered on-device.  Returns the same triple as `_xla_lane_decode`
    (records [K, L], absolute bit positions, EOB flags), or None when the
    geometry exceeds the kernel's bounds (a block compressed bigger than
    `_WWIN_CAP` words, or a lane that would need more record slots than
    the budget allows) — the caller falls back.
    """
    import jax
    import jax.numpy as jnp

    from ..ops import pallas_inflate as PI

    L = len(lanes)
    LB = (L + 1023) // 1024
    nlanes = LB * 1024
    # decode_symbols emits up to 8 literals (4 double-literal entries) per
    # step; the record kernel at most 2 — give it 4x the slots, bounded.
    K = min(65536, max(16, 4 * max_steps))
    K += (-K) % 16

    if words_dev is None:
        words_dev = stage_words(data)
    W = words_dev.shape[0]
    # Bucket the window size (power of two up to the cap): every distinct
    # kernel shape costs a fresh Mosaic compile (~20-60 s over this
    # accelerator tunnel), so shape keys must not track stream sizes.
    wwin = min(1 << max(6, (W + 7).bit_length()), _WWIN_CAP)
    wwin += (-wwin) % 8

    start_word = np.zeros(nlanes, np.int32)
    pos0 = np.zeros((nlanes,), np.int32)
    metas = np.zeros((nlanes, 64), np.int32)
    tabs = np.zeros((nlanes, PI._TPAIRS), np.int32)
    for i, (off, bfinal, sym_start, lengths, hlit) in enumerate(lanes):
        start_word[i] = sym_start >> 5
        pos0[i] = sym_start & 31
        try:
            metas[i], tabs[i] = PI.foreign_meta(
                lengths[:hlit], lengths[288:320])
        except ValueError:
            return None  # incomplete tree the structural scan let through

    def blocked(a):  # [nlanes, rows] -> [LB, rows, 8, 128]
        return np.ascontiguousarray(
            a.reshape(LB, 8, 128, -1).transpose(0, 3, 1, 2))

    meta_d = jnp.asarray(blocked(metas))
    tab_d = jnp.asarray(blocked(tabs))

    # Multi-launch resume: blocks compressed bigger than one staged window
    # freeze in-kernel at the window edge keeping their exact bit position
    # (pallas_inflate stop_bits); each round re-stages windows at the
    # current positions and the per-launch record planes concatenate.
    # Power-of-two launch budget: one executable per (LB, wwin, K_launch).
    K_launch = min(1 << (K - 1).bit_length(), 8192)
    pos_cur = np.array([sym for (_o, _b, sym, _le, _hl) in lanes], np.int64)
    state = np.zeros(L, np.int8)  # 0 running, 1 eob, 2 error
    parts: list[tuple] = []
    raw_parts: list = []
    lane_adv_total = np.zeros(L, np.int64)
    slots_used = 0
    while slots_used < K and (state == 0).any():
        active = state == 0
        start_word = np.zeros(nlanes, np.int32)
        pos0 = np.zeros(nlanes, np.int32)
        start_word[:L] = np.where(active, pos_cur >> 5, 0)
        pos0[:L] = np.where(active, pos_cur & 31, 0)
        records, raw, bpos_rel, done, lane_adv = _jit_pallas_lanes(
            LB, L, wwin, K_launch)(
            words_dev,
            jnp.asarray(blocked(start_word.reshape(nlanes, 1))[:, 0]),
            jnp.asarray(blocked(pos0.reshape(nlanes, 1))[:, 0]),
            meta_d,
            tab_d,
            jnp.asarray(active),
        )
        parts.append(records)
        raw_parts.append(raw)
        lane_adv_total += np.asarray(lane_adv).astype(np.int64)
        done_np = np.asarray(done)[:L]
        new_pos = (np.asarray(bpos_rel)[:L].astype(np.int64)
                   + (pos_cur >> 5) * 32)
        progressed = new_pos > pos_cur
        pos_cur = np.where(active, new_pos, pos_cur)
        state = np.where(active & (done_np > 0), done_np, state).astype(np.int8)
        slots_used += K_launch
        # safety net: a running lane that made no progress can never
        # finish (degenerate window); stop iterating for it
        stuck = active & (done_np == 0) & ~progressed
        if stuck.any():
            state = np.where(stuck, 2, state).astype(np.int8)

    if len(parts) == 1:
        records = parts[0]
        raw = raw_parts[0]
    else:
        records = tuple(
            jnp.concatenate([p[j] for p in parts], axis=0) for j in range(5)
        )
        raw = jnp.concatenate(raw_parts, axis=0)
    return records, raw, pos_cur, state == 1, lane_adv_total
