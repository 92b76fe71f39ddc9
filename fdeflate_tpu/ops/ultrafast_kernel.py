"""Batched ultra-fast encoder on TPU (JAX/XLA).

Device twin of models/ultrafast.tokenize: encodes a whole batch of streams in
one jitted program with no serial loops at all.

    [B, N] bytes
      -> per-byte (code, nbits) tokens        (elementwise VPU work)
      -> bit positions via per-row cumsum     (prefix sum)
      -> u32 output words via segment-sum     (scatter; disjoint bits => +==|)
      -> per-stream Adler-32                  (tile reduction)

Everything stays in 32-bit lanes (TPU has no 64-bit integer units).  The
zlib + dynamic-block header is a compile-time constant prefix (429 bits); the
host only appends the 4 checksum bytes after the (byte-aligned) EOF.

The numpy implementation in models/ultrafast.py is the bit-exact oracle; see
tests/test_device_codec.py.
"""

from __future__ import annotations

import functools

import numpy as np

from ..tables import (
    HUFFMAN_CODES,
    HUFFMAN_LENGTHS,
    LENGTH_TO_LEN_EXTRA,
    LENGTH_TO_SYMBOL,
)
from ..models.ultrafast import STREAM_HEADER, STREAM_HEADER_BITS

_EOF_CODE = int(HUFFMAN_CODES[256])
_EOF_BITS = int(HUFFMAN_LENGTHS[256])


def _header_words(nwords: int) -> np.ndarray:
    """The canned stream header as little-endian u32 words."""
    raw = STREAM_HEADER[:53] + bytes(4 * nwords - 53)
    words = np.frombuffer(raw, dtype="<u4").copy()
    # Bits 424..429 live in byte 53 (only its low 5 bits are header).
    words[13] |= (STREAM_HEADER[53] & 0x1F) << 8
    return words


def _lut(table, idx, use_matmul: bool):
    """Small-table lookup: gather, or one-hot matmul on the MXU.

    XLA's TPU lowering of dynamic gathers from small tables is slow
    (~100M lookups/s); a [M, K] one-hot against the K-entry table rides the
    MXU instead.  The table splits into byte columns (values <= 255 are
    exact even when the backend lowers f32 dots to bf16 passes) and the
    result reassembles with shifts.
    """
    import jax
    import jax.numpy as jnp

    if not use_matmul:
        return table[idx]
    K = table.shape[0]
    cols = jnp.stack(
        [((table >> (8 * j)) & 0xFF).astype(jnp.float32) for j in range(3)],
        axis=1,
    )  # [K, 3]; table values < 2^24
    oh = jax.nn.one_hot(idx.reshape(-1), K, dtype=jnp.float32)
    out = (oh @ cols).astype(jnp.int32)
    combined = out[:, 0] | (out[:, 1] << 8) | (out[:, 2] << 16)
    return combined.reshape(idx.shape)


def _assign_tokens(data, lengths, lut_matmul: bool, split_S: int = 0,
                   rt=None, return_syms: bool = False):
    """Per-byte token assignment shared by the linear and blocked encoders.

    With ``split_S > 0``, zero-runs are additionally SPLIT at every
    ``split_S``-byte input boundary (fixed output geometry): every chunk of
    ``split_S`` decoded bytes then begins at an exact symbol boundary, so a
    decode lane owns a statically-known output range.  Costs ~13 bits per
    cut run.

    ``rt`` switches the trained-tree constants for RUNTIME code tables (the
    adaptive encoder, ops/adaptive.py): a dict with device arrays
    ``lit_tab`` (i32[256]: code | len << 16), ``tail_tab`` (i32[259]:
    code | len << 16 | extra << 20) and scalars ``c0/l0`` (literal-zero
    code) and ``c285/l285`` (length-symbol-285 code).  The token structure
    (run segmentation, 258-splits) is tree-independent.

    ``return_syms`` appends a per-byte DEFLATE symbol id (i32, -1 where the
    byte emits no symbol — mid-run bytes, extra-bits tokens, padding) for
    frequency counting.

    Returns (v, nb, at_extra, aligned[, sym]) — token values/bit counts per
    byte, the extra-bits-token mask, and per-stream aligned lengths.
    """
    import jax
    import jax.numpy as jnp

    B, N = data.shape
    assert N % 8 == 0, "pad the byte buffer to a multiple of 8"
    i32 = jnp.int32

    # Fused lookup tables (one gather each instead of one per field):
    # lit_tab[b]   = code | len << 16               (literal byte b)
    # tail_tab[T]  = code | len << 16 | extra << 20 (run tail of length T;
    #                extra is the count of extra bits for the length symbol)
    if rt is None:
        lit_tab = jnp.asarray(
            (HUFFMAN_CODES | (HUFFMAN_LENGTHS << 16)).astype(np.int32)
        )
        tail_np = np.zeros(259, np.int32)
        for T in range(3, 259):
            sym = int(LENGTH_TO_SYMBOL[T - 3])
            tail_np[T] = (
                int(HUFFMAN_CODES[sym])
                | (int(HUFFMAN_LENGTHS[sym]) << 16)
                | (int(LENGTH_TO_LEN_EXTRA[T - 3]) << 20)
            )
        tail_tab = jnp.asarray(tail_np)
        c0 = jnp.int32(int(HUFFMAN_CODES[0]))
        l0 = jnp.int32(int(HUFFMAN_LENGTHS[0]))
        c285 = jnp.int32(int(HUFFMAN_CODES[285]))
        l285 = jnp.int32(int(HUFFMAN_LENGTHS[285]))
    else:
        lit_tab = rt["lit_tab"]
        tail_tab = rt["tail_tab"]
        c0, l0 = rt["c0"], rt["l0"]
        c285, l285 = rt["c285"], rt["l285"]

    d = data.astype(i32)
    lengths = lengths.astype(i32)
    aligned = (lengths // 8) * 8  # [B]

    # ---- chunk classification -------------------------------------------
    n8 = N // 8
    b = d.reshape(B, n8, 8)
    nz = b != 0
    offs8 = jax.lax.broadcasted_iota(i32, (B, n8, 8), 2)
    chunk_zero = ~jnp.any(nz, axis=2)
    # t: first nonzero byte offset; l: zero bytes at the chunk end.
    t = jnp.min(jnp.where(nz, offs8, 8), axis=2)
    last_nz = jnp.max(jnp.where(nz, offs8, -1), axis=2)
    l = jnp.where(chunk_zero, 8, 7 - last_nz)

    prev_zero = jnp.concatenate(
        [jnp.zeros((B, 1), bool), chunk_zero[:, :-1]], axis=1
    )
    prev_l = jnp.concatenate([jnp.zeros((B, 1), i32), l[:, :-1]], axis=1)
    prev_run = prev_zero | (prev_l > 0)

    member = (
        chunk_zero[:, :, None]
        | ((offs8 < t[:, :, None]) & prev_run[:, :, None])
        | (offs8 >= (8 - l)[:, :, None])
    ).reshape(B, N)

    idx = jax.lax.broadcasted_iota(i32, (B, N), 1)
    in_aligned = idx < aligned[:, None]
    member = member & in_aligned

    # ---- run segmentation ------------------------------------------------
    prev_member = jnp.concatenate(
        [jnp.zeros((B, 1), bool), member[:, :-1]], axis=1
    )
    start_flag = member & ~prev_member
    seg_start = jax.lax.cummax(jnp.where(start_flag, idx, -1), axis=1)
    nxt = jnp.where(~member, idx, jnp.int32(N))
    seg_end = jax.lax.cummin(nxt[:, ::-1], axis=1)[:, ::-1]
    seg_end = jnp.minimum(seg_end, aligned[:, None])

    if split_S:
        # Fixed output geometry: clip every run segment at the chunk
        # boundaries so no symbol spans a split_S-byte output boundary.
        cstart = (idx // split_S) * split_S
        seg_start = jnp.maximum(seg_start, cstart)
        seg_end = jnp.minimum(seg_end, cstart + split_S)

    p = idx - seg_start
    q = p - 1
    run1 = seg_end - seg_start - 1
    k = run1 // 258
    tail = run1 - k * 258
    q0 = k * 258

    # ---- token assignment ------------------------------------------------
    lit = _lut(lit_tab, d, lut_matmul)  # code | len << 16
    lit_v = lit & 0xFFFF
    lit_n = lit >> 16
    in_stream = idx < lengths[:, None]

    v = jnp.where(member, 0, lit_v)
    nb = jnp.where(member, 0, lit_n)

    is_first = member & (p == 0)
    v = jnp.where(is_first, c0, v)
    nb = jnp.where(is_first, l0, nb)

    qk = q // 258
    is_285 = member & (p > 0) & (q - qk * 258 == 257)
    v = jnp.where(is_285, c285, v)
    nb = jnp.where(is_285, l285 + 1, nb)

    tl = _lut(tail_tab, jnp.clip(tail, 0, 258), lut_matmul)
    tail_extra = tl >> 20
    big_tail = member & (tail > 4)
    at_sym = big_tail & (q == q0)
    at_extra = big_tail & (q == q0 + 1)
    v = jnp.where(at_sym, tl & 0xFFFF, v)
    nb = jnp.where(at_sym, (tl >> 16) & 0xF, nb)
    extra_val = (tail - 3) & ((1 << tail_extra) - 1)
    v = jnp.where(at_extra, extra_val, v)
    nb = jnp.where(at_extra, tail_extra + 1, nb)

    small_tail = member & (tail > 0) & (tail <= 4) & (q >= q0) & (q < q0 + tail)
    v = jnp.where(small_tail, c0, v)
    nb = jnp.where(small_tail, l0, nb)

    # Remainder bytes (aligned <= i < length) are always literals; padding
    # beyond the stream emits nothing.
    is_rem = ~in_aligned & in_stream
    v = jnp.where(is_rem, lit_v.astype(i32), v)
    nb = jnp.where(is_rem, lit_n, nb)
    nb = jnp.where(in_stream, nb, 0)
    v = jnp.where(nb > 0, v, 0)
    if not return_syms:
        return v, nb, at_extra, aligned

    # Per-byte DEFLATE symbol ids (tree-independent): literals carry their
    # byte value, run tokens their length symbol; -1 where no symbol.
    tail_sym_np = np.zeros(259, np.int32)
    tail_sym_np[3:] = LENGTH_TO_SYMBOL.astype(np.int32)
    tail_sym = jnp.asarray(tail_sym_np)
    sym = jnp.where(member | ~in_stream, -1, d)
    sym = jnp.where(is_first | small_tail, 0, sym)
    sym = jnp.where(at_sym, tail_sym[jnp.clip(tail, 0, 258)], sym)
    sym = jnp.where(is_285, 285, sym)
    return v, nb, at_extra, aligned, sym


_PACK_S = 2048          # pack-lane chunk bytes (linear kernel-pack path)
_PACK_WWIN = 896        # tight window words per pack lane (see below)


def _linear_kernel_pack(v, nb, at_extra, cum, W: int,
                        hb: int = STREAM_HEADER_BITS):
    """Token bits -> linear stream words through the Pallas pack kernel.

    The XLA segment-sum scatter costs ~13 ns/element and dominates the
    whole linear encode (~197 of 260 ms at the bench geometry,
    bench/probe_encmarg.py).  This path reuses the blocked pack kernel for
    the LINEAR layout: tokens pack at NEAR-chunk-relative bit offsets
    (chunk-relative plus the low 8 bits of the lane's in-slab offset — see
    _pack_linear_words for why tight offsets matter), a corner turn makes
    the windows lane-major rows, an XLA log word-shift aligns each row to
    its 1024-word output slab, and a DMA combine kernel
    (ops/repack.linear_from_rows) ORs the rows into the stream words.
    Bit-exact vs the scatter path (tests/test_device_codec.py).

    Returns words i32[B, Wpad] (Wpad = W rounded up to 1024) with the
    payload bits placed; header and EOF are OR'd in by the caller.
    """
    import jax
    import jax.numpy as jnp

    from .pallas_pack import pack_tokens_v2

    i32 = jnp.int32
    B, N = v.shape
    S = _PACK_S
    C = N // S

    pos_slot = hb + cum - nb                          # [B, N] token bits
    pos0 = pos_slot[:, ::S]                           # [B, C] lane starts
    orig = (pos0 >> 15) << 15                         # slab-aligned origins
    off = pos0 - orig                                 # in-slab bit offsets
    subb = off & 255                                  # folded into the pack
    rel = pos_slot - jnp.repeat(pos0 - subb, S, axis=1)

    tokb, relpb, npairb = pack_tokens_v2(v, nb, rel, C)
    return _pack_linear_words(tokb, relpb, npairb, orig, (off >> 8) << 3,
                              B, W)


def _frame_words(words, eof_pos, tree=None):
    """OR in the canned zlib+dynamic-block header and the EOF token.

    ``tree``: optional ops/septree.TreeProfile — its own canned header and
    EOB code replace the trained-tree constants."""
    import jax.numpy as jnp

    u32 = jnp.uint32
    B = words.shape[0]
    if tree is None:
        hdr_np, eof_code = _header_words(16), _EOF_CODE
    else:
        nh = (tree.header_bits + 31) // 32 + 1
        hdr_np, eof_code = tree.header_words(nh), tree.eof_code
    hdr = jnp.asarray(hdr_np).astype(words.dtype)
    nh = hdr.shape[0]
    words = words.at[:, :nh].add(hdr)  # header bits disjoint from payload

    eof_wi = eof_pos >> 5
    eof_sh = (eof_pos & 31).astype(u32)
    eof_lo = (jnp.uint32(eof_code) << eof_sh).astype(u32)
    eof_hi = ((jnp.uint32(eof_code) >> 1)
              >> (31 - eof_sh).astype(u32)).astype(u32)
    rows = jnp.arange(B)
    words = words.at[rows, eof_wi].add(eof_lo)
    words = words.at[rows, eof_wi + 1].add(eof_hi)
    return words


def _encode_linear_assign(data, lengths, C: int, return_eof: bool,
                          tree=None):
    """Whole-kernel linear encode: assign kernel -> pack kernel -> combine.

    The XLA _assign_tokens chain (one-hot-matmul literal lookup +
    segmentation scans, ~63 ms / 16 MiB on hardware) is replaced by
    ops/pallas_assign; everything that remains in XLA is O(B*C) index math
    plus the framing adds and the Adler reduction.

    ``tree``: optional ops/septree.TreeProfile (runtime code tables +
    its own canned header); None keeps the trained-tree constants.
    """
    import jax.numpy as jnp

    from .pallas_assign import assign_tokens_blocked

    i32 = jnp.int32
    u32 = jnp.uint32
    B, N = data.shape
    L = B * C
    LB = -(-L // 1024)
    Lp = LB * 1024
    HB = STREAM_HEADER_BITS if tree is None else tree.header_bits
    EB = _EOF_BITS if tree is None else tree.eof_bits
    rt = None if tree is None else tree.rt_arrays()

    tok, relp, npair, chunk_bits = assign_tokens_blocked(data, lengths, C,
                                                         rt=rt)
    csum = jnp.cumsum(chunk_bits, axis=1)
    pos0 = HB + csum - chunk_bits                   # [B, C] lane start bits
    eof_pos = HB + csum[:, -1]
    total_bits = ((eof_pos + EB + 7) // 8) * 8
    W = (13 * N + HB + EB + 31) // 32 + 2

    orig = (pos0 >> 15) << 15
    off = pos0 - orig                               # [B, C] in-slab bits
    subb = (off & 255).reshape(-1)                  # folded into the pack
    if Lp > L:
        subb = jnp.concatenate([subb, jnp.zeros((Lp - L,), i32)])
    subr = subb.reshape(LB, 8, 128)[:, None]        # [LB, 1, 8, 128]

    words = _pack_linear_words(tok, relp + subr, npair, orig,
                               (off >> 8) << 3, B, W).astype(u32)
    words = _frame_words(words, eof_pos, tree)
    adler = adler32_batch(data, lengths)

    if return_eof:
        return words, total_bits.astype(i32), adler, pos0, eof_pos
    return words, total_bits.astype(i32), adler, pos0


def _pack_linear_words(tokb, relpb, npairb, orig, woff8, B: int, W: int):
    """Shared tail of both kernel encode paths: pack kernel at NEAR-chunk-
    relative offsets -> corner turn -> DMA OR-combine with in-kernel shift.

    ``relpb`` must be chunk-relative PLUS the low 8 bits of each lane's
    in-slab offset; ``woff8`` i32[B, C] carries the remaining word shift
    (multiples of 8 words, < 1024).  Feeding fully slab-relative offsets
    to the pack kernel instead is 5x slower end-to-end: pack_bounds
    computes per-word-group pair ranges as envelopes ACROSS the (8, 128)
    lane block, and per-lane offsets spreading 0..1024 words widen every
    group's scan to nearly all pairs (measured +20 ms at the bench
    geometry, bench/probe_turncombine.py).  Folding only 255 bits keeps
    the envelopes tight (+1 group); the word-granular remainder is
    applied INSIDE the combine kernel (DMA row offset + dynamic lane
    rotate, see repack._combine_kernel) — round 4 paid ~3.8 ms of XLA
    select passes over the whole rows buffer for the same shift.

    Returns words i32[B, Wpad] (Wpad = W rounded up to 1024)."""
    import jax.numpy as jnp

    from .pallas_pack import pack_blocked_pallas_v2
    from .pallas_decode2 import corner_turn
    from .repack import linear_from_rows

    i32 = jnp.int32
    _, C = orig.shape
    L = B * C
    LB = -(-L // 1024)
    Lp = LB * 1024
    S = tokb.shape[1]
    # Window: worst-case chunk payload (13 bits/byte) + the folded 255-bit
    # offset, rounded up for corner_turn's T % 128 == 0; a lane's shifted
    # payload then spans < 1023 + wpad words -> H output slabs.  The
    # combine kernel's row look-back additionally needs payload to end by
    # word (H-1)*1024, which H's definition guarantees (wpad <= (H-1)*1024).
    wpad = (13 * S + 255) // 32 + 2
    wpad += (-wpad) % 128
    H = -(-(wpad + 1024) // 1024)

    win = pack_blocked_pallas_v2(tokb, relpb, npairb, wpad)
    rows = corner_turn(win).reshape(Lp, wpad)
    rows = jnp.concatenate(
        [rows, jnp.zeros((Lp, H * 1024 - wpad), i32)], axis=1)

    w8 = woff8.reshape(-1)
    if Lp > L:
        w8 = jnp.concatenate([w8, jnp.zeros((Lp - L,), i32)])

    Wpad = W + (-W) % 1024
    nslabs = Wpad // 1024
    slab0 = jnp.arange(B, dtype=i32)[:, None] * nslabs + (orig >> 15)
    slab0 = slab0.reshape(-1)
    if Lp > L:
        slab0 = jnp.concatenate(
            [slab0, jnp.full((Lp - L,), B * nslabs, i32)])

    out = linear_from_rows(rows, slab0, B * nslabs, H=H, w8=w8)
    return out.reshape(B, Wpad)


def encode_ultrafast_batch(
    data, lengths, lut_matmul: bool | None = None, num_chunks: int = 0,
    fixed_geometry: bool = False, return_eof: bool = False,
    kernel_pack: bool | None = None, kernel_assign: bool | None = None,
    tree=None,
):
    """Encode ``B`` streams of padded length ``N``.

    Args:
      data: uint8[B, N] — stream bytes, zero-padded past ``lengths``.
      lengths: int32[B] — logical lengths.
      lut_matmul: force the lookup strategy (None = matmul on TPU).
      num_chunks: if > 0, additionally return a chunk index int32[B, C] of
        exact symbol-boundary bit positions at ~N/C byte spacing.  The index
        costs nothing extra (token positions are already computed) and lets
        the chunked decoder start lanes at exact entries instead of relying
        on Huffman self-synchronization — which fails on run-structured
        streams, where misalignment in a sea of identical run tokens is
        self-consistent and never re-syncs.
      fixed_geometry: with ``num_chunks``, split runs at the N/num_chunks
        output-byte boundaries so chunk k decodes EXACTLY N/C bytes starting
        at byte k*N/C (see _assign_tokens); required by the fixed-geometry
        Pallas decoder (ops/pallas_decode2.py).
      return_eof: with ``num_chunks``, additionally return eof_pos i32[B] —
        the bit position of the EOF token (== end of the last chunk's
        payload; the repack->decode verification needs it because
        total_bits includes the EOF token and byte padding).
      tree: optional ops/septree.TreeProfile — encode with a runtime
        <=12-bit tree and its own canned header instead of the trained
        constants (the class-separated throughput profile).  Streams stay
        plain standard zlib either way.

    Returns:
      words:  uint32[B, W] — the complete zlib streams except the trailing
              checksum, as little-endian u32 words (W = N words + slack).
      total_bits: int32[B] — valid bits per stream (multiple of 8 after the
              EOF+padding, i.e. the byte length is total_bits // 8).
      adler: uint32[B] — per-stream Adler-32 of the payload.
    """
    import jax
    import jax.numpy as jnp

    B, N = data.shape
    i32 = jnp.int32
    u32 = jnp.uint32
    if lut_matmul is None:
        lut_matmul = jax.default_backend() == "tpu" or (
            jax.devices()[0].platform not in ("cpu",)
        )
    if kernel_pack is None:
        kernel_pack = jax.default_backend() == "tpu"
    if kernel_assign is None:
        kernel_assign = kernel_pack
    if (kernel_assign and fixed_geometry and num_chunks
            and N % num_chunks == 0
            and (N // num_chunks) % 32 == 0):
        return _encode_linear_assign(data, lengths, num_chunks, return_eof,
                                     tree=tree)
    HB = STREAM_HEADER_BITS if tree is None else tree.header_bits
    EB = _EOF_BITS if tree is None else tree.eof_bits
    split_S = N // num_chunks if (fixed_geometry and num_chunks) else 0
    v, nb, at_extra, aligned = _assign_tokens(
        data, lengths, lut_matmul, split_S,
        rt=None if tree is None else tree.rt_dict())
    idx = jax.lax.broadcasted_iota(i32, (B, N), 1)

    # ---- bit packing -----------------------------------------------------
    cum = jnp.cumsum(nb, axis=1)
    payload_end = HB + cum[:, -1]

    # EOF token, then pad to a byte boundary.
    eof_pos = payload_end
    total_bits = ((eof_pos + EB + 7) // 8) * 8

    # u32 words per stream: every byte emits at most one token of <= 13 bits
    # (literal <= 12; the 258-run token is 13), plus header/EOF/slack.
    W = (13 * N + HB + EB + 31) // 32 + 2

    if kernel_pack and N % _PACK_S == 0:
        words = _linear_kernel_pack(v, nb, at_extra, cum, W,
                                    hb=HB).astype(u32)
        W = words.shape[1]
    else:
        # Pair-combine adjacent tokens before scattering: two <=13-bit
        # tokens concatenate into one <=26-bit token, halving the scatter
        # volume.
        v0 = v[:, 0::2].astype(u32)
        v1 = v[:, 1::2].astype(u32)
        n0 = nb[:, 0::2]
        n1 = nb[:, 1::2]
        vp = (v0 | (v1 << n0.astype(u32))).astype(u32)
        npair = n0 + n1
        positions = HB + cum[:, 1::2] - npair  # pair starts

        wi = positions >> 5
        sh = (positions & 31).astype(u32)
        lo = (vp << sh).astype(u32)
        hi = ((vp >> 1) >> (31 - sh).astype(u32)).astype(u32)
        valid = npair > 0

        # Empty pairs contribute 0 at their natural slot: an empty token's
        # position equals the next symbol's start bit, so the flat index
        # stream is genuinely nondecreasing and ``indices_are_sorted=True``
        # is a true promise.  (Routing empties to a dump segment past the
        # end — the previous formulation — interleaves out-of-order
        # indices, and the TPU sorted-scatter lowering then silently
        # corrupts neighbouring words; measured 881k bad words on a 16 MiB
        # batch, bench/debug_enc2048.py.)
        Np = N // 2
        row = jax.lax.broadcasted_iota(i32, (B, Np), 0)
        flat = row * W + wi
        words = jax.ops.segment_sum(
            jnp.where(valid, lo.astype(i32), 0).reshape(-1),
            flat.reshape(-1),
            num_segments=B * W,
            indices_are_sorted=True,
        )
        words = words + jax.ops.segment_sum(
            jnp.where(valid, hi.astype(i32), 0).reshape(-1),
            (flat + 1).reshape(-1),
            num_segments=B * W,
            indices_are_sorted=True,
        )
        words = words.reshape(B, W).astype(u32)

    words = _frame_words(words, eof_pos, tree)
    adler = adler32_batch(data, lengths)

    if num_chunks:
        # Exact chunk index: the bit position of the first symbol-start
        # token at or after byte k*N/C.  A token begins a symbol unless it
        # is the extra-bits half of a run-tail (at_extra); empty tokens
        # inherit the next symbol start via a suffix-min.  The final EOF
        # position is the fallback for chunks past the last symbol.
        tok_pos = HB + cum - nb  # [B, N] token start bits
        sym_start = (nb > 0) & ~at_extra
        masked = jnp.where(sym_start, tok_pos, eof_pos[:, None])
        suffix_min = jax.lax.cummin(masked[:, ::-1], axis=1)[:, ::-1]
        step = N // num_chunks
        sample = jnp.arange(num_chunks, dtype=i32) * step
        chunk_starts = suffix_min[:, sample]
        chunk_starts = chunk_starts.at[:, 0].set(HB)
        if return_eof:
            return words, total_bits.astype(i32), adler, chunk_starts, eof_pos
        return words, total_bits.astype(i32), adler, chunk_starts

    return words, total_bits.astype(i32), adler


def blocked_wpad(S: int) -> int:
    """Window words per lane for the blocked layout (worst-case chunk bits)."""
    return (13 * S + 63) // 32 + 2


def encode_ultrafast_blocked(data, lengths, num_chunks: int,
                             lut_matmul: bool | None = None,
                             kernel_pack: bool | None = None,
                             kernel_assign: bool | None = None):
    """Fixed-geometry, lane-blocked ultra-fast encode.

    Splits every stream into ``C = num_chunks`` chunks of exactly ``S = N/C``
    output bytes (runs are cut at the boundaries) and scatters each chunk's
    payload bits into its own padded word window, laid out for the Pallas
    decoder (ops/pallas_decode2.py): lane = stream*C + chunk, windows at
    ``win[lane//1024, :, (lane//128) % 8, lane % 128]``.  The scatter is the
    same segment-sum as the linear encoder — the blocked form costs nothing
    extra to produce.

    Returns:
      win: int32[LB, wpad, 8, 128] — per-lane bit windows (bit 0 = chunk
           start; no zlib header, no EOF: framing belongs to the linear
           layout, see encode_ultrafast_batch).
      chunk_bits: int32[B, C] — payload bits per chunk (decoder exit check).
      adler: uint32[B] — per-stream Adler-32 of the payload.
    """
    import jax
    import jax.numpy as jnp

    B, N = data.shape
    C = num_chunks
    assert N % C == 0, "N must divide into num_chunks"
    S = N // C
    assert S % 8 == 0, "chunk size must be a multiple of 8"
    i32 = jnp.int32
    u32 = jnp.uint32
    if lut_matmul is None:
        lut_matmul = jax.default_backend() == "tpu" or (
            jax.devices()[0].platform not in ("cpu",)
        )
    if kernel_assign is None:
        kernel_assign = (kernel_pack if kernel_pack is not None
                         else jax.default_backend() == "tpu")

    if kernel_assign and S % 32 == 0:
        # Whole-kernel blocked encode: the assign kernel's outputs are
        # exactly the pack kernel's inputs with chunk-relative offsets.
        from .pallas_assign import assign_tokens_blocked
        from .pallas_pack import pack_blocked_pallas_v2

        tok, relp, npair, chunk_bits = assign_tokens_blocked(
            data, lengths, C)
        wpad0 = blocked_wpad(S)
        win = pack_blocked_pallas_v2(tok, relp, npair,
                                     wpad0 + (-wpad0) % 8)
        adler = adler32_batch(data, lengths)
        return win, chunk_bits, adler

    v, nb, at_extra, aligned = _assign_tokens(data, lengths, lut_matmul, S)
    win, chunk_bits = _pack_blocked(v, nb, at_extra, C,
                                    kernel_pack=kernel_pack)
    adler = adler32_batch(data, lengths)
    return win, chunk_bits, adler


def _pack_blocked(v, nb, at_extra, C: int, kernel_pack: bool | None = None):
    """Pack per-byte tokens into the lane-blocked window layout.

    Shared by the trained-tree (encode_ultrafast_blocked) and adaptive
    (ops/adaptive.py) blocked encoders; the token grammar is identical,
    only the code assignment differs.

    On TPU the final placement runs as the Pallas pack kernel
    (ops/pallas_pack.py) — XLA's scatter-add lowering costs ~13 ns/element
    here and dominated the whole encode (bench/probe_enc.py); elsewhere
    (and with ``kernel_pack=False``) the XLA sorted segment-sum scatter is
    used, which doubles as the kernel's oracle in tests.
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    u32 = jnp.uint32
    B, N = v.shape
    S = N // C
    if kernel_pack is None:
        kernel_pack = jax.default_backend() == "tpu"

    cum = jnp.cumsum(nb, axis=1)
    tok_pos = cum - nb                       # [B, N] token start bits
    eof_pos = cum[:, -1]

    # Chunk start bits: with fixed geometry the token at byte c*S is always
    # a symbol start when it exists; empty chunks fall back to stream end.
    sym_start = (nb > 0) & ~at_extra
    masked = jnp.where(sym_start, tok_pos, eof_pos[:, None])
    suffix_min = jax.lax.cummin(masked[:, ::-1], axis=1)[:, ::-1]
    chunk_starts = suffix_min[:, ::S]        # [B, C]
    chunk_starts = chunk_starts.at[:, 0].set(0)
    chunk_bits = (
        jnp.concatenate([chunk_starts[:, 1:], eof_pos[:, None]], axis=1)
        - chunk_starts
    )

    rel = tok_pos - jnp.repeat(chunk_starts, S, axis=1)  # chunk-relative bits

    if kernel_pack:
        # Linear-work pack kernel: per word group only the pair range that
        # can touch it is scanned (block-level monotone bounds computed
        # here in XLA).  No chunk-size limit; the quadratic all-pairs
        # kernel (pack_blocked_pallas) remains for A/B.
        from .pallas_pack import pack_blocked_pallas_v2, pack_tokens_v2

        wpad0 = blocked_wpad(S)
        wwin = wpad0 + (-wpad0) % 8
        tok, relp, npair = pack_tokens_v2(v, nb, rel, C)
        win = pack_blocked_pallas_v2(tok, relp, npair, wwin)
        return win, chunk_bits.astype(i32)

    # Pair-combine (S is even, so pairs never straddle a chunk boundary).
    v0 = v[:, 0::2].astype(u32)
    v1 = v[:, 1::2].astype(u32)
    n0 = nb[:, 0::2]
    n1 = nb[:, 1::2]
    vp = (v0 | (v1 << n0.astype(u32))).astype(u32)
    npair = n0 + n1
    rel_pair = rel[:, 0::2]

    wpad = blocked_wpad(S)
    LANE = 128
    L = B * C
    LB = -(-L // 1024)

    wi = rel_pair >> 5
    sh = (rel_pair & 31).astype(u32)
    lo = (vp << sh).astype(u32)
    hi = ((vp >> 1) >> (31 - sh).astype(u32)).astype(u32)
    valid = npair > 0

    # Scatter into a LANE-MAJOR [L, wpad] buffer first: the flat index
    # (lane * wpad + wi) is globally ascending in token order (streams,
    # then chunks, then bits), so XLA takes the sorted-scatter fast path —
    # the word-major layout the kernel wants would interleave lanes per
    # word and cost ~6x in scatter time (measured: 325 ms vs ~55 ms for
    # 16 MiB).  One dense transpose then produces [LB, wpad, 8, 128].
    Np = N // 2
    brow = jax.lax.broadcasted_iota(i32, (B, Np), 0)
    pcol = jax.lax.broadcasted_iota(i32, (B, Np), 1)
    lane = brow * C + (pcol * 2) // S
    # Empty pairs scatter 0 at their natural slot (an empty token's rel is
    # the next symbol's start), keeping the index stream genuinely sorted —
    # see the matching comment in encode_ultrafast_batch: a dump segment
    # past the end breaks the sortedness promise and the TPU sorted-scatter
    # lowering silently corrupts the windows (bench/debug_enc2048.py).
    flat0 = lane * wpad + wi
    total = LB * 1024 * wpad
    win = jax.ops.segment_sum(
        jnp.where(valid, lo.astype(i32), 0).reshape(-1),
        flat0.reshape(-1),
        num_segments=total,
        indices_are_sorted=True,
    )
    win = win + jax.ops.segment_sum(
        jnp.where(valid, hi.astype(i32), 0).reshape(-1),
        (flat0 + 1).reshape(-1),  # wi+1, same lane
        num_segments=total,
        indices_are_sorted=True,
    )
    win = win.reshape(LB, 8, LANE, wpad).transpose(0, 3, 1, 2)
    return win, chunk_bits.astype(i32)


def adler32_batch(data, lengths):
    """Per-stream Adler-32 for a [B, N] byte batch."""
    import jax

    from .adler32 import adler32_jax

    return jax.vmap(adler32_jax)(data, lengths)


def finalize_streams(words, total_bits, adler) -> list[bytes]:
    """Assemble final zlib byte strings on the host (appends checksums)."""
    words = np.asarray(words)
    total_bits = np.asarray(total_bits)
    adler = np.asarray(adler)
    out = []
    for b in range(words.shape[0]):
        nbytes = int(total_bits[b]) // 8
        raw = words[b].tobytes()[:nbytes]
        out.append(raw + int(adler[b]).to_bytes(4, "big"))
    return out


@functools.lru_cache(maxsize=8)
def _jitted_encoder(num_chunks: int = 0):
    import jax

    return jax.jit(
        functools.partial(encode_ultrafast_batch, num_chunks=num_chunks)
    )


def compress_batch_ultra_fast(streams: list[bytes], with_index: int = 0):
    """Host-facing batch API: ultra-fast-compress many streams on device.

    With ``with_index=C`` also returns an int32[B, C] chunk index (exact
    symbol-boundary bit positions) that ``decompress_batch_indexed`` uses
    for chunk-parallel decode.  The index is auxiliary metadata; the streams
    themselves stay plain zlib.
    """
    import jax.numpy as jnp

    B = len(streams)
    lengths = np.array([len(s) for s in streams], dtype=np.int32)
    N = max(8, int(-(-int(lengths.max(initial=1)) // 8) * 8))
    buf = np.zeros((B, N), dtype=np.uint8)
    for i, s in enumerate(streams):
        buf[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    result = _jitted_encoder(with_index)(jnp.asarray(buf), jnp.asarray(lengths))
    if with_index:
        words, total_bits, adler, index = result
        return finalize_streams(words, total_bits, adler), np.asarray(index)
    words, total_bits, adler = result
    return finalize_streams(words, total_bits, adler)
