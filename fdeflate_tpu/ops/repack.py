"""Device repack: standard zlib stream words -> lane-blocked decode windows.

Round-2's fast decode path (ops/pallas_decode2) consumed a proprietary
lane-blocked window layout that only the blocked encoder emitted — the
benchmarked roundtrip never produced bytes ``zlib.decompress`` could read
(VERDICT round 2, item 1).  This module closes that gap: it stages the v2
kernel's per-lane bit windows **straight from the linear, framed, valid-zlib
stream words** at the exact symbol-boundary bit offsets the encoder's chunk
index records.  The chain

    encode_ultrafast_batch (linear zlib words + chunk index)
      -> stage_blocked_from_linear (this module)
      -> decode_blocked (ops/pallas_decode2)

is the standard-artifact equivalent of the reference's
compress_to_vec_ultra_fast -> decompress_to_vec roundtrip
(/root/reference/src/compress/ultrafast.rs:70-91 +
/root/reference/src/decompress.rs:611-830): every intermediate byte stream
is a zlib stream any decoder accepts; the chunk index is sidecar metadata.

Design (TPU, two passes — hardware constraints measured by
bench/probe_dma.py):

1. **Slab fetch (Pallas DMA).**  Per-lane windows live at arbitrary *bit*
   offsets, i.e. per-lane dynamic reads — the one access pattern Mosaic's
   vector unit cannot do (lane-indexed VMEM gathers do not lower;
   PERF_NOTES.md round-1 probes).  The DMA engines can, but Mosaic bounds
   them: 1-D memrefs are tiled (1024,), so a DMA slice's shape must be a
   multiple of 1024 words and its offset *provably* divisible by 1024
   ("Failed to prove that a tile index ... is divisible by the tiling").
   The kernel therefore fetches, for every lane, an aligned **slab** of
   ``wl`` words starting at ``(flat_word_offset >> 10) << 10`` — the
   divisibility is provable because the offset is written as
   ``blk_ref[i] * 1024``.  Slabs land in a flat HBM rows buffer.

2. **Align + corner turn (XLA).**  The lane's window starts at word
   ``woff = flat_word_offset & 1023`` inside its slab.  A log-shift pass
   (10 conditional row-shifts by 512..1) moves it to word 0 — streaming,
   bandwidth-bound, no gathers — then one elementwise pass applies the
   sub-word bit shift, and a reshape+transpose produces the kernel's
   word-major ``win[LB, wwin, 8, 128]``.

The XLA fallback (`_stage_xla`, gather + shift) is the bit-exact oracle and
the interpret-mode path for tests.
"""

from __future__ import annotations

import functools

import numpy as np

LANE = 128
SLAB = 1024  # Mosaic 1-D memref tiling: DMA offsets/shapes are slab-granular


def stage_wwin(S: int, cap_bits_per_byte: float | None = None) -> int:
    """Window words per lane, rounded up to the 128-word slab size.

    Worst case matches ops/ultrafast_kernel.blocked_wpad (13 bits/byte);
    ``cap_bits_per_byte`` sizes a smaller window for corpora whose measured
    max chunk is denser — the decode verifies (bpos + Adler-32), so an
    undersized window is *detected*, never silent.
    """
    bpb = 13.0 if cap_bits_per_byte is None else cap_bits_per_byte
    w = (int(S * bpb) + 63) // 32 + 2
    return w + (-w) % 128


def stage_blocked_np(words: np.ndarray, chunk_starts: np.ndarray,
                     C: int, wwin: int) -> np.ndarray:
    """Numpy oracle: per-lane windows from linear stream words.

    words: u32/i32[B, W]; chunk_starts: i32[B, C] absolute bit positions.
    Returns win i32[LB, wwin, 8, 128] with window bit 0 = chunk start.
    """
    B, W = words.shape
    w = np.zeros((B, W + wwin + 2), np.uint64)
    w[:, :W] = words.astype(np.uint32)
    L = B * C
    LB = -(-L // 1024)
    win = np.zeros((LB, wwin, 8, LANE), np.uint32)
    for lane in range(L):
        b, k = divmod(lane, C)
        s = int(chunk_starts[b, k])
        w0, sh = s >> 5, s & 31
        seg = w[b, w0 : w0 + wwin + 1]
        lo = seg[:wwin] >> sh
        hi = (seg[1 : wwin + 1] << (32 - sh)) & 0xFFFFFFFF if sh else 0
        lb, r = divmod(lane, 1024)
        si, li = divmod(r, LANE)
        win[lb, :, si, li] = (lo | hi).astype(np.uint32)
    return win.view(np.int32)


def _stage_xla(words, chunk_starts, C: int, wwin: int):
    """XLA gather + shift staging (oracle / interpret path)."""
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    u32 = jnp.uint32
    B, W = words.shape
    L = B * C
    LB = -(-L // 1024)
    wpad = jnp.pad(words.astype(u32), ((0, 0), (0, wwin + 2)))
    w0 = (chunk_starts >> 5).astype(i32)              # [B, C]
    sh = (chunk_starts & 31).astype(u32)
    idx = w0[:, :, None] + jnp.arange(wwin + 1, dtype=i32)[None, None, :]
    seg = jnp.take_along_axis(
        wpad[:, None, :], idx, axis=2
    )                                                  # [B, C, wwin+1]
    lo = seg[:, :, :wwin] >> sh[:, :, None]
    hi = jnp.where(
        sh[:, :, None] == 0,
        u32(0),
        seg[:, :, 1:] << ((32 - sh[:, :, None]) & 31),
    )
    rows = (lo | hi).astype(jnp.int32).reshape(L, wwin)
    pad = LB * 1024 - L
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad, wwin), jnp.int32)])
    return rows.reshape(LB, 8, LANE, wwin).transpose(0, 3, 1, 2)


def _slab_kernel(blk_ref, src_ref, out_ref, sem, *, lanes: int, wl: int,
                 dma_depth: int):
    """One aligned slab DMA per lane: src[blk[i]*1024 : +wl] -> out[i*wl:].

    blk_ref: SMEM i32[lanes] — flat SLAB index per lane (provably aligned
    offsets come from the ``* SLAB`` below).  src/out are flat HBM buffers;
    ``wl`` is a multiple of SLAB so destination offsets are aligned too.
    ``dma_depth`` semaphore slots pipeline the copies.
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def copy_for(i, slot):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(blk_ref[i] * SLAB, wl)],
            out_ref.at[pl.ds(i * wl, wl)],
            sem.at[slot],
        )

    def body(i, _):
        slot = jax.lax.rem(i, dma_depth)

        @pl.when(i >= dma_depth)
        def _drain():
            copy_for(i - dma_depth, slot).wait()

        copy_for(i, slot).start()
        return 0

    jax.lax.fori_loop(0, lanes, body, 0)
    for k in range(dma_depth):
        # Drain the last dma_depth copies (each slot exactly once).
        i = lanes - dma_depth + k
        copy_for(i, i % dma_depth).wait()


def fetch_slabs(src_flat, blk, wl: int, dma_depth: int = 32):
    """Pallas pass 1: per-lane aligned slab DMA into flat HBM rows.

    src_flat: i32[Wflat]; blk: i32[L] slab indices (flat word offset >> 10).
    Returns rows i32[L * wl]; caller guarantees blk*SLAB + wl <= Wflat.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (lanes,) = blk.shape
    assert wl % SLAB == 0
    f = pl.pallas_call(
        functools.partial(_slab_kernel, lanes=lanes, wl=wl,
                          dma_depth=dma_depth),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((lanes * wl,), jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((dma_depth,))],
    )
    return f(blk, src_flat)


def stage_windows_flat(flat_words, starts_flat, LB: int, wwin: int):
    """Per-lane word windows from a flat word buffer at word offsets.

    flat_words: i32[Wflat] — must have >= wwin + 2*SLAB words of slack
      past the largest start (the caller pads).
    starts_flat: i32[LB*1024] — each lane's first window word.

    TPU: aligned slab DMA (fetch_slabs) + word-granular log-shift — the
    jnp.take formulation costs ~7 ns/element (bench/probe_gather.py),
    several times a record kernel's own cost per launch.  Elsewhere: the
    take (oracle path).  Returns i32[LB, wwin, 8, 128].
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    Lp = LB * 1024
    if jax.default_backend() != "tpu":
        idx = jnp.minimum(
            starts_flat[:, None] + jnp.arange(wwin, dtype=i32)[None, :],
            flat_words.shape[0] - 1,
        )
        rows = jnp.take(flat_words, idx.reshape(-1), axis=0).reshape(
            Lp, wwin)
        return rows.reshape(LB, 8, LANE, wwin).transpose(0, 3, 1, 2)

    wl = (wwin + 2 * SLAB) // SLAB * SLAB
    blk = starts_flat >> 10
    woff = starts_flat & (SLAB - 1)
    rows = fetch_slabs(flat_words, blk, wl).reshape(Lp, wl)
    for k in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        shifted = jnp.concatenate(
            [rows[:, k:], jnp.zeros((Lp, k), i32)], axis=1)
        rows = jnp.where((woff & k)[:, None] != 0, shifted, rows)
    return rows[:, :wwin].reshape(LB, 8, LANE, wwin).transpose(0, 3, 1, 2)


def _combine_kernel(lo_ref, hi_ref, slab0_ref, w8_ref, rows_ref, out_ref,
                    buf, sem, *, H: int):
    """OR per-lane row halves into one linear output slab, applying each
    lane's word-granular shift in-flight.

    Grid cell = one output slab ``s`` (1024 words).  Lanes contributing to
    it are the contiguous range [lo[s], hi[s]) (lanes sorted by origin
    slab); lane ``l`` contributes its half ``h = s - slab0[l]`` shifted
    right by ``w8[l]`` words (w8 < 1024, multiple of 8 — the part of the
    lane's in-slab bit offset the pack kernel does not fold; round 4 paid
    7 streaming XLA select passes over the whole rows buffer for this,
    ~3.8 ms of the 12.75 ms encode at 16 MiB).  Here the shift rides the
    existing data movement: the row-granular part (w8 >> 7 sublane rows)
    offsets the DMA window — 16 rows covering both straddled 8-row tiles
    of the LEAD-PADDED rows buffer — and the sub-row part (w8 & 127
    lanes, a multiple of 8) is one dynamic lane rotate (pltpu.roll,
    semantics validated on hardware by bench/probe_roll.py) plus a
    row-borrow select.  Distinct chunks touch disjoint bits, shared
    boundary words OR cleanly.  Double-buffered DMA hides the fetch
    latency.

    rows_ref layout: [8 + Lp*H*8, 128] — 8 zero lead rows, then lane
    ``l``'s H*8 UNSHIFTED rows (payload from word 0).  The 16-row window
    for (l, h) starts at padded row (H*l + h)*8 (i.e. unpadded row
    (H*l + h - 1)*8): one tile of look-back for the row borrow, then the
    half's own tile.  Look-back rows beyond a lane's payload are zero by
    construction (payload words <= (H-1)*1024, see _pack_linear_words).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i32 = jnp.int32
    s = pl.program_id(0)
    lo = lo_ref[s]
    hi = hi_ref[s]

    def copy_for(i, slot):
        h = s - slab0_ref[i]
        # 16 rows at padded offset (H*i + h)*8 — a multiple of 8, so the
        # copy covers exactly two (8, 128) tiles.
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds((H * i + h) * 8, 16), :],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(lo < hi)
    def _first():
        copy_for(lo, lo & 1).start()

    lanes = jax.lax.broadcasted_iota(i32, (8, LANE), 1)

    def body(i, acc):
        slot = i & 1

        @pl.when(i + 1 < hi)
        def _next():
            copy_for(i + 1, (i + 1) & 1).start()

        copy_for(i, slot).wait()
        w8 = w8_ref[i]
        roff = w8 >> 7          # whole sublane rows (0..7)
        b = w8 & 127            # lanes within a row (multiple of 8)
        # buf[slot][j] = unpadded row base - 8 + j (base = (H*i+h)*8), so
        # shifted-half row r needs source row base + r - roff = G[r + 8]
        # for lanes >= b and base + r - roff - 1 = G[r + 7] below b (the
        # row borrow), where G = roll(buf, roff, axis=0) — indices 7..15
        # stay in [0, 15] for roff <= 7, no wraparound artifacts.
        G = pltpu.roll(buf[slot], roff, axis=0)
        A = pltpu.roll(G, b, axis=1)
        contrib = jnp.where(lanes >= b, A[8:16], A[7:15])
        return acc | contrib

    acc = jax.lax.fori_loop(lo, hi, body, jnp.zeros((8, LANE), jnp.int32))
    out_ref[0] = acc


def _combine_kernel_grouped(lo_ref, hi_ref, slab0_ref, w8_ref, rows_ref,
                            out_ref, buf, sem, *, H: int, K: int,
                            nlanes: int):
    """Grouped variant of _combine_kernel: one DMA fetches K consecutive
    lanes' FULL row blocks (they are contiguous in the rows buffer), and
    the per-lane 16-row windows are dynamic sublane slices of the group
    buffer.  The per-(lane, half) copies of the ungrouped kernel are
    descriptor-bound (~16k copies of 8 KiB at the bench geometry); K=8
    cuts the copy count 8x for 2x the fetched bytes (both halves ride
    along) — a win while the combine is overhead-bound, not
    bandwidth-bound.  Shift semantics identical to _combine_kernel.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i32 = jnp.int32
    s = pl.program_id(0)
    lo = lo_ref[s]
    hi = hi_ref[s]
    ngroups = (hi - lo + K - 1) // K
    GR = 8 * (H * K + 1)  # group rows: K lanes x H*8 + one look-back tile

    def copy_group(g, slot):
        i0 = lo + g * K
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(H * i0 * 8, GR), :],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(0 < ngroups)
    def _first():
        copy_group(0, 0).start()

    lanes = jax.lax.broadcasted_iota(i32, (8, LANE), 1)

    def group_body(g, acc):
        slot = g & 1

        @pl.when(g + 1 < ngroups)
        def _next():
            copy_group(g + 1, (g + 1) & 1).start()

        copy_group(g, slot).wait()

        def lane_body(j, acc):
            i = lo + g * K + j
            ii = jnp.minimum(i, nlanes - 1)
            # Masked tail lanes (i >= hi) may carry a sentinel slab0; the
            # slice offset must stay in range even though the contribution
            # is discarded.
            h = jnp.clip(s - slab0_ref[ii], 0, H - 1)
            w8 = w8_ref[ii]
            roff = w8 >> 7
            b = w8 & 127
            # Lane i's padded window starts at group-local row (H*j+h)*8
            # (the group fetch begins at lane i0's look-back tile).
            win16 = buf[slot, pl.ds((H * j + h) * 8, 16)]
            G = pltpu.roll(win16, roff, axis=0)
            A = pltpu.roll(G, b, axis=1)
            contrib = jnp.where(lanes >= b, A[8:16], A[7:15])
            return acc | jnp.where(i < hi, contrib, 0)

        return jax.lax.fori_loop(0, K, lane_body, acc)

    acc = jax.lax.fori_loop(0, ngroups, group_body,
                            jnp.zeros((8, LANE), jnp.int32))
    out_ref[0] = acc


def linear_from_rows(rows, slab0, nslabs_total: int, H: int,
                     w8=None, interpret: bool | None = None,
                     group: int = 1):
    """Pallas combine: per-lane rows -> linear stream slab words.

    Args:
      rows: i32[Lp, H*1024] — lane ``l``'s payload bits from word 0 (zeros
        everywhere the lane holds no payload).  Bit 0 of the lane's half
        ``h`` lands at word ``w8[l]`` of output slab ``slab0[l] + h``.
      slab0: i32[Lp] — each lane's origin slab index, nondecreasing
        (padding lanes use a past-the-end sentinel).
      w8: i32[Lp] or None — per-lane word shift (multiple of 8, < 1024),
        applied inside the combine kernel.  None means already-aligned
        rows (shift 0).
      nslabs_total: output slabs (B * per-stream slabs).

    Returns i32[nslabs_total, 8, 128] — reshape to [B, Wpad] stream words.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Lp, WH = rows.shape
    assert WH == H * SLAB
    if w8 is None:
        w8 = jnp.zeros((Lp,), jnp.int32)

    sidx = jnp.arange(nslabs_total, dtype=jnp.int32)
    # Lanes with slab0 in (s-H, s] can contribute to slab s.
    lo = jnp.searchsorted(slab0, sidx - (H - 1), side="left").astype(jnp.int32)
    hi = jnp.searchsorted(slab0, sidx, side="right").astype(jnp.int32)

    if group > 1:
        K = group
        f = pl.pallas_call(
            functools.partial(_combine_kernel_grouped, H=H, K=K,
                              nlanes=Lp),
            grid=(nslabs_total,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 8, LANE), lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nslabs_total, 8, LANE),
                                           jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((2, 8 * (H * K + 1), LANE), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
    else:
        f = pl.pallas_call(
            functools.partial(_combine_kernel, H=H),
            grid=(nslabs_total,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, 8, LANE), lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nslabs_total, 8, LANE),
                                           jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((2, 16, LANE), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
    if interpret:
        # XLA oracle (the DMA machinery has no ANY-space interpreter):
        # rows[l, h*SLAB + j] lands at flat word slab0[l]*SLAB + w8[l] +
        # h*SLAB + j.  Contributions overlap only at chunk-boundary words
        # with disjoint bits, so an add-scatter equals the kernel's OR.
        idx = (slab0[:, None] * SLAB + w8[:, None]
               + jnp.arange(WH, dtype=jnp.int32)[None, :])
        total = nslabs_total * SLAB
        out = jnp.zeros(total, jnp.int32).at[
            jnp.clip(idx, 0, total).reshape(-1)
        ].add(
            jnp.where((idx >= 0) & (idx < total), rows, 0).reshape(-1),
            mode="drop",
        )
        return out.reshape(nslabs_total, 8, LANE)
    # Lead pad: one zero tile for the row-borrow look-back; tail pad: the
    # grouped kernel's fixed-size fetch may run past the last lane.
    tail = 8 * H * group if group > 1 else 0
    flat = jnp.pad(rows.reshape(Lp * H * 8, LANE), ((8, tail), (0, 0)))
    return f(lo, hi, slab0, w8, flat)


def stage_blocked_from_linear(words, chunk_starts, C: int, wwin: int,
                              interpret: bool | None = None,
                              dma_depth: int = 32):
    """Stage per-lane decode windows from linear zlib stream words.

    Args:
      words: u32/i32[B, W] — little-endian stream words (header included),
        exactly as ``encode_ultrafast_batch`` emits them.
      chunk_starts: i32[B, C] — absolute bit position of each chunk's first
        symbol (the encoder's ``num_chunks`` index).
      wwin: window words per lane (multiple of 128; see stage_wwin).

    Returns win i32[LB, wwin, 8, 128] for ops/pallas_decode2.decode_blocked:
    window bit 0 = chunk start bit.  Bits past the chunk's payload are the
    *following* stream bits (not zeros as in the blocked encoder's native
    output) — the decode kernel never consumes them: each lane exits after
    exactly S output bytes, and its exit bit position is verified against
    the index.
    """
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert wwin % LANE == 0
    if interpret:
        # The interpret path exercises the XLA oracle (the Pallas DMA
        # machinery has no faithful interpreter for ANY-space refs).
        return _stage_xla(words, chunk_starts, C, wwin)

    i32 = jnp.int32
    u32 = jnp.uint32
    B, W = words.shape
    L = B * C
    LB = -(-L // 1024)
    # Slab length: window words + worst-case in-slab offset (SLAB-1) + one
    # spare word for the bit shift's high half, rounded up to slabs.
    wl = (wwin + 2 * SLAB) // SLAB * SLAB  # >= wwin + (SLAB-1) + 1
    # Pad each stream row to slab multiple, plus wl slack so every slab
    # fetch is in bounds; flatten so per-lane offsets are single integers.
    Wpad = (W + SLAB - 1) // SLAB * SLAB
    wpad = jnp.pad(words.astype(i32), ((0, 0), (0, Wpad - W)))
    flat = jnp.concatenate(
        [wpad.reshape(-1), jnp.zeros((wl,), i32)])

    cs = chunk_starts.astype(i32).reshape(-1)
    pad = LB * 1024 - L
    if pad:
        cs = jnp.concatenate([cs, jnp.zeros((pad,), i32)])
    rows_of = jnp.repeat(jnp.arange(B, dtype=i32), C)
    if pad:
        rows_of = jnp.concatenate([rows_of, jnp.zeros((pad,), i32)])
    Lp = LB * 1024

    wordoff = rows_of * Wpad + (cs >> 5)   # flat word offset per lane
    blk = wordoff >> 10                    # slab index (provably aligned)
    woff = wordoff & (SLAB - 1)            # window start word inside slab
    sh = (cs & 31).astype(u32)             # sub-word bit shift

    rows = fetch_slabs(flat, blk, wl, dma_depth).reshape(Lp, wl)

    # Log-shift the window to word 0 of each row: 10 conditional row
    # shifts by 512..1 words — pure streaming selects, no gathers.
    for k in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        shifted = jnp.concatenate(
            [rows[:, k:], jnp.zeros((Lp, k), i32)], axis=1)
        rows = jnp.where((woff & k)[:, None] != 0, shifted, rows)

    lo = rows[:, :wwin].astype(u32) >> sh[:, None]
    hi = jnp.where(
        sh[:, None] == 0,
        u32(0),
        rows[:, 1 : wwin + 1].astype(u32) << ((32 - sh[:, None]) & 31),
    )
    out = (lo | hi).astype(i32)
    return out.reshape(LB, 8, LANE, wwin).transpose(0, 3, 1, 2)
