"""Device repack: standard zlib stream words -> lane-blocked decode windows.

Round-2's fast decode path (ops/pallas_decode2) consumed a proprietary
lane-blocked window layout that only the blocked encoder emitted — the
benchmarked roundtrip never produced bytes ``zlib.decompress`` could read
(VERDICT round 2, item 1).  This kernel closes that gap: it stages the v2
kernel's per-lane bit windows **straight from the linear, framed, valid-zlib
stream words** at the exact symbol-boundary bit offsets the encoder's chunk
index records.  The chain

    encode_ultrafast_batch (linear zlib words + chunk index)
      -> stage_blocked_from_linear (this kernel)
      -> decode_blocked (ops/pallas_decode2)

is the standard-artifact equivalent of the reference's
compress_to_vec_ultra_fast -> decompress_to_vec roundtrip
(/root/reference/src/compress/ultrafast.rs:70-91 +
/root/reference/src/decompress.rs:611-830): every intermediate byte stream
is a zlib stream any decoder accepts; the chunk index is sidecar metadata.

Design (TPU): per-lane windows live at arbitrary *bit* offsets of the
stream, so staging needs per-lane dynamic reads — the one access pattern
Mosaic's vector unit cannot do (lane-indexed VMEM gathers do not lower;
PERF_NOTES.md round-1 probes).  The DMA engines, however, take arbitrary
element offsets natively.  So the kernel:

1. issues one async copy per lane — ``words[row_i, w0_i : w0_i + wl]`` ->
   a VMEM row — where ``w0_i = chunk_start_i >> 5`` comes from SMEM
   (scalar loads with dynamic index are free);
2. bit-aligns each row with a per-lane variable shift (lane-variable
   shifts are ~free on the VPU: bench/probe_vpu.py varshift calibration);
3. corner-turns rows into the decode kernel's word-major layout
   ``win[LB, wwin, 8, 128]`` with in-VMEM 128-slab transposes (same
   relayout Mosaic already compiles for ops/pallas_decode2.corner_turn).

The XLA fallback (gather + shift, `_stage_xla`) is the bit-exact oracle
and the interpret-mode path for tests.
"""

from __future__ import annotations

import functools

import numpy as np

LANE = 128


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


def _kernel(row_ref, cs_ref, shv_ref, words_ref, out_ref, rows, sem, *,
            wwin: int, wl: int, dma_depth: int):
    """Stage one lane-block: 1024 DMAs -> per-lane shift -> corner turn.

    row_ref/cs_ref: SMEM i32[1, 1, 1024] — stream row / chunk start bit per
      lane (lane i of this block = (i // 128, i % 128) in the (8, 128)
      grid; the middle singleton satisfies Mosaic's block-shape rule).
    shv_ref: VMEM i32[1, 8, 128] — chunk_start & 31, pre-broadcast per lane
      (a scalar operand here would re-broadcast per use: the round-2
      kernel's 170-vector.broadcast lesson, ops/pallas_decode2._kernel_light).
    words_ref: ANY (HBM) i32[B, Wpad] — the linear zlib streams; Wpad has
      >= wl words of zero slack so every DMA is in bounds.
    rows: VMEM scratch i32[8, 128, wl] — lane-major landing pad.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u32 = jnp.uint32

    def copy_for(i, slot):
        b = row_ref[0, 0, i]
        w0 = cs_ref[0, 0, i] >> 5
        return pltpu.make_async_copy(
            words_ref.at[b, pl.ds(w0, wl)],
            rows.at[i // LANE, jax.lax.rem(i, LANE)],
            sem.at[slot],
        )

    def body(i, _):
        slot = jax.lax.rem(i, dma_depth)

        @pl.when(i >= dma_depth)
        def _drain():
            copy_for(i - dma_depth, slot).wait()

        copy_for(i, slot).start()
        return 0

    jax.lax.fori_loop(0, 8 * LANE, body, 0)
    for i in range(8 * LANE - dma_depth, 8 * LANE):
        # Drain the last dma_depth copies (each slot exactly once).
        copy_for(i, i % dma_depth).wait()

    sh = shv_ref[0][:, :, None]                       # [8, 128, 1]
    inv = ((32 - sh) & 31).astype(u32)
    for js in range(wwin // LANE):
        g = rows[:, :, js * LANE : (js + 1) * LANE].astype(u32)
        gn = rows[:, :, js * LANE + 1 : (js + 1) * LANE + 1].astype(u32)
        sw = (g >> sh.astype(u32)) | jnp.where(sh == 0, u32(0), gn << inv)
        out_ref[0, js * LANE : (js + 1) * LANE] = jnp.transpose(
            sw.astype(jnp.int32), (2, 0, 1)
        )


def stage_blocked_from_linear(words, chunk_starts, C: int, wwin: int,
                              interpret: bool | None = None,
                              dma_depth: int = 16):
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert wwin % LANE == 0
    if interpret:
        # The interpret path exercises the XLA oracle (the Pallas DMA
        # machinery has no faithful interpreter for ANY-space refs).
        return _stage_xla(words, chunk_starts, C, wwin)

    i32 = jnp.int32
    B, W = words.shape
    L = B * C
    LB = -(-L // 1024)
    wl = wwin + 8  # one spare word for the shift's high half + DMA comfort

    wpad = jnp.pad(
        words.astype(jnp.uint32), ((0, 0), (0, wl + 2))
    ).astype(i32)

    cs = chunk_starts.astype(i32).reshape(-1)
    pad = LB * 1024 - L
    if pad:
        cs = jnp.concatenate([cs, jnp.zeros((pad,), i32)])
    rows_of = jnp.repeat(jnp.arange(B, dtype=i32), C)
    if pad:
        rows_of = jnp.concatenate([rows_of, jnp.zeros((pad,), i32)])
    cs = cs.reshape(LB, 1, 1024)
    rows_of = rows_of.reshape(LB, 1, 1024)
    shv = (cs & 31).reshape(LB, 8, LANE)

    f = pl.pallas_call(
        functools.partial(_kernel, wwin=wwin, wl=wl, dma_depth=dma_depth),
        grid=(LB,),
        in_specs=[
            pl.BlockSpec((1, 1, 1024), lambda lb: (lb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1024), lambda lb: (lb, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, LANE), lambda lb: (lb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, wwin, 8, LANE), lambda lb: (lb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LB, wwin, 8, LANE), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, LANE, wl), jnp.int32),
            pltpu.SemaphoreType.DMA((dma_depth,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return f(rows_of, cs, shv, wpad)
