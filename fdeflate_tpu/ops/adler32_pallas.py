"""Pallas TPU kernel for Adler-32 tile reduction.

The checksum is two modular sums: A = 1 + sum(d), B = len + sum((len-i)d_i).
Per (8, 128)-aligned tile the kernel computes the plain and position-weighted
partial sums in int32 (tile sums stay below 2^31), and the host-visible
combine folds tiles with the associative (A, B, len) rule from ops/adler32.

This is the VPU-friendly formulation of the reference's streaming
simd-adler32 usage (src/decompress.rs:111,311): elementwise multiplies and
2-D reductions, no serial carry chain.

The kernel runs in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations


import numpy as np

from .adler32 import MOD

_LANES = 128
_SUBLANES = 8
_TILE = _LANES * _SUBLANES  # 1024 bytes per grid step; weighted sum < 2^31

# Single-launch bound: tile partials fold with int32 sums.  Larger inputs
# auto-chunk and fold with the associative combine.  Module-level so tests
# can shrink it to exercise the fold without 32 MiB arrays.
CHUNK_BYTES = 1 << 25


def _tile_kernel(x_ref, sums_ref, wsums_ref):
    import jax
    import jax.numpy as jnp

    x = x_ref[0].astype(jnp.int32)  # [SUBLANES, LANES]
    # Position within the tile, row-major: weight = TILE - pos.
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    pos = row * _LANES + col
    w = _TILE - pos
    sums_ref[0, 0] = jnp.sum(x)
    wsums_ref[0, 0] = jnp.sum(x * w)


def adler32_pallas(data, length=None, interpret: bool | None = None):
    """Adler-32 of a 1-D uint8 array via a Pallas tile-reduction kernel.

    ``length`` masks a zero-padded buffer.  Returns a uint32 scalar.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n = data.shape[0]
    if n > CHUNK_BYTES:
        from .adler32 import combine_jax

        if length is None:
            length = n
        total = None
        for lo in range(0, n, CHUNK_BYTES):
            piece = data[lo : lo + CHUNK_BYTES]
            plen = jnp.clip(length - lo, 0, piece.shape[0])
            ck = adler32_pallas(piece, plen, interpret=interpret)
            total = ck if total is None else combine_jax(total, ck, plen)
        return total
    if length is None:
        length = n
        d = data.astype(jnp.int32)
    else:
        mask = jnp.arange(n, dtype=jnp.int32) < length
        d = jnp.where(mask, data.astype(jnp.int32), 0)

    pad = (-n) % _TILE
    if pad:
        d = jnp.pad(d, (0, pad))
    num_tiles = d.shape[0] // _TILE
    tiles = d.reshape(num_tiles, _SUBLANES, _LANES)

    sums, wsums = pl.pallas_call(
        _tile_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, _SUBLANES, _LANES), lambda i: (i, 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 1), jnp.int32),
            jax.ShapeDtypeStruct((num_tiles, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tiles)
    sums = sums[:, 0] % MOD
    wsums = wsums[:, 0] % MOD

    # Fold tiles: contribution of tile k with global offset o_k is
    # (len - o_k - TILE) * S_k + W_k  (mod MOD).
    offsets = jnp.arange(num_tiles, dtype=jnp.int32) * _TILE
    coeff = (length - offsets - _TILE) % MOD
    prod = (coeff.astype(jnp.uint32) * sums.astype(jnp.uint32)) % MOD
    total_w = (jnp.sum(prod.astype(jnp.int32)) + jnp.sum(wsums)) % MOD
    a = (1 + jnp.sum(sums)) % MOD
    b = (length % MOD + total_w) % MOD
    return (b.astype(jnp.uint32) << 16) | a.astype(jnp.uint32)
