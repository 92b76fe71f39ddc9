"""Adler-32 checksums: host (zlib C) and device (JAX, combinable).

The reference streams bytes through simd-adler32 (decompress.rs:111,311).  On
TPU the checksum is reformulated as a pair of modular reductions so that

* a single chip computes it with vectorized sums over 4 KiB tiles, and
* per-chunk / per-chip partial states fold associatively — the multi-chip
  reduction (SURVEY.md P4) is a ``psum``-style tree combine of
  ``(A, B, length)`` triples.

Definitions (RFC 1950): A = 1 + sum(d_i) mod 65521,
B = sum over prefixes of A = len + sum((len - i) * d_i) mod 65521.
"""

from __future__ import annotations

import zlib

import numpy as np

MOD = 65521
_TILE = 4096  # max weighted tile sum 255*4096*4097/2 < 2^31, fits int32


def adler32(data: bytes | bytearray | memoryview, value: int = 1) -> int:
    """Host-path Adler-32 (delegates to zlib's C implementation)."""
    return zlib.adler32(bytes(data), value)


def combine(a1: int, a2: int, len2: int) -> int:
    """Combine adler32(x) and adler32(y) into adler32(x ++ y)."""
    rem = len2 % MOD
    s1a, s2a = a1 & 0xFFFF, (a1 >> 16) & 0xFFFF
    s1b, s2b = a2 & 0xFFFF, (a2 >> 16) & 0xFFFF
    s1 = (s1a + s1b - 1) % MOD
    s2 = (s2a + s2b + rem * (s1a - 1) - 0) % MOD
    return ((s2 % MOD) << 16) | s1


def combine_jax(a1, a2, len2):
    """jnp twin of ``combine`` for on-device checksum folding (u32 scalars)."""
    import jax.numpy as jnp

    u32 = jnp.uint32
    a1 = jnp.asarray(a1).astype(u32)
    a2 = jnp.asarray(a2).astype(u32)
    rem = (jnp.asarray(len2).astype(u32) % MOD)
    s1a, s2a = a1 & 0xFFFF, (a1 >> 16) & 0xFFFF
    s1b, s2b = a2 & 0xFFFF, (a2 >> 16) & 0xFFFF
    s1 = (s1a + s1b + (MOD - 1)) % MOD
    # rem * s1' < 65521^2 < 2^32: mod before adding the 16-bit terms.
    cross = (rem * ((s1a + (MOD - 1)) % MOD)) % MOD
    s2 = (s2a + s2b + cross) % MOD
    return (s2 << 16) | s1


def adler32_numpy(data: np.ndarray, value: int = 1) -> int:
    """Pure-numpy Adler-32 over a uint8 array (reference for the JAX path)."""
    data = np.asarray(data, dtype=np.uint8)
    n = len(data)
    a0 = value & 0xFFFF
    b0 = (value >> 16) & 0xFFFF
    d = data.astype(np.int64)
    a = (a0 + int(d.sum())) % MOD
    weights = np.arange(n, 0, -1, dtype=np.int64)
    b = (b0 + n * a0 + int((weights * d).sum())) % MOD
    return (b << 16) | a


def adler32_jax(data, length=None):
    """Device-path Adler-32 over a uint8/int32 JAX array.

    ``data`` is a 1-D array of byte values; ``length`` (optional scalar) masks
    the logical length when the buffer is padded — padded tail bytes must be
    zero-weighted.  Returns an int32 scalar (bit pattern of the u32 checksum).

    Vectorization: reshape to (T, 4096) tiles; per-tile plain and weighted
    sums fit in int32; tiles fold with the associative combine rule.
    """
    import jax.numpy as jnp

    d = data.astype(jnp.int32)
    n = d.shape[0]
    if length is None:
        length = n
        mask = None
    else:
        mask = (jnp.arange(n, dtype=jnp.int32) < length).astype(jnp.int32)
        d = d * mask

    pad = (-n) % _TILE
    if pad:
        d = jnp.pad(d, (0, pad))
    tiles = d.reshape(-1, _TILE)

    tile_sum = jnp.sum(tiles, axis=1) % MOD  # S_k
    w = jnp.arange(_TILE, 0, -1, dtype=jnp.int32)
    tile_wsum = jnp.sum(tiles * w, axis=1) % MOD  # W_k = sum (TILE - i) * d_i

    # Global: sum(d) and sum((len - g) * d_g) where g is the global index.
    # For tile k at offset o_k: len - g = (len - o_k - TILE) + (TILE - i).
    num_tiles = tiles.shape[0]
    offsets = jnp.arange(num_tiles, dtype=jnp.int32) * _TILE
    coeff = (length - offsets - _TILE) % MOD  # may wrap, fine mod MOD
    total_sum = jnp.sum(tile_sum) % MOD
    # coeff * tile_sum < MOD^2 < 2^32: do the product in uint32.
    prod = (coeff.astype(jnp.uint32) * tile_sum.astype(jnp.uint32)) % MOD
    total_wsum = (jnp.sum(prod.astype(jnp.int32)) + jnp.sum(tile_wsum)) % MOD

    a = (1 + total_sum) % MOD
    b = (length % MOD + total_wsum) % MOD
    return (b.astype(jnp.uint32) << 16) | a.astype(jnp.uint32)


def adler32_partial_jax(data, length=None):
    """Device partial state ``(A, B, len)`` for cross-chip combining."""
    import jax.numpy as jnp

    checksum = adler32_jax(data, length)
    a = (checksum & 0xFFFF).astype(jnp.int32)
    b = (checksum >> 16).astype(jnp.int32)
    n = length if length is not None else data.shape[0]
    return a, b, jnp.asarray(n, jnp.int32)


def combine_partials_jax(p1, p2):
    """Associative combine of two ``(A, B, len)`` partial states (device)."""
    import jax.numpy as jnp

    a1, b1, n1 = p1
    a2, b2, n2 = p2
    rem = (n2 % MOD).astype(jnp.uint32)
    a = (a1 + a2 - 1) % MOD
    # rem * (a1 - 1 + MOD) < 2^32 in uint32.
    cross = (rem * ((a1 - 1 + MOD) % MOD).astype(jnp.uint32)) % MOD
    b = (b1 + b2 + cross.astype(jnp.int32)) % MOD
    return a % MOD, b, n1 + n2
