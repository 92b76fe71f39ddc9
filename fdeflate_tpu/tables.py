"""DEFLATE constant tables (RFC 1951) and the PNG-corpus-trained Huffman tree.

This is the TPU-native equivalent of the reference's constant layer
(/root/reference/src/tables.rs).  Everything that the DEFLATE spec defines is
*derived* programmatically here (rather than spelled out) so the construction
itself documents the format; the corpus-trained code lengths are data.

All tables are exposed as numpy arrays so that both the host (numpy) paths and
the device (JAX) paths can consume them; device code converts them to
``jnp`` arrays once at trace time.

Decode-table entry format (reference: src/tables.rs:90-140, decompress.rs:61-67)
--------------------------------------------------------------------------------
The 4096-entry literal/length decode table and 512-entry distance decode table
use 32-bit entries with four flavours::

  aaaaaaaa_bbbbbbbb_100000yy_0000xxxx   literal: x=input bits, y=output bytes,
                                        a/b = second/first literal byte
  0000000z_zzzzzzzz_00000yyy_0000xxxx   length: z=length base, y=extra bits
  00000000_00000000_01000000_0000xxxx   EOF
  0000xxxx_xxxxxxxx_01100000_mmmmmmmm   secondary-table pointer, m=overflow mask
  00000000_00000000_01000000_00000000   invalid code

We keep this format bit-for-bit: it packs a full decode decision into one
32-bit gather, which is exactly what both a scalar host loop and a TPU
lane-parallel gather loop want.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Entry flag bits (reference: src/decompress.rs:61-63)
# ---------------------------------------------------------------------------
LITERAL_ENTRY = 0x8000
EXCEPTIONAL_ENTRY = 0x4000
SECONDARY_TABLE_ENTRY = 0x2000

# Default decode table sizes (reference: src/decompress.rs:65-67).
DEFAULT_LITLEN_TABLE_SIZE = 4096
DEFAULT_DIST_TABLE_SIZE = 512

# ---------------------------------------------------------------------------
# Length / distance symbol tables (RFC 1951 section 3.2.5)
# ---------------------------------------------------------------------------

# Base match length for each length symbol 257..285 (index 0 == symbol 257).
LEN_SYM_TO_LEN_BASE = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51, 59,
     67, 83, 99, 115, 131, 163, 195, 227, 258],
    dtype=np.int64,
)

# Number of extra bits for each length symbol 257..285.
LEN_SYM_TO_LEN_EXTRA = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4,
     5, 5, 5, 5, 0],
    dtype=np.int64,
)

# Base distance for each distance symbol 0..29.
DIST_SYM_TO_DIST_BASE = np.array(
    [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385, 513,
     769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385, 24577],
    dtype=np.int64,
)

# Number of extra bits for each distance symbol 0..29.
DIST_SYM_TO_DIST_EXTRA = np.array(
    [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10,
     11, 11, 12, 12, 13, 13],
    dtype=np.int64,
)

# Order in which code-length-code lengths appear in a dynamic block header
# (RFC 1951 section 3.2.7).
CLCL_ORDER = np.array(
    [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15],
    dtype=np.int64,
)

# BITMASKS[n] == (1 << n) - 1 for n in 0..16.
BITMASKS = np.array([(1 << n) - 1 for n in range(17)], dtype=np.int64)


def _build_length_maps() -> tuple[np.ndarray, np.ndarray]:
    """Map match length (3..258, indexed by length-3) to symbol / extra bits.

    Derived from the per-symbol base/extra tables; matches the reference's
    LENGTH_TO_SYMBOL / LENGTH_TO_LEN_EXTRA (src/tables.rs:28-55).
    """
    to_symbol = np.zeros(256, dtype=np.int64)
    to_extra = np.zeros(256, dtype=np.int64)
    for i in range(28):  # symbols 257..284 cover lengths 3..257
        base = int(LEN_SYM_TO_LEN_BASE[i])
        extra = int(LEN_SYM_TO_LEN_EXTRA[i])
        span = 1 << extra
        to_symbol[base - 3 : base - 3 + span] = 257 + i
        to_extra[base - 3 : base - 3 + span] = extra
    # Length 258 has its own dedicated symbol with no extra bits.
    to_symbol[255] = 285
    to_extra[255] = 0
    return to_symbol, to_extra


LENGTH_TO_SYMBOL, LENGTH_TO_LEN_EXTRA = _build_length_maps()


def distance_to_dist_sym(distance: int) -> int:
    """Distance (1..32768) -> distance symbol (0..29).

    Reference: src/compress/bitstream.rs:16-27.
    """
    return int(_DISTANCE_TO_SYM[distance - 1])


def _build_distance_map() -> np.ndarray:
    out = np.zeros(32768, dtype=np.int64)
    for sym in range(30):
        base = int(DIST_SYM_TO_DIST_BASE[sym])
        span = 1 << int(DIST_SYM_TO_DIST_EXTRA[sym])
        out[base - 1 : base - 1 + span] = sym
    return out


_DISTANCE_TO_SYM = _build_distance_map()
DISTANCE_TO_SYM = _DISTANCE_TO_SYM  # vectorized variant: DISTANCE_TO_SYM[dist-1]

# ---------------------------------------------------------------------------
# Corpus-trained literal/length code (data, not derivable from the spec).
#
# 286 code lengths, all <= 12 bits, trained on a large corpus of filtered PNG
# images.  Reference: src/tables.rs:7-20.  Used by the ultra-fast compressor's
# single fixed tree.
# ---------------------------------------------------------------------------
_TRAINED_RLE = [
    # (code length, repeat count) — literals 0..255:
    (2, 1), (3, 1), (4, 1), (5, 2), (6, 2), (7, 3), (8, 5), (9, 7), (10, 9),
    (11, 12), (12, 171), (11, 10), (10, 1), (11, 1), (10, 9), (9, 5), (8, 1),
    (9, 1), (8, 5), (7, 3), (6, 3), (5, 1), (4, 1), (3, 1),
    # EOF (256) and length symbols 257..285:
    (12, 3), (9, 2), (11, 1), (10, 1), (11, 2), (10, 1), (11, 6), (12, 1),
    (11, 1), (12, 11), (9, 1),
]
HUFFMAN_LENGTHS = np.array(
    [length for length, count in _TRAINED_RLE for _ in range(count)],
    dtype=np.int64,
)
assert HUFFMAN_LENGTHS.shape == (286,)


def canonical_codes(lengths: np.ndarray, max_length: int = 16) -> np.ndarray | None:
    """Assign canonical Huffman codes, bit-reversed for LSB-first streams.

    Returns ``None`` if the lengths do not describe a *complete* code
    (the codespace must be exactly filled).  Mirrors the validity condition of
    the reference's compute_codes (src/lib.rs:103-127).
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    codes = np.zeros(lengths.shape, dtype=np.int64)
    code = 0
    for length in range(1, max_length + 1):
        (syms,) = np.nonzero(lengths == length)
        if len(syms):
            seq = code + np.arange(len(syms), dtype=np.int64)
            codes[syms] = _bit_reverse(seq, length)
            code += len(syms)
        code <<= 1
    if code != 2 << max_length:
        return None
    return codes


def _bit_reverse(values: np.ndarray, nbits: int) -> np.ndarray:
    out = np.zeros_like(values)
    v = values.copy()
    for _ in range(nbits):
        out = (out << 1) | (v & 1)
        v >>= 1
    return out


HUFFMAN_CODES = canonical_codes(HUFFMAN_LENGTHS)
assert HUFFMAN_CODES is not None, "trained HUFFMAN_LENGTHS must form a complete code"

# ---------------------------------------------------------------------------
# Decode-table entry templates (reference: src/tables.rs:99-140).
# build_table ORs the code length into the low 4 bits of these.
# ---------------------------------------------------------------------------


def _build_litlen_entries() -> np.ndarray:
    entries = np.full(288, EXCEPTIONAL_ENTRY, dtype=np.uint32)
    lits = np.arange(256, dtype=np.uint32)
    entries[:256] = (lits << 16) | LITERAL_ENTRY | (1 << 8)
    sym = np.arange(257, 286)
    entries[257:286] = (
        (LEN_SYM_TO_LEN_BASE.astype(np.uint32) << 16)
        | (LEN_SYM_TO_LEN_EXTRA.astype(np.uint32) << 8)
    )
    del sym
    return entries


def _build_distance_entries() -> np.ndarray:
    entries = np.zeros(32, dtype=np.uint32)
    entries[:30] = (
        (DIST_SYM_TO_DIST_BASE.astype(np.uint32) << 16)
        | (DIST_SYM_TO_DIST_EXTRA.astype(np.uint32) << 8)
        | LITERAL_ENTRY
    )
    return entries


LITLEN_TABLE_ENTRIES = _build_litlen_entries()
DISTANCE_TABLE_ENTRIES = _build_distance_entries()


def fixed_code_lengths() -> np.ndarray:
    """The fixed-Huffman block code lengths (RFC 1951 section 3.2.6).

    320 lengths: 288 literal/length codes followed by 32 distance codes.
    Reference: src/tables.rs:205-232.
    """
    lengths = np.zeros(320, dtype=np.int64)
    lengths[0:144] = 8
    lengths[144:256] = 9
    lengths[256:280] = 7
    lengths[280:288] = 8
    lengths[288:320] = 5
    return lengths


FIXED_CODE_LENGTHS = fixed_code_lengths()

# The precomputed fixed-block decode tables are built once at import from
# FIXED_CODE_LENGTHS by the table builder in huffman.py (it lives there to
# avoid an import cycle).  See huffman.FIXED_LITLEN_TABLE / FIXED_DIST_TABLE.
