"""Tests for the Huffman foundation layer.

Mirrors the reference's huffman-table unit tests (src/huffman.rs:186-481):
RFC 1951 worked examples, the 15-bit lopsided secondary-table tree, entry
format invariants, and the fixed-table golden equivalence
(src/decompress.rs:1219-1233).
"""

import pathlib

import numpy as np
import pytest

from fdeflate_tpu import huffman as H
from fdeflate_tpu import tables as T

GOLDEN = pathlib.Path(__file__).parent / "golden"


def litlen_tables(bits, lengths):
    r = H.build_table(
        np.asarray(lengths),
        T.LITLEN_TABLE_ENTRIES,
        1 << bits,
        is_distance_table=False,
        double_literal=True,
    )
    return r if r.ok else None


def decode(tables, bits, stream_value):
    """Decode one step from a (bit-reversed LSB-first) integer bit pattern."""
    mask = (1 << bits) - 1
    entry = int(tables.primary[stream_value & mask])
    if entry & T.LITERAL_ENTRY:
        count = (entry >> 8) & 0xF
        s1 = (entry >> 16) & 0xFF
        s2 = (entry >> 24) & 0xFF
        input_bits = entry & 0xF
        if count == 1:
            return ("single", s1, input_bits)
        assert count == 2
        return ("double", s1, s2, input_bits)
    if entry & T.SECONDARY_TABLE_ENTRY:
        idx = (entry >> 16) + ((stream_value >> bits) & (entry & 0xFF))
        e2 = int(tables.secondary[idx])
        return ("secondary", e2 >> 4, e2 & 0xF)
    return ("other", entry)


def rev8(v):
    return int(f"{v:08b}"[::-1], 2)


def rev16(v):
    return int(f"{v:016b}"[::-1], 2)


class TestRfc1951Examples:
    def test_example_page8(self):
        # Symbols A..D with lengths (2, 1, 3, 3): B=0, A=10, C=110, D=111.
        t = litlen_tables(12, [2, 1, 3, 3])
        assert t is not None
        assert decode(t, 12, rev8(0b0_0_000000)) == ("double", 1, 1, 2)
        assert decode(t, 12, rev8(0b110_110_00)) == ("double", 2, 2, 6)
        assert decode(t, 12, rev8(0b111_111_00)) == ("double", 3, 3, 6)
        assert decode(t, 12, rev8(0b0_10_00000)) == ("double", 1, 0, 3)

    def test_example_page9(self):
        t = litlen_tables(12, [3, 3, 3, 3, 3, 2, 4, 4])
        assert t is not None
        assert decode(t, 12, rev8(0b010_011_00)) == ("double", 0, 1, 6)
        assert decode(t, 12, rev8(0b00_00_0000)) == ("double", 5, 5, 4)
        assert decode(t, 12, rev8(0b1111_1110)) == ("double", 7, 6, 8)


class TestSecondaryTable:
    def test_lopsided_15bit_tree(self):
        lengths = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 15]
        t = litlen_tables(12, lengths)
        assert t is not None
        assert decode(t, 12, rev8(0b0_0_000000)) == ("double", 0, 0, 2)
        assert decode(t, 12, rev8(0b1110_1110)) == ("double", 3, 3, 8)
        assert decode(t, 12, rev16(0b1111_1111_1111_1110)) == ("secondary", 15, 15)
        assert decode(t, 12, rev16(0b1111_1111_1111_1111)) == ("secondary", 15, 15)

    def test_entry_format_invariants(self):
        lengths = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 15]
        t = litlen_tables(12, lengths)
        for i, entry in enumerate(t.primary):
            entry = int(entry)
            if entry & T.LITERAL_ENTRY:
                count = (entry >> 8) & 0x7F
                assert count in (1, 2), (i, hex(entry))
                input_bits = entry & 0xFF
                assert 1 <= input_bits <= 15
            elif entry & T.SECONDARY_TABLE_ENTRY:
                overflow_mask = entry & 0xFF
                overflow_bits = bin(overflow_mask + 1).count("0") - 1
                assert overflow_mask > 0
                assert (entry >> 16) + overflow_mask <= len(t.secondary)


class TestIncompleteTrees:
    def test_oversubscribed_rejected(self):
        assert litlen_tables(12, [1, 1, 1]) is None

    def test_undersubscribed_rejected(self):
        assert litlen_tables(12, [2, 2, 2]) is None

    def test_distance_zero_symbols_rejected(self):
        # All-zero distance lengths never reach build_table: the decompressor
        # special-cases them by zero-filling the table (reference:
        # src/decompress.rs:588-590); build_table itself rejects.
        r = H.build_table(
            np.zeros(32, np.int64), T.DISTANCE_TABLE_ENTRIES, 512,
            is_distance_table=True, double_literal=False,
        )
        assert not r.ok

    def test_distance_single_symbol_ok(self):
        lengths = np.zeros(32, np.int64)
        lengths[3] = 1
        r = H.build_table(
            lengths, T.DISTANCE_TABLE_ENTRIES, 512,
            is_distance_table=True, double_literal=False,
        )
        assert r.ok
        assert int(r.primary[0]) == int(T.DISTANCE_TABLE_ENTRIES[3]) | 1
        assert int(r.primary[1]) == 0


class TestFixedTables:
    """Building from FIXED_CODE_LENGTHS must reproduce the reference's
    precomputed constants exactly (reference: src/decompress.rs:1219-1233)."""

    def test_litlen_golden(self):
        golden = np.load(GOLDEN / "fixed_litlen_table.npy").astype(np.uint32)
        assert np.array_equal(H.FIXED_LITLEN_TABLE, golden)

    def test_dist_golden(self):
        golden = np.load(GOLDEN / "fixed_dist_table.npy").astype(np.uint32)
        assert np.array_equal(H.FIXED_DIST_TABLE, golden)

    def test_4096_replication(self):
        # The 4096-entry table for fixed blocks replicates the 512-entry one
        # 8 times (reference: src/decompress.rs:399-406).
        r = H.build_table(
            T.FIXED_CODE_LENGTHS[:288], T.LITLEN_TABLE_ENTRIES, 4096,
            is_distance_table=False, double_literal=True,
        )
        assert r.ok
        # Every 512-slice equals the fixed table except where double literals
        # got longer total codes (double-literals can use up to 12 bits here).
        # Single-symbol decode agrees everywhere:
        for idx in [0, 1, 5, 100, 511, 1000, 4095]:
            e_small = int(H.FIXED_LITLEN_TABLE[idx & 511])
            e_big = int(r.primary[idx])
            if not (e_big & T.LITERAL_ENTRY and (e_big >> 8) & 0xF == 2):
                assert e_small == e_big


class TestComputeCodeLengths:
    def test_simple(self):
        freqs = np.array([100, 50, 25, 25, 1])
        lengths = H.compute_code_lengths(
            freqs, np.ones(5, np.int64), np.full(5, 15, np.int64))
        # Kraft sum must be exactly 1 for an optimal complete code.
        assert sum(2.0 ** -l for l in lengths) == 1.0
        assert lengths[0] <= lengths[1] <= lengths[2]

    def test_length_limited(self):
        freqs = np.array([1000, 500, 200, 50, 10, 3, 2, 1])
        lengths = H.compute_code_lengths(
            freqs, np.ones(8, np.int64), np.full(8, 3, np.int64))
        assert lengths.max() <= 3
        assert sum(2.0 ** -l for l in lengths) <= 1.0

    def test_min_limit(self):
        freqs = np.array([1000, 1, 1, 1])
        lengths = H.compute_code_lengths(
            freqs, np.full(4, 2, np.int64), np.full(4, 4, np.int64))
        assert lengths.min() >= 2


class TestCanonicalCodes:
    def test_trained_tree_complete(self):
        codes = T.canonical_codes(T.HUFFMAN_LENGTHS)
        assert codes is not None
        assert codes[0] == 0

    def test_incomplete_returns_none(self):
        assert T.canonical_codes(np.array([2, 2, 2])) is None

    def test_prefix_free(self):
        lengths = np.array([3, 3, 3, 3, 3, 2, 4, 4])
        codes = T.canonical_codes(lengths)
        # Reconstruct LSB-first bit strings and check prefix-freedom.
        strings = []
        for c, l in zip(codes, lengths):
            strings.append(format(int(c), f"0{int(l)}b")[::-1])
        for i, a in enumerate(strings):
            for j, b in enumerate(strings):
                if i != j:
                    assert not b.startswith(a)
