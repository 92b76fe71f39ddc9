"""Crafted-stream decode tests.

zlib's encoder never produces >9-bit code lengths for small alphabets, so
the secondary-table decode paths (litlen codes >12 bits, dist codes >9 bits)
need hand-built streams.  A tiny deflate stream builder emits dynamic blocks
from explicit code-length vectors; every decoder (Python streaming, native
C++, device batch) must agree, and zlib validates the expected output.
"""

import zlib

import numpy as np
import pytest

import fdeflate_tpu as F
from fdeflate_tpu import errors as E
from fdeflate_tpu.models.native import available as native_available, inflate
from fdeflate_tpu.ops.bitio import BitWriter
from fdeflate_tpu.ops.inflate import decompress_batch
from fdeflate_tpu.tables import (
    CLCL_ORDER,
    DIST_SYM_TO_DIST_BASE,
    DIST_SYM_TO_DIST_EXTRA,
    LENGTH_TO_LEN_EXTRA,
    LENGTH_TO_SYMBOL,
    canonical_codes,
)


def emit_dynamic_block(
    litlen_lengths: np.ndarray,
    dist_lengths: np.ndarray,
    symbols: list,
) -> bytes:
    """Build a complete one-block zlib stream from explicit code lengths.

    ``symbols``: ints < 256 are literals; tuples are (length, distance).
    Code-length codes are sent without 16/17/18 run-length encoding (the
    framework's own header style).
    """
    litlen_codes = canonical_codes(litlen_lengths)
    assert litlen_codes is not None, "litlen lengths must form a complete code"
    ndist = len(dist_lengths)
    if dist_lengths.any():
        dist_codes = canonical_codes(dist_lengths)
        if dist_codes is None:
            # Single 1-bit distance code (legal in DEFLATE): code '0'.
            assert (dist_lengths == 1).sum() == 1 and dist_lengths.max() == 1
            dist_codes = np.zeros(ndist, np.int64)
    else:
        dist_codes = np.zeros(ndist, np.int64)

    nlit = len(litlen_lengths)
    cl_freq = np.bincount(
        np.concatenate([litlen_lengths, dist_lengths]), minlength=19
    )[:19]
    from fdeflate_tpu.models.bitstream import build_huffman_tree

    cl_lengths, cl_codes, _ = build_huffman_tree(cl_freq, 7)

    w = BitWriter(bytearray(b"\x78\x01"))
    w.write_bits(0b101, 3)  # BFINAL=1, BTYPE=dynamic
    w.write_bits(nlit - 257, 5)
    w.write_bits(ndist - 1, 5)
    w.write_bits(15, 4)
    for j in range(19):
        w.write_bits(int(cl_lengths[CLCL_ORDER[j]]), 3)
    for ln in np.concatenate([litlen_lengths, dist_lengths]):
        w.write_bits(int(cl_codes[ln]), int(cl_lengths[ln]))

    out = bytearray()
    for sym in symbols:
        if isinstance(sym, tuple):
            length, distance = sym
            lsym = int(LENGTH_TO_SYMBOL[length - 3])
            w.write_bits(int(litlen_codes[lsym]), int(litlen_lengths[lsym]))
            extra = int(LENGTH_TO_LEN_EXTRA[length - 3])
            w.write_bits((length - 3) & ((1 << extra) - 1), extra)
            dsym = next(
                s
                for s in range(29, -1, -1)
                if int(DIST_SYM_TO_DIST_BASE[s]) <= distance
            )
            w.write_bits(int(dist_codes[dsym]), int(dist_lengths[dsym]))
            dextra = int(DIST_SYM_TO_DIST_EXTRA[dsym])
            w.write_bits(distance - int(DIST_SYM_TO_DIST_BASE[dsym]), dextra)
            for _ in range(length):
                out.append(out[-distance])
        else:
            w.write_bits(int(litlen_codes[sym]), int(litlen_lengths[sym]))
            out.append(sym)
    w.write_bits(int(litlen_codes[256]), int(litlen_lengths[256]))
    stream = bytes(w.flush()) + zlib.adler32(bytes(out)).to_bytes(4, "big")
    return stream, bytes(out)


def all_decoders_agree(stream: bytes, expected: bytes):
    assert zlib.decompress(stream) == expected  # external validation
    # Python streaming decoder
    from fdeflate_tpu.models.decompressor import _decompress_to_vec_python

    assert _decompress_to_vec_python(stream, None) == expected
    # Device batch decoder
    assert decompress_batch([stream], max_steps=1024)[0] == expected
    # Native
    if native_available():
        assert inflate(stream) == expected


def lopsided_lengths(num_symbols: int = 16) -> np.ndarray:
    """Lengths 1,2,...,14,15,15 — codes up to 15 bits (secondary tables)."""
    lengths = np.zeros(286, np.int64)
    seq = list(range(1, 15)) + [15, 15]
    # Assign: symbols 0..13 get 1..14; symbol 256 and 14 get 15.
    for i, ln in enumerate(seq[:-2]):
        lengths[i] = ln
    lengths[14] = 15
    lengths[256] = 15
    return lengths


class TestSecondaryTables:
    def test_15bit_litlen_codes(self):
        lengths = lopsided_lengths()
        symbols = [0, 1, 2, 13, 14, 14, 0, 5, 9, 14]
        stream, expected = emit_dynamic_block(
            lengths, np.zeros(30, np.int64), symbols
        )
        all_decoders_agree(stream, expected)

    def test_secondary_litlen_backref(self):
        # 15-bit literal codes mixed with a length symbol of moderate depth.
        lengths = np.zeros(286, np.int64)
        seq = list(range(1, 15)) + [15, 15]
        for i, ln in enumerate(seq[:-2]):
            lengths[i] = ln
        lengths[14] = 15
        lengths[256] = 15
        # give symbol 257 (length 3) the other 15-bit slot... need exact
        # codespace: replace symbol 14's 15-bit with 257.
        lengths[14] = 0
        lengths[257] = 15
        dist = np.zeros(30, np.int64)
        dist[0] = 1  # distance 1, 1-bit code
        symbols = [7, 7, (3, 1), 2, 1]
        stream, expected = emit_dynamic_block(lengths, dist, symbols)
        assert expected == bytes([7, 7, 7, 7, 7, 2, 1])
        all_decoders_agree(stream, expected)

    def test_long_distance_codes(self):
        # Distance codes >9 bits: distances across many dist symbols with a
        # skewed dist tree.
        lengths = np.zeros(286, np.int64)
        lengths[ord("a")] = 2
        lengths[ord("b")] = 2
        lengths[256] = 2
        lengths[257] = 2  # length-3 backref
        dist = np.zeros(30, np.int64)
        # 14 distance symbols: lengths 1,2,3,...,13,13 -> up to 13 bits
        seq = list(range(1, 14)) + [13]
        for i, ln in enumerate(seq):
            dist[i] = ln
        symbols = [ord("a"), ord("b"), ord("a"), ord("b")]
        symbols += [(3, 1)]   # dist sym 0 (1-bit code)
        symbols += [(3, 4)]   # dist sym 3 (4-bit code)
        symbols += [(3, 7)]   # dist sym 5 (6-bit code)
        # Grow the window so larger distances resolve.
        symbols += [ord("a")] * 30
        symbols += [(3, 13)]  # dist sym 7 (8-bit code)
        symbols += [(3, 17)]  # dist sym 8 (9-bit code)
        symbols += [(3, 25)]  # dist sym 9 (10-bit code: secondary)
        symbols += [(3, 33)]  # dist sym 10 (11-bit code: secondary)
        stream, expected = emit_dynamic_block(lengths, dist, symbols)
        all_decoders_agree(stream, expected)


class TestDegenerateTrees:
    def test_single_distance_code(self):
        lengths = np.zeros(286, np.int64)
        lengths[ord("x")] = 2
        lengths[ord("y")] = 2
        lengths[256] = 2
        lengths[257] = 3
        lengths[258] = 3
        dist = np.zeros(30, np.int64)
        dist[0] = 1
        symbols = [ord("x"), ord("y"), (4, 1), ord("x")]
        stream, expected = emit_dynamic_block(lengths, dist, symbols)
        assert expected == b"xyyyyyx"
        all_decoders_agree(stream, expected)

    def test_eof_only_block(self):
        lengths = np.zeros(286, np.int64)
        lengths[0] = 1
        lengths[256] = 1
        stream, expected = emit_dynamic_block(
            lengths, np.zeros(30, np.int64), []
        )
        assert expected == b""
        all_decoders_agree(stream, expected)

    def test_distance_code_without_dist_tree_fails(self):
        # A backref symbol with an all-zero distance alphabet must raise
        # InvalidDistanceCode in every decoder.
        lengths = np.zeros(286, np.int64)
        lengths[ord("q")] = 2
        lengths[256] = 2
        lengths[257] = 1
        stream, _ = emit_dynamic_block(
            lengths, np.zeros(30, np.int64), [ord("q")]
        )
        # Splice a backref manually: rebuild with the symbol included but
        # bypass the output simulation (distance never resolves).
        codes = canonical_codes(lengths)
        w = BitWriter(bytearray())
        # Reuse the header from the valid stream up to the symbol section is
        # intricate; instead decode a stream whose only symbol IS the
        # length code: build by hand.
        from fdeflate_tpu.models.bitstream import build_huffman_tree

        cl_freq = np.bincount(
            np.concatenate([lengths, np.zeros(30, np.int64)]), minlength=19
        )[:19]
        cl_lengths, cl_codes, _ = build_huffman_tree(cl_freq, 7)
        w = BitWriter(bytearray(b"\x78\x01"))
        w.write_bits(0b101, 3)
        w.write_bits(286 - 257, 5)
        w.write_bits(30 - 1, 5)
        w.write_bits(15, 4)
        for j in range(19):
            w.write_bits(int(cl_lengths[CLCL_ORDER[j]]), 3)
        for ln in np.concatenate([lengths, np.zeros(30, np.int64)]):
            w.write_bits(int(cl_codes[int(ln)]), int(cl_lengths[int(ln)]))
        w.write_bits(int(codes[257]), 1)  # length symbol, then garbage dist
        w.write_bits(0, 16)
        stream = bytes(w.flush()) + bytes(4)

        from fdeflate_tpu.models.decompressor import _decompress_to_vec_python

        with pytest.raises(E.InvalidDistanceCode):
            _decompress_to_vec_python(stream, None)
        assert isinstance(
            decompress_batch([stream], max_steps=64)[0], E.InvalidDistanceCode
        )
        if native_available():
            with pytest.raises(E.InvalidDistanceCode):
                inflate(stream)


def test_secondary_tables_chunking_insensitive():
    """Byte-wise streaming through secondary-table codes must match
    whole-buffer decoding (the streaming decoder's hardest path)."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_utils import verify_no_sensitivity_to_input_chunking

    lengths = lopsided_lengths()
    symbols = [0, 1, 2, 13, 14, 14, 0, 5, 9, 14] * 3
    stream, expected = emit_dynamic_block(
        lengths, np.zeros(30, np.int64), symbols
    )
    kind, result = verify_no_sensitivity_to_input_chunking(stream)
    assert kind == "ok" and result == expected
