"""Decompressor tests.

Mirrors the reference's decode unit tests (src/decompress.rs:1146-1385):
roundtrips through our own compressor, differential roundtrips against
zlib (playing the miniz_oxide role), checksum handling, split reads, spliced
empty blocks, and the three chunking-sensitivity regression fixtures.
"""

import pathlib
import zlib

import numpy as np
import pytest

import fdeflate_tpu as F
from fdeflate_tpu import errors as E

from test_utils import verify_no_sensitivity_to_input_chunking

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def roundtrip(data: bytes):
    compressed = F.compress_to_vec(data)
    assert F.decompress_to_vec(compressed) == data


def roundtrip_zlib(data: bytes, level=3):
    """Compress with zlib (external encoder), decode with us."""
    compressed = zlib.compress(data, level)
    assert F.decompress_to_vec(compressed) == data


class TestRoundtrips:
    def test_it_works(self):
        roundtrip(b"Hello world!")

    def test_constant(self):
        roundtrip_zlib(bytes(50))
        roundtrip_zlib(bytes([5] * 2048))
        roundtrip_zlib(bytes([128] * 2048))
        roundtrip_zlib(bytes([254] * 2048))

    def test_random_small_alphabet(self):
        rng = np.random.default_rng(7)
        for _ in range(3):
            data = (rng.integers(0, 256, 20000, dtype=np.uint8) % 5).tobytes()
            roundtrip_zlib(data)

    @pytest.mark.parametrize("level", [0, 1, 2, 3, 4, 5, 6, 7, 9])
    def test_own_levels(self, level):
        rng = np.random.default_rng(level)
        data = rng.choice(
            np.frombuffer(b"abcdefgh\x00\x00\x00\x00", np.uint8), 30000
        ).tobytes()
        compressed = F.compress_to_vec_with_level(data, level)
        assert F.decompress_to_vec(compressed) == data
        assert zlib.decompress(compressed) == data

    def test_rle(self):
        data = b"aaaabbbbccccdddd" * 100 + bytes(1000)
        compressed = F.compress_to_vec_rle(data)
        assert F.decompress_to_vec(compressed) == data
        assert zlib.decompress(compressed) == data

    def test_fixed_block_stream(self):
        # zlib level-1 small streams use fixed Huffman blocks.
        data = b"abc"
        co = zlib.compressobj(1, zlib.DEFLATED, 15, 9, zlib.Z_FIXED)
        compressed = co.compress(data) + co.flush()
        assert F.decompress_to_vec(compressed) == data


class TestChecksum:
    def test_wrong_checksum(self):
        compressed = bytearray(F.compress_to_vec(b"Hello world!"))
        compressed[-1] = (compressed[-1] + 1) & 0xFF
        with pytest.raises(E.WrongChecksum):
            F.decompress_to_vec(bytes(compressed))

    def test_ignore_adler32(self):
        compressed = bytearray(F.compress_to_vec(b"Hello world!"))
        compressed[-1] = (compressed[-1] + 1) & 0xFF
        d = F.Decompressor()
        d.ignore_adler32()
        out = bytearray(1024)
        _, produced = d.read(bytes(compressed), out, 0)
        assert bytes(out[:produced]) == b"Hello world!"

    def test_checksum_after_eof(self):
        # Split the read exactly before the last checksum byte
        # (reference: src/decompress.rs:1283-1307).
        data = b"Hello world!"
        compressed = F.compress_to_vec(data)
        d = F.Decompressor()
        out = bytearray(1024)
        consumed, produced = d.read(compressed[:-1], out, 0)
        assert produced == len(data)
        assert consumed == len(compressed) - 1
        consumed2, produced2 = d.read(compressed[consumed:], out[:produced], produced)
        assert d.is_done()
        assert consumed2 == 1
        assert produced2 == 0
        assert bytes(out[: len(data)]) == data


class TestStreaming:
    def test_zero_length_spliced_stored_blocks(self):
        # Ten empty stored blocks spliced in, decoded with an *empty* output
        # buffer (reference: src/decompress.rs:1309-1325).
        compressed = bytearray(F.compress_to_vec(b""))
        for _ in range(10):
            compressed[2:2] = bytes([0, 0, 0, 0xFF, 0xFF])
        d = F.Decompressor()
        consumed, produced = d.read(bytes(compressed), bytearray(0), 0)
        assert d.is_done()
        assert consumed == len(compressed)
        assert produced == 0

    def test_bytewise_roundtrip(self):
        rng = np.random.default_rng(11)
        data = (rng.integers(0, 256, 4000, dtype=np.uint8) % 7).tobytes()
        compressed = zlib.compress(data, 6)
        d = F.Decompressor()
        out = bytearray(len(data))
        ip = op = 0
        while not d.is_done():
            c, p = d.read(compressed[ip : ip + 1], out, op)
            ip += c
            op += p
        assert bytes(out[:op]) == data

    def test_tiny_output_buffer_queued_output(self):
        # Decoding with a full output buffer exercises QueuedOutput resume.
        data = bytes([7] * 10000) + b"tail"
        compressed = zlib.compress(data, 9)
        d = F.Decompressor()
        d.ignore_adler32()
        out = bytearray(len(data))
        ip = op = 0
        while not d.is_done():
            # Reveal output space 13 bytes at a time.
            limit = min(op + 13, len(out))
            view = memoryview(out)[:limit]
            c, p = d.read(compressed[ip:], view, op)
            ip += c
            op += p
            if c == 0 and p == 0 and op == len(out):
                break
        assert bytes(out[:op]) == data

    def test_insufficient_input(self):
        compressed = F.compress_to_vec(b"Hello world!")
        with pytest.raises(E.InsufficientInput):
            F.decompress_to_vec(compressed[:-5])

    def test_bounded_output(self):
        data = bytes(100000)
        compressed = zlib.compress(data)
        with pytest.raises(E.OutputTooLarge):
            F.decompress_to_vec_bounded(compressed, 1000)
        assert F.decompress_to_vec_bounded(compressed, 100000) == data

    def test_no_native_large_decode_routes_through_device(self, monkeypatch):
        """Without the C++ backend, whole-buffer decodes of large streams
        use the XLA batch decoder — results and maxlen semantics must match
        the Python oracle exactly."""
        from fdeflate_tpu.models import decompressor as D
        from fdeflate_tpu.models import native

        monkeypatch.setattr(native, "available", lambda: False)
        rng = np.random.default_rng(21)
        base = np.tile(rng.integers(0, 256, 2048, dtype=np.uint8), 420)
        noise = rng.integers(0, base.size, base.size // 8)
        base[noise] = rng.integers(0, 256, noise.size, dtype=np.uint8)
        data = base.tobytes()
        compressed = zlib.compress(data, 6)
        assert len(compressed) >= (1 << 18)  # big enough to take the route
        assert D.decompress_to_vec_bounded(compressed, None) == data
        with pytest.raises(E.OutputTooLarge) as exc:
            D.decompress_to_vec_bounded(compressed, 4096)
        assert len(exc.value.partial_output) == 4096


class TestErrors:
    def test_bad_zlib_header(self):
        with pytest.raises(E.BadZlibHeader):
            F.decompress_to_vec(b"\x00\x00abcdef")

    def test_invalid_block_type(self):
        # Valid zlib header, then BTYPE=11.
        stream = b"\x78\x01" + bytes([0b110]) + bytes(8)
        with pytest.raises(E.InvalidBlockType):
            F.decompress_to_vec(stream)

    def test_invalid_stored_length(self):
        stream = b"\x78\x01" + bytes([0b000]) + b"\x05\x00\x00\x00" + bytes(8)
        with pytest.raises(E.InvalidUncompressedBlockLength):
            F.decompress_to_vec(stream)

    def test_distance_too_far_back(self):
        # Compress data then decode it as raw deflate prefixed with a
        # crafted backref... simpler: a fixed-Huffman block starting with a
        # length code (no prior output).
        from fdeflate_tpu.ops.bitio import BitWriter

        w = BitWriter(bytearray(b"\x78\x01"))
        w.write_bits(0b011, 3)  # BFINAL=1, BTYPE=fixed(01 -> bits 1,0)
        # Length symbol 257 (code 0b0000001, 7 bits, sent MSB-first reversed).
        w.write_bits(0b1000000, 7)
        # Distance symbol 0 (5 bits).
        w.write_bits(0, 5)
        w.write_bits(0, 7)  # EOF
        stream = bytes(w.flush()) + bytes(4)
        with pytest.raises(E.DistanceTooFarBack):
            F.decompress_to_vec(stream)


class TestChunkingSensitivityFixtures:
    """The three regression fixtures (reference: src/decompress.rs:1344-1384)."""

    def test_example1_distance_codes(self):
        data = (FIXTURES / "input-chunking-sensitivity-example1.zz").read_bytes()
        kind, result = verify_no_sensitivity_to_input_chunking(data)
        assert kind == "ok"
        assert len(result) == 281
        assert zlib.adler32(result) == 751299

    def test_example2_no_end_of_block_symbol(self):
        data = (FIXTURES / "input-chunking-sensitivity-example2.zz").read_bytes()
        kind, result = verify_no_sensitivity_to_input_chunking(data)
        assert (kind, result) == ("err", "BadLiteralLengthHuffmanTree")

    def test_example3_no_end_of_block_symbol(self):
        data = (FIXTURES / "input-chunking-sensitivity-example3.zz").read_bytes()
        kind, result = verify_no_sensitivity_to_input_chunking(data)
        assert (kind, result) == ("err", "BadLiteralLengthHuffmanTree")

    def test_own_streams_chunking_insensitive(self):
        rng = np.random.default_rng(3)
        for level in [1, 4]:
            data = rng.choice(
                np.frombuffer(b"aabbc\x00\x00\x00", np.uint8), 3000
            ).tobytes()
            compressed = F.compress_to_vec_with_level(data, level)
            kind, result = verify_no_sensitivity_to_input_chunking(compressed)
            assert (kind, result) == ("ok", data)
