"""Byte-order portability checks (the reference CI's big-endian QEMU job,
SURVEY.md §4 / .github/workflows/rust.yml:32-55 analogue).

The reference proves its bit buffer is endian-clean by running the full test
suite under QEMU powerpc.  Python/numpy cannot switch host endianness, so
this module enforces the same property two ways:

1. **Functional**: every byte<->word boundary in the codec must go through
   an explicit little-endian dtype.  Feeding the public APIs buffers whose
   numpy dtype is BIG-endian (``>u4`` views of the same bytes) must produce
   bit-identical results, because the code is required to interpret raw
   bytes itself rather than trusting native word order.
2. **Static**: no source file may use a native-endian multi-byte dtype in
   ``frombuffer``/``view``/``tobytes`` conversions of wire data.  All wire
   conversions in the tree use '<u4'/'<i4' (or operate on uint8).  This is
   the greppable guarantee that a big-endian host changes nothing.
"""

from __future__ import annotations

import pathlib
import re
import zlib

import numpy as np

import fdeflate_tpu as F

ROOT = pathlib.Path(__file__).resolve().parent.parent


class TestFunctional:
    def test_compress_accepts_big_endian_views(self):
        """Same logical bytes via byteswapped arrays -> identical streams."""
        rng = np.random.default_rng(5)
        raw = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
        # A big-endian u4 array holding the same memory bytes.
        be = np.frombuffer(raw, dtype=">u4")
        le = np.frombuffer(raw, dtype="<u4")
        assert be.tobytes() == le.tobytes() == raw  # tobytes is memory order
        for level in (0, 1, 5, 9):
            c_bytes = F.compress_to_vec_with_level(raw, level)
            c_be = F.compress_to_vec_with_level(be.tobytes(), level)
            assert c_bytes == c_be
            assert zlib.decompress(c_bytes) == raw

    def test_decompress_bit_order_is_lsb_first(self):
        """RFC 1951 bit order: Huffman codes pack MSB-first inside
        LSB-first bytes.  Verify against zlib on a stream whose first
        symbol straddles a byte boundary."""
        data = bytes([0xAB] * 300)
        c = zlib.compress(data, 6)
        assert F.decompress_to_vec(c) == data

    def test_adler32_word_split_is_explicit(self):
        """The device Adler kernels reduce over u8 lanes; a u32 view of the
        same buffer on any host must not change the checksum."""
        from fdeflate_tpu.ops.adler32 import adler32_numpy

        rng = np.random.default_rng(6)
        buf = rng.integers(0, 256, 8000, dtype=np.uint8)
        expect = zlib.adler32(buf.tobytes())
        assert adler32_numpy(buf) == expect
        # Round-trip through an explicit big-endian word view.
        words_be = np.frombuffer(buf.tobytes(), ">u4")
        again = np.frombuffer(words_be.tobytes(), np.uint8)
        assert adler32_numpy(again) == expect

    def test_stream_words_are_little_endian(self):
        """The batch encoder's u32 words, serialized '<u4', must equal the
        byte stream the scalar compressor emits (the wire format is bytes;
        words are an internal little-endian packing)."""
        jnp = __import__("jax.numpy", fromlist=["jnp"])
        from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_batch

        rng = np.random.default_rng(7)
        data = np.where(
            rng.integers(0, 3, 2048) > 0, rng.integers(-6, 6, 2048), 0
        ).astype(np.uint8)
        w, bits, adler = encode_ultrafast_batch(
            jnp.asarray(data[None, :]),
            jnp.asarray(np.array([2048], np.int32)),
            lut_matmul=False,
        )
        nbytes = int(np.asarray(bits)[0]) // 8
        dev = np.asarray(w)[0].astype("<u4").tobytes()[:nbytes]
        dev += int(np.asarray(adler)[0]).to_bytes(4, "big")
        host = F.compress_to_vec_ultra_fast(data.tobytes())
        assert dev == bytes(host)


class TestStatic:
    # Wire-data conversions must name their byte order. Native-endian
    # spellings of multi-byte dtypes in buffer reinterpretation calls are
    # banned tree-wide; '<'-prefixed dtypes and uint8 are always fine.
    _BANNED = re.compile(
        r"""(?:frombuffer|\.view|fromstring)\(\s*
            [^)\n]*?
            (?:np\.uint(?:16|32|64)|np\.int(?:16|32|64)
              |dtype\s*=\s*["'](?:u[248]|i[248])["']
              |["'](?:=|)(?:u[248]|i[248])["'])""",
        re.VERBOSE,
    )
    # np.asarray(x).view(np.uint8) and friends are byte-order-free.
    _ALLOWED_LINE = re.compile(
        r"""["']<|["']>|np\.uint8|np\.int8|# *endian-ok""",
        re.VERBOSE,
    )

    def test_no_native_endian_wire_conversions(self):
        offenders = []
        for path in sorted((ROOT / "fdeflate_tpu").rglob("*.py")):
            for ln, line in enumerate(
                path.read_text().splitlines(), start=1
            ):
                if self._BANNED.search(line) and not self._ALLOWED_LINE.search(
                    line
                ):
                    offenders.append(f"{path.relative_to(ROOT)}:{ln}: {line.strip()}")
        assert not offenders, (
            "native-endian wire conversion(s) found — use explicit '<u4' "
            "style dtypes (or mark '# endian-ok' for non-wire data):\n"
            + "\n".join(offenders)
        )
