"""Property-based tests (the framework's fuzzing layer, SURVEY.md §4).

Hypothesis drives the same properties the reference's fuzz targets check
(fuzz/fuzz_targets/): arbitrary-input decode never crashes and matches an
independent decoder; compressed output at every level round-trips through
an external decoder; streaming chunk patterns never change results.
"""

import io
import os
import zlib

import numpy as np
import pytest

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

# Continuous-fuzzing analogue (reference: cargo-fuzz runs unbounded).  The
# default example counts keep CI fast; FDN_FUZZ_SCALE=N multiplies every
# property's budget for long fuzzing sessions, e.g.
#   FDN_FUZZ_SCALE=50 python -m pytest tests/test_property.py -q
_FUZZ_SCALE = max(1, int(os.environ.get("FDN_FUZZ_SCALE", "1")))

import fdeflate_tpu as F
from fdeflate_tpu import errors as E
from test_utils import DriverError, decompress_by_chunks, result_of

pytestmark = pytest.mark.skipif(
    not HAVE_HYPOTHESIS, reason="hypothesis not installed"
)

if HAVE_HYPOTHESIS:

    payloads = st.one_of(
        st.binary(max_size=4000),
        st.builds(
            lambda seed, n, alphabet: (
                np.random.default_rng(seed).integers(0, alphabet, n)
            ).astype(np.uint8).tobytes(),
            st.integers(0, 2**31), st.integers(0, 5000), st.integers(1, 256),
        ),
        st.builds(
            lambda parts: b"".join(parts),
            st.lists(
                st.one_of(st.binary(max_size=64),
                          st.integers(0, 600).map(lambda n: bytes(n))),
                max_size=20,
            ),
        ),
    )

    @given(payloads, st.integers(0, 9))
    @settings(max_examples=60 * _FUZZ_SCALE, deadline=None)
    def test_compress_roundtrip_all_levels(data, level):
        """fuzz/deflate.rs analogue: flate2's role is played by zlib."""
        compressed = F.compress_to_vec_with_level(data, level)
        assert zlib.decompress(compressed) == data
        assert F.decompress_to_vec(compressed) == data

    @given(payloads)
    @settings(max_examples=60 * _FUZZ_SCALE, deadline=None)
    def test_ultrafast_roundtrip(data):
        compressed = F.compress_to_vec_ultra_fast(data)
        assert zlib.decompress(compressed) == data

    @given(st.binary(max_size=600))
    @settings(max_examples=80 * _FUZZ_SCALE, deadline=None)
    def test_arbitrary_input_never_crashes(data):
        """fuzz/inflate.rs analogue: decode arbitrary bytes; compare with
        zlib where both succeed."""
        try:
            ours = F.decompress_to_vec(data)
        except (E.DecompressionError, E.OutputTooLarge):
            return
        # If we accepted it, zlib must produce the same bytes (we are at
        # most stricter, never wrong).
        try:
            theirs = zlib.decompress(data)
        except zlib.error:
            return
        assert ours == theirs

    @given(payloads, st.integers(1, 9), st.lists(st.integers(1, 50), min_size=1, max_size=30))
    @settings(max_examples=40 * _FUZZ_SCALE, deadline=None)
    def test_chunked_decode_equivalence(data, level, chunks):
        """fuzz/inflate_bytewise3.rs analogue: any chunk pattern decodes
        identically to whole-buffer decode."""
        compressed = zlib.compress(data, level)
        import itertools

        pattern = itertools.cycle(chunks)
        r1 = result_of(lambda: decompress_by_chunks(compressed, [len(compressed)]))
        r2 = result_of(lambda: decompress_by_chunks(compressed, pattern))
        assert r1 == r2

    def _decompress_output_bytewise(data: bytes, cap: int = 1_000_000):
        """Drive ``read`` offering ONE free output byte per call
        (fuzz/inflate_bytewise.rs analogue)."""
        d = F.Decompressor()
        d.ignore_adler32()
        out = bytearray()
        in_pos = 0
        for _ in range(200_000):
            if d.is_done():
                return bytes(out)
            window = bytearray(len(out) + 1)
            window[: len(out)] = out
            consumed, produced = d.read(data[in_pos:], window, len(out))
            in_pos += consumed
            out = window[: len(out) + produced]
            if len(out) > cap:
                raise DriverError("OutputTooLarge")
            if consumed == 0 and produced == 0 and not d.is_done():
                # No progress with a free byte and all remaining input:
                # the stream needs input that does not exist.
                raise DriverError("Stalled")
        raise DriverError("TooManyIterations")

    @given(st.one_of(st.binary(max_size=600),
                     payloads.map(lambda p: zlib.compress(p, 6))))
    @settings(max_examples=60 * _FUZZ_SCALE, deadline=None)
    def test_output_bytewise_equivalence(data):
        """fuzz/inflate_bytewise.rs analogue: presenting the OUTPUT buffer
        one byte at a time must match whole-buffer decode, on valid and
        arbitrary (usually malformed) inputs alike."""
        r_whole = result_of(lambda: decompress_by_chunks(data, [len(data)]))
        r_byte = result_of(lambda: _decompress_output_bytewise(data))
        if r_byte == ("testerr", "Stalled"):
            # Truncated stream: the whole-buffer driver spins out its
            # iteration cap waiting for input that never comes.
            assert r_whole in (("testerr", "TooManyIterations"),
                               ("err", "InsufficientInput")), r_whole
        else:
            assert r_whole == r_byte

    @given(st.binary(max_size=600))
    @settings(max_examples=60 * _FUZZ_SCALE, deadline=None)
    def test_arbitrary_input_bytewise_chunking(data):
        """fuzz/inflate_bytewise2.rs analogue: input fed one byte at a
        time (on ARBITRARY bytes, not just valid streams) gives the same
        outcome and error class as whole-buffer decode."""
        import itertools

        r1 = result_of(lambda: decompress_by_chunks(data, [len(data)]))
        r2 = result_of(lambda: decompress_by_chunks(data, itertools.repeat(1)))
        assert r1 == r2

    @given(st.one_of(st.binary(max_size=600),
                     payloads.map(lambda p: zlib.compress(p, 4))),
           st.integers(0, 600))
    @settings(max_examples=60 * _FUZZ_SCALE, deadline=None)
    def test_split_two_reads(data, cut):
        """fuzz/inflate_split.rs analogue: one read vs the same input
        split across exactly two reads."""
        cut = min(cut, len(data))
        r1 = result_of(lambda: decompress_by_chunks(data, [len(data)]))
        r2 = result_of(
            lambda: decompress_by_chunks(data, [cut, len(data) - cut])
        )
        assert r1 == r2

    @given(payloads, st.lists(st.integers(0, 2000), max_size=10))
    @settings(max_examples=30 * _FUZZ_SCALE, deadline=None)
    def test_streamed_compressor_writes(data, splits):
        """fuzz/stored.rs + deflate.rs analogue: arbitrary write_data calls."""
        c = F.Compressor(level=1)
        pos = 0
        for s in splits:
            c.write_data(data[pos : pos + s])
            pos += s
            if pos >= len(data):
                break
        c.write_data(data[pos:])
        out = bytes(c.finish())
        assert zlib.decompress(out) == data
