"""Property-based tests (the framework's fuzzing layer, SURVEY.md §4).

Hypothesis drives the same properties the reference's fuzz targets check
(fuzz/fuzz_targets/): arbitrary-input decode never crashes and matches an
independent decoder; compressed output at every level round-trips through
an external decoder; streaming chunk patterns never change results.
"""

import io
import zlib

import numpy as np
import pytest

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

import fdeflate_tpu as F
from fdeflate_tpu import errors as E
from test_utils import decompress_by_chunks, result_of

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
    @settings(max_examples=60, deadline=None)
    def test_compress_roundtrip_all_levels(data, level):
        """fuzz/deflate.rs analogue: flate2's role is played by zlib."""
        compressed = F.compress_to_vec_with_level(data, level)
        assert zlib.decompress(compressed) == data
        assert F.decompress_to_vec(compressed) == data

    @given(payloads)
    @settings(max_examples=60, deadline=None)
    def test_ultrafast_roundtrip(data):
        compressed = F.compress_to_vec_ultra_fast(data)
        assert zlib.decompress(compressed) == data

    @given(st.binary(max_size=600))
    @settings(max_examples=80, deadline=None)
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
    @settings(max_examples=40, deadline=None)
    def test_chunked_decode_equivalence(data, level, chunks):
        """fuzz/inflate_bytewise3.rs analogue: any chunk pattern decodes
        identically to whole-buffer decode."""
        compressed = zlib.compress(data, level)
        import itertools

        pattern = itertools.cycle(chunks)
        r1 = result_of(lambda: decompress_by_chunks(compressed, [len(compressed)]))
        r2 = result_of(lambda: decompress_by_chunks(compressed, pattern))
        assert r1 == r2

    @given(payloads, st.lists(st.integers(0, 2000), max_size=10))
    @settings(max_examples=30, deadline=None)
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
