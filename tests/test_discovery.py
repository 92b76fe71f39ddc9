"""Foreign-stream block-boundary discovery tests (P2 completion).

decompress_foreign must be bit-exact on arbitrary zlib streams, falling back
to the sequential path whenever the discovered chain cannot cover the
stream; corruption must surface as an error, never silent garbage.
"""

import zlib

import numpy as np
import pytest

import fdeflate_tpu as F
from fdeflate_tpu.parallel.discovery import (
    decompress_foreign,
    find_block_boundaries,
    scan_stage1,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    return (
        np.where(rng.integers(0, 4, 250000) > 0, rng.integers(-8, 8, 250000), 0)
        .astype(np.uint8)
        .tobytes()
    )


class TestBoundaryDiscovery:
    def test_finds_all_real_dynamic_headers(self, corpus):
        comp = zlib.compress(corpus, 6)
        offsets, _ = find_block_boundaries(comp)
        # the first block header sits right after the 2-byte zlib header
        assert 16 in offsets.tolist()
        # multi-block stream: several boundaries at plausible spacing
        assert len(offsets) >= 3
        gaps = np.diff(offsets)
        assert (gaps > 1000).all()

    def test_stage1_empty_input(self):
        assert len(scan_stage1(b"")) == 0
        assert len(scan_stage1(b"\x00" * 10)) == 0


class TestForeignDecode:
    @pytest.mark.parametrize("level", [1, 6, 9])
    def test_zlib_streams_bit_exact(self, corpus, level):
        comp = zlib.compress(corpus, level)
        assert decompress_foreign(comp) == corpus

    @pytest.mark.slow
    def test_own_compressor_streams(self, corpus):
        for level in (1, 6):
            comp = F.compress_to_vec_with_level(corpus[:100000], level)
            assert decompress_foreign(comp) == corpus[:100000]

    def test_stored_blocks_fall_back(self, corpus):
        comp = zlib.compress(corpus[:50000], 0)
        assert decompress_foreign(comp) == corpus[:50000]

    def test_tiny_stream(self):
        data = b"hello world" * 3
        assert decompress_foreign(zlib.compress(data, 6)) == data

    def test_corruption_raises(self, corpus):
        comp = bytearray(zlib.compress(corpus, 6))
        comp[len(comp) // 2] ^= 0xFF
        with pytest.raises(Exception):
            decompress_foreign(bytes(comp))

    def test_backrefs_across_block_boundaries(self):
        # repetitive data -> backrefs reach into previous blocks
        rng = np.random.default_rng(3)
        pat = rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()
        data = (pat + bytes(500)) * 120  # ~420 KB, highly repetitive
        comp = zlib.compress(data, 6)
        assert decompress_foreign(comp) == data
