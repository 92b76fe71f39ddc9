"""Native C++ backend tests: differential vs the Python oracle.

The reference's fuzz corpus (66 inflate seeds) drives a whole-vs-native
differential: for every seed, the native one-shot decoder and the Python
streaming decoder must produce the same result (bytes or error class) —
the same role miniz_oxide differentials play in the reference
(fuzz/fuzz_targets/inflate.rs).
"""

import pathlib
import zlib

import numpy as np
import pytest

import fdeflate_tpu as F
from fdeflate_tpu import errors as E
from fdeflate_tpu.models import native
from fdeflate_tpu.models.decompressor import _decompress_to_vec_python
from fdeflate_tpu.models.ultrafast import _compress_to_vec_ultra_fast_python

CORPUS = sorted((pathlib.Path(__file__).parent / "fixtures" / "corpus").iterdir())

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native backend unavailable"
)


def python_result(data: bytes):
    try:
        return ("ok", _decompress_to_vec_python(data, 1 << 20))
    except E.OutputTooLarge:
        return ("too-large",)
    except E.DecompressionError as e:
        return ("err", type(e).__name__)


def native_result(data: bytes):
    try:
        return ("ok", native.inflate(data, maxlen=1 << 20))
    except E.OutputTooLarge:
        return ("too-large",)
    except E.DecompressionError as e:
        return ("err", type(e).__name__)


@pytest.mark.parametrize("path", CORPUS, ids=lambda p: p.name[:12])
def test_corpus_differential(path):
    data = path.read_bytes()
    assert native_result(data) == python_result(data)


def test_valid_stream_differential():
    rng = np.random.default_rng(17)
    for level in (1, 6, 9):
        data = (rng.integers(0, 256, 30000, dtype=np.uint8) % 11).tobytes()
        comp = zlib.compress(data, level)
        assert native_result(comp) == ("ok", data)


def test_ultrafast_bit_exact():
    rng = np.random.default_rng(18)
    for d in [b"", b"x", bytes(1000), rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()]:
        assert native.compress_ultra(d) == _compress_to_vec_ultra_fast_python(d)


def test_public_api_uses_native():
    data = b"through the public api" * 100
    comp = F.compress_to_vec_ultra_fast(data)
    assert F.decompress_to_vec(comp) == data


def test_bounded():
    data = bytes(100000)
    comp = zlib.compress(data)
    with pytest.raises(E.OutputTooLarge):
        F.decompress_to_vec_bounded(comp, 1000)


@pytest.mark.parametrize("level", [0, 1, 2, 3, 4, 5, 6, 7, 9])
def test_deflate_levels_roundtrip(level):
    rng = np.random.default_rng(level + 50)
    data = rng.choice(
        np.frombuffer(b"abcdefgh\x00\x00\x00\x00", np.uint8), 40000
    ).tobytes()
    comp = native.deflate(data, level)
    assert zlib.decompress(comp) == data
    assert native.inflate(comp) == data


def test_deflate_size_close_to_python_oracle():
    from fdeflate_tpu.models.compressor import _compress_to_vec_with_level_python

    rng = np.random.default_rng(60)
    data = rng.choice(np.frombuffer(b"aabbbcc\x00", np.uint8), 60000).tobytes()
    for level in (1, 2, 3, 4, 6):
        nat = len(native.deflate(data, level))
        py = len(_compress_to_vec_with_level_python(data, level))
        # One-shot vs streaming lookahead can differ slightly near EOF.
        assert abs(nat - py) <= max(64, py // 200), (level, nat, py)


def test_deflate_raw_mode():
    data = b"raw native deflate" * 100
    comp = native.deflate(data, 3, zlib_mode=False)
    assert zlib.decompress(comp, wbits=-15) == data


def test_native_on_chunking_fixtures():
    import pathlib

    fixtures = pathlib.Path(__file__).parent / "fixtures"
    d1 = (fixtures / "input-chunking-sensitivity-example1.zz").read_bytes()
    out = native.inflate(d1, ignore_adler32=True)
    assert len(out) == 281 and zlib.adler32(out) == 751299
    for name in ("example2", "example3"):
        data = (fixtures / f"input-chunking-sensitivity-{name}.zz").read_bytes()
        with pytest.raises(E.BadLiteralLengthHuffmanTree):
            native.inflate(data, ignore_adler32=True)
