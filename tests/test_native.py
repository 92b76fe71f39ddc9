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
