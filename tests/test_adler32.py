"""Adler-32 tests: numpy and JAX paths vs zlib, plus associative combining."""

import zlib

import numpy as np
import pytest

from fdeflate_tpu.ops import adler32 as A


@pytest.mark.parametrize("n", [0, 1, 7, 4096, 4097, 100_000])
def test_numpy_matches_zlib(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, n, dtype=np.uint8)
    assert A.adler32_numpy(data) == zlib.adler32(data.tobytes())


def test_combine_matches_zlib():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    y = rng.integers(0, 256, 77777, dtype=np.uint8).tobytes()
    a1 = zlib.adler32(x)
    a2 = zlib.adler32(y)
    assert A.combine(a1, a2, len(y)) == zlib.adler32(x + y)


@pytest.mark.parametrize("n", [1, 4096, 10_000])
def test_jax_matches_zlib(n):
    import jax.numpy as jnp

    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, n, dtype=np.uint8)
    got = int(A.adler32_jax(jnp.asarray(data)))
    assert got & 0xFFFFFFFF == zlib.adler32(data.tobytes())


def test_jax_padded_length():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    data = rng.integers(1, 256, 5000, dtype=np.uint8)
    padded = np.concatenate([data, np.full(3000, 0xAB, np.uint8)])
    got = int(A.adler32_jax(jnp.asarray(padded), length=5000))
    assert got & 0xFFFFFFFF == zlib.adler32(data.tobytes())


def test_jax_partial_combine():
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    x = rng.integers(0, 256, 6000, dtype=np.uint8)
    y = rng.integers(0, 256, 9000, dtype=np.uint8)
    p1 = A.adler32_partial_jax(jnp.asarray(x))
    p2 = A.adler32_partial_jax(jnp.asarray(y))
    a, b, n = A.combine_partials_jax(p1, p2)
    combined = (int(b) << 16) | int(a)
    assert combined == zlib.adler32(np.concatenate([x, y]).tobytes())
    assert int(n) == 15000


class TestPallasAutoChunk:
    """Inputs above the single-launch bound auto-chunk and fold with the
    associative combine (VERDICT round 1, item 7).  CPU tests shrink
    CHUNK_BYTES (interpret mode is per-tile Python); the real 32 MiB bound
    is exercised on hardware by bench.py's checksum verification."""

    def test_combine_jax_matches_host_combine(self):
        import zlib

        import jax.numpy as jnp

        from fdeflate_tpu.ops.adler32 import combine, combine_jax

        rng = np.random.default_rng(0)
        x = rng.integers(0, 256, 70000, dtype=np.uint8).tobytes()
        y = rng.integers(0, 256, 131071, dtype=np.uint8).tobytes()
        a1, a2 = zlib.adler32(x), zlib.adler32(y)
        want = zlib.adler32(x + y)
        assert combine(a1, a2, len(y)) == want
        got = int(np.asarray(combine_jax(
            jnp.uint32(a1), jnp.uint32(a2), jnp.int32(len(y)))))
        assert got == want

    @pytest.mark.parametrize("n", [65533, 65536, 65537, 200001])
    def test_boundary_sizes_chunked(self, n, monkeypatch):
        import zlib

        import jax.numpy as jnp

        from fdeflate_tpu.ops import adler32_pallas as mod

        monkeypatch.setattr(mod, "CHUNK_BYTES", 1 << 16)
        rng = np.random.default_rng(1)
        data = rng.integers(0, 256, n, dtype=np.uint8)
        got = int(np.asarray(mod.adler32_pallas(jnp.asarray(data))))
        assert got == zlib.adler32(data.tobytes()), n

    def test_padded_length_masking_across_chunks(self, monkeypatch):
        import zlib

        import jax.numpy as jnp

        from fdeflate_tpu.ops import adler32_pallas as mod

        monkeypatch.setattr(mod, "CHUNK_BYTES", 1 << 16)
        n = (1 << 16) * 3 + 4096
        ln = (1 << 16) * 2 + 100
        rng = np.random.default_rng(2)
        data = rng.integers(0, 256, n, dtype=np.uint8)
        got = int(np.asarray(mod.adler32_pallas(
            jnp.asarray(data), jnp.int32(ln))))
        assert got == zlib.adler32(data[:ln].tobytes())
