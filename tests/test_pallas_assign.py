"""Differential tests for the Pallas token-assign kernel.

The whole-kernel linear encode (ops/pallas_assign + pack kernel + DMA
combine) must emit byte-identical stream words to the XLA oracle path
(_assign_tokens + segment-sum scatter) for every run/tail/boundary shape.
The comparison is at the WORDS level: the kernel legally emits a run's
tail tokens at different byte SLOTS (the last slots of the run instead of
the q0-anchored ones), so (tok, relp) streams differ while the packed
bits are identical.

Interpret-mode compiles scale with the unrolled step count, so these
tests force FDN_ASSIGN_U=4.  All are `slow` (interpret-mode kernels);
the fast tier covers the XLA paths via test_device_codec.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pytest

os.environ.setdefault("FDN_ASSIGN_U", "4")

jnp = pytest.importorskip("jax.numpy")

from fdeflate_tpu.ops import ultrafast_kernel as UK  # noqa: E402

pytestmark = pytest.mark.slow


def _check(data: np.ndarray, lengths: np.ndarray, C: int):
    data_d = jnp.asarray(data)
    len_d = jnp.asarray(lengths)
    kw = dict(num_chunks=C, fixed_geometry=True, return_eof=True)
    a = UK.encode_ultrafast_batch(
        data_d, len_d, kernel_pack=False, kernel_assign=False, **kw)
    b = UK.encode_ultrafast_batch(
        data_d, len_d, kernel_pack=True, kernel_assign=True, **kw)
    wa, wb = np.asarray(a[0]), np.asarray(b[0])
    Wc = min(wa.shape[1], wb.shape[1])
    np.testing.assert_array_equal(wa[:, :Wc], wb[:, :Wc])
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))
    np.testing.assert_array_equal(np.asarray(a[4]), np.asarray(b[4]))
    return b


def test_mixed_zeros_small_chunks():
    rng = np.random.default_rng(2)
    d = rng.integers(0, 256, (2, 1024)).astype(np.uint8)
    d[rng.random((2, 1024)) < 0.5] = 0
    _check(d, np.full(2, 1024, np.int32), 4)


def test_long_runs_and_no_zeros():
    rng = np.random.default_rng(3)
    d = np.zeros((2, 2048), np.uint8)
    d[0, 100] = 7
    d[0, 700] = 9
    d[1] = rng.integers(1, 256, 2048)
    _check(d, np.full(2, 2048, np.int32), 4)


def test_tails_1_to_6_and_258_boundaries():
    rng = np.random.default_rng(4)
    d = np.zeros((2, 2048), np.uint8)
    d[0, :] = rng.integers(1, 256, 2048)
    for k, tail in enumerate([1, 2, 3, 4, 5, 6]):
        s = 60 * k + 16
        d[0, s : s + tail + 1] = 0
    d[1, :] = rng.integers(1, 256, 2048)
    d[1, 500:1100] = 0
    d[1, 1100:1103] = 0
    _check(d, np.full(2, 2048, np.int32), 4)


def test_exact_258_multiples():
    d = np.ones((1, 2048), np.uint8)
    d[0, 100 : 100 + 259] = 0   # run1 = 258: k=1, tail=0
    d[0, 600 : 600 + 517] = 0   # run1 = 516: k=2, tail=0
    d[0, 1400 : 1400 + 263] = 0  # tail=4
    _check(d, np.full(1, 2048, np.int32), 4)


def test_ragged_lengths():
    rng = np.random.default_rng(5)
    d = rng.integers(0, 256, (3, 2048)).astype(np.uint8)
    d[rng.random((3, 2048)) < 0.6] = 0
    _check(d, np.array([2048, 1037, 264], np.int32), 4)


def test_blocked_windows_match_oracle():
    rng = np.random.default_rng(7)
    d = rng.integers(0, 256, (2, 1024)).astype(np.uint8)
    d[rng.random((2, 1024)) < 0.5] = 0
    lengths = np.full(2, 1024, np.int32)
    wa, ba, aa = UK.encode_ultrafast_blocked(
        jnp.asarray(d), jnp.asarray(lengths), 4,
        kernel_pack=False, kernel_assign=False)
    wb, bb, ab = UK.encode_ultrafast_blocked(
        jnp.asarray(d), jnp.asarray(lengths), 4,
        kernel_pack=True, kernel_assign=True)
    wa, wb = np.asarray(wa), np.asarray(wb)
    ww = min(wa.shape[1], wb.shape[1])
    np.testing.assert_array_equal(wa[:, :ww], wb[:, :ww])
    assert not wa[:, ww:].any() and not wb[:, ww:].any()
    np.testing.assert_array_equal(np.asarray(ba), np.asarray(bb))
    np.testing.assert_array_equal(np.asarray(aa), np.asarray(ab))


def test_density_sweep_batch():
    """One batch, eight zero densities 0..1: rare run/tail shapes (long
    tails at exactly 4/5, runs brushing cell and lane boundaries) appear
    somewhere in the sweep without needing per-seed compiles."""
    rng = np.random.default_rng(12)
    B, N = 8, 2048
    d = np.zeros((B, N), np.uint8)
    for i, dens in enumerate([0.0, 0.3, 0.5, 0.8, 0.95, 0.99, 1.0, 0.9]):
        row = rng.integers(1, 256, N).astype(np.uint8)
        row[rng.random(N) < dens] = 0
        d[i] = row
    lengths = np.full(B, N, np.int32)
    lengths[3] = 1544  # ragged, multiple of 8
    lengths[6] = 777   # ragged, odd tail literals
    _check(d, lengths, 4)


def test_adaptive_runtime_tree_windows():
    from fdeflate_tpu.ops.adaptive import encode_adaptive_blocked

    rng = np.random.default_rng(11)
    d = rng.integers(0, 64, (2, 1024)).astype(np.uint8)
    d[rng.random((2, 1024)) < 0.5] = 0
    lengths = jnp.asarray(np.full(2, 1024, np.int32))
    wa, ba, _aa, la, _ma, _ta = encode_adaptive_blocked(
        jnp.asarray(d), lengths, 4, kernel_assign=False)
    wb, bb, _ab, lb_, _mb, _tb = encode_adaptive_blocked(
        jnp.asarray(d), lengths, 4, kernel_assign=True)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb_))
    wa, wb = np.asarray(wa), np.asarray(wb)
    ww = min(wa.shape[1], wb.shape[1])
    np.testing.assert_array_equal(wa[:, :ww], wb[:, :ww])
    np.testing.assert_array_equal(np.asarray(ba), np.asarray(bb))


def test_cell_boundary_runs_roundtrip():
    rng = np.random.default_rng(6)
    d = np.zeros((2, 2048), np.uint8)
    d[1, :] = rng.integers(1, 256, 2048)
    for e in (254, 255, 256, 257, 510, 511, 512):
        d[1, e] = 0
    d[1, 248:258] = 0  # run crossing the 32-byte-step cell boundary
    lengths = np.full(2, 2048, np.int32)
    w, bits, ad, _st, _eof = _check(d, lengths, 4)
    streams = UK.finalize_streams(
        np.asarray(w), np.asarray(bits), np.asarray(ad))
    for i, s in enumerate(streams):
        assert zlib.decompress(s) == d[i].tobytes()
