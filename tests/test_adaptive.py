"""Adaptive (dynamic-Huffman) device codec: on-device tree construction.

Covers ops/adaptive.py: the length-limited DP (reference semantics
src/lib.rs:42-101), canonical code assignment (src/lib.rs:103-127), decode
metadata, and the full adaptive encode -> Pallas decode roundtrip.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fdeflate_tpu.ops import adaptive as A
from fdeflate_tpu import huffman
from fdeflate_tpu.tables import canonical_codes as host_canonical_codes


def _corpus(kind: str, n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "mixed":
        d = rng.integers(0, 255, n, np.uint8)
        d[:: 3] = 0
        d[n // 4 : n // 2] = 0
        return d
    if kind == "skewed":
        return (rng.zipf(1.5, n) % 64).astype(np.uint8)
    return rng.integers(0, 255, n, np.uint8)


class TestCodeLengthsDP:
    def test_kraft_exact_and_bounded(self):
        rng = np.random.default_rng(1)
        freqs = jnp.asarray(rng.integers(0, 10_000, A.NSYM).astype(np.int32))
        lens = np.asarray(A.code_lengths_dp(freqs))
        assert lens.min() >= 1 and lens.max() <= A.MAXL
        assert sum(2.0 ** -l for l in lens) == 1.0

    def test_matches_host_dp_cost(self):
        # Same scaled frequencies through the host DP (exact reference
        # semantics) must give the same total cost — the device scan is a
        # re-expression, not an approximation.
        rng = np.random.default_rng(2)
        freqs = rng.integers(0, 5000, A.NSYM).astype(np.int64)
        total = max(int(freqs.sum()), 1)
        scaled = np.ceil(freqs * (65536.0 / total)).astype(np.int64)
        host = huffman.compute_code_lengths(
            scaled.astype(np.uint64),
            np.ones(A.NSYM, np.int64),
            np.full(A.NSYM, A.MAXL, np.int64),
        )
        dev = np.asarray(A.code_lengths_dp(jnp.asarray(freqs.astype(np.int32))))
        assert int((scaled * host).sum()) == int((scaled * dev).sum())
        assert sum(2.0 ** -l for l in dev) == 1.0

    def test_skewed_freqs_short_codes_for_common(self):
        freqs = np.ones(A.NSYM, np.int32)
        freqs[65] = 100_000
        lens = np.asarray(A.code_lengths_dp(jnp.asarray(freqs)))
        assert lens[65] <= 3


class TestCanonicalCodes:
    def test_matches_host_assignment(self):
        rng = np.random.default_rng(3)
        freqs = jnp.asarray(rng.integers(1, 100, A.NSYM).astype(np.int32))
        lens = A.code_lengths_dp(freqs)
        dev_codes = np.asarray(A.canonical_codes(lens)[0])
        host = host_canonical_codes(np.asarray(lens), max_length=A.MAXL)
        assert host is not None
        np.testing.assert_array_equal(dev_codes, host)


class TestDecodeMeta:
    def test_trained_tree_matches_host_meta(self):
        from fdeflate_tpu.ops.pallas_decode2 import canonical_meta
        from fdeflate_tpu.tables import HUFFMAN_LENGTHS

        bounds, kvals, packed = canonical_meta()
        meta, tabp = A.decode_meta(
            jnp.asarray(HUFFMAN_LENGTHS.astype(np.int32))
        )
        meta = np.asarray(meta)[0]
        np.testing.assert_array_equal(meta[: A.MAXL + 1], bounds)
        np.testing.assert_array_equal(meta[16 : 16 + A.MAXL + 1], kvals)
        p64 = packed.astype(np.int64)
        host_tabp = (p64[0::2] | (p64[1::2] << 16)).astype(np.int32)
        np.testing.assert_array_equal(np.asarray(tabp)[0], host_tabp)


class TestAdaptiveRoundtrip:
    @pytest.mark.parametrize("kind", ["mixed", "skewed"])
    @pytest.mark.slow  # 17-24s interpreted per corpus
    def test_roundtrip_interpret(self, kind):
        from fdeflate_tpu.ops.pallas_decode2 import decode_blocked

        B, N, C = 2, 4096, 4
        S = N // C
        data = np.stack(
            [_corpus(kind, N, seed=s) for s in range(B)]
        )
        lengths = jnp.asarray(np.full(B, N, np.int32))
        win, cb, adler, lens, meta, tabp = A.encode_adaptive_blocked(
            jnp.asarray(data), lengths, C, lut_matmul=False
        )
        out, bpos = decode_blocked(
            win, T=S // 4, U=8, interpret=True, lane_major=False,
            tables=(meta, tabp),
        )
        L = B * C
        lanes = np.ascontiguousarray(
            np.transpose(np.asarray(out), (0, 2, 3, 1)).reshape(-1, S // 4)[:L]
        )
        decoded = lanes.astype("<i4").view(np.uint8).reshape(B, N)
        np.testing.assert_array_equal(decoded, data)
        bp = np.asarray(bpos).reshape(-1)[:L].reshape(B, C)
        np.testing.assert_array_equal(bp, np.asarray(cb))

    def test_adaptive_not_larger_than_trained(self):
        # On a corpus whose distribution differs from the PNG training set,
        # the adaptive tree must not lose to the trained tree.
        from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_blocked

        B, N, C = 2, 8192, 8
        data = np.stack([_corpus("skewed", N, seed=s) for s in range(B)])
        lengths = jnp.asarray(np.full(B, N, np.int32))
        _, cb_t, _ = encode_ultrafast_blocked(
            jnp.asarray(data), lengths, C, lut_matmul=False
        )
        _, cb_a, _, _, _, _ = A.encode_adaptive_blocked(
            jnp.asarray(data), lengths, C, lut_matmul=False
        )
        assert int(np.asarray(cb_a).sum()) <= int(np.asarray(cb_t).sum())
