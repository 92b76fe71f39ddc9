"""Repack (linear zlib words -> lane-blocked decode windows) tests.

The staged windows must let the v2 canonical kernel decode a STANDARD
zlib stream bit-exactly (VERDICT round 2, item 1).  On CPU the Pallas DMA
kernel has no faithful interpreter, so these tests exercise the XLA
staging oracle (`_stage_xla`, which `stage_blocked_from_linear` dispatches
to off-TPU) against the numpy oracle and through the full decode chain;
the hardware DMA kernel is exercised by bench/probe_repack.py and bench.py.
"""

import zlib

import numpy as np
import jax.numpy as jnp
import pytest

from fdeflate_tpu.ops.repack import (
    stage_blocked_from_linear,
    stage_blocked_np,
    stage_wwin,
)
from fdeflate_tpu.ops.ultrafast_kernel import (
    encode_ultrafast_batch,
    finalize_streams,
)
from fdeflate_tpu.ops.pallas_decode2 import decode_blocked, adler_step_major


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def corpus(rng, B, N):
    data = np.where(
        rng.integers(0, 5, (B, N)) > 0, rng.integers(-8, 8, (B, N)), 0
    ).astype(np.uint8)
    data[0, : N // 3] = 0  # long zero run crossing chunk boundaries
    data[1] = rng.integers(0, 256, N, dtype=np.uint8)  # incompressible
    return data


def encode_linear(data, lengths, C):
    return encode_ultrafast_batch(
        jnp.asarray(data), jnp.asarray(lengths), num_chunks=C,
        fixed_geometry=True, return_eof=True,
    )


class TestStaging:
    def test_xla_matches_numpy_oracle(self, rng):
        B, N, C = 3, 2048, 8
        data = corpus(rng, B, N)
        lengths = np.full(B, N, np.int32)
        words, tb, adler, starts, eof = encode_linear(data, lengths, C)
        wwin = stage_wwin(N // C)
        win = np.asarray(stage_blocked_from_linear(words, starts, C, wwin))
        ref = stage_blocked_np(np.asarray(words), np.asarray(starts), C, wwin)
        assert np.array_equal(win, ref)

    def test_staged_window_prefix_matches_blocked_encoder(self, rng):
        """Within each chunk's payload bits the staged window must agree
        with the blocked encoder's native output (beyond them the staged
        window carries following stream bits, the blocked one zeros)."""
        from fdeflate_tpu.ops.ultrafast_kernel import (
            blocked_wpad,
            encode_ultrafast_blocked,
        )

        B, N, C = 2, 2048, 8
        S = N // C
        data = corpus(rng, B, N)
        lengths = np.full(B, N, np.int32)
        words, tb, adler, starts, eof = encode_linear(data, lengths, C)
        wwin = stage_wwin(S)
        win = np.asarray(stage_blocked_from_linear(words, starts, C, wwin))

        bwin, chunk_bits, _ = encode_ultrafast_blocked(
            jnp.asarray(data), jnp.asarray(lengths), C, kernel_pack=False
        )
        bwin = np.asarray(bwin)
        chunk_bits = np.asarray(chunk_bits)
        wpad = blocked_wpad(S)
        for lane in range(B * C):
            b, k = divmod(lane, C)
            nbits = int(chunk_bits[b, k])
            full_words = nbits // 32
            lb, r = divmod(lane, 1024)
            si, li = divmod(r, 128)
            got = win[lb, :, si, li].astype(np.uint32)
            exp = bwin[lb, :, si, li].astype(np.uint32)
            nw = min(full_words, wpad)
            assert np.array_equal(got[:nw], exp[:nw]), (lane, nbits)
            rem = nbits & 31
            if rem and full_words < wpad:
                mask = (1 << rem) - 1
                assert int(got[full_words]) & mask == int(exp[full_words]) & mask


class TestZlibArtifactRoundtrip:
    @pytest.mark.parametrize("C", [8, 16])
    def test_decode_standard_zlib_stream(self, rng, C):
        B, N = 2, 2048
        S = N // C
        data = corpus(rng, B, N)
        lengths = np.full(B, N, np.int32)
        words, tb, adler, starts, eof = encode_linear(data, lengths, C)

        # The artifact really is standard zlib.
        streams = finalize_streams(words, tb, adler)
        for i, s in enumerate(streams):
            assert zlib.decompress(s) == data[i].tobytes()

        # Decode through repack + the v2 kernel, bit position verified.
        wwin = stage_wwin(S)
        win = stage_blocked_from_linear(words, starts, C, wwin)
        out_sm, bpos = decode_blocked(win, T=S // 4, U=8, lane_major=False)
        expected = np.asarray(
            jnp.concatenate([starts[:, 1:], eof[:, None]], axis=1) - starts
        )
        bp = np.asarray(bpos).reshape(-1)[: B * C].reshape(B, C)
        assert np.array_equal(bp, expected)

        out = np.asarray(out_sm)  # [LB, T, 8, 128]
        LB = out.shape[0]
        by = out.transpose(0, 2, 3, 1).reshape(LB * 1024, S // 4)
        by = by[: B * C].reshape(B, N // 4).view(np.uint8)[:, :N]
        assert np.array_equal(by, data)

        ck = np.asarray(adler_step_major(out_sm, B, C, S, jnp.asarray(lengths)))
        assert np.array_equal(ck, np.asarray(adler))

    def test_fused_pipeline_ragged(self, rng):
        from fdeflate_tpu.parallel.device_pipeline import fused_zlib_roundtrip

        B, N, C = 3, 2048, 8
        data = corpus(rng, B, N)
        lengths = np.array([N, N - 700, 9], np.int32)
        for b in range(B):
            data[b, lengths[b]:] = 0
        step = fused_zlib_roundtrip(C, N, wwin=stage_wwin(N // C), U=8)
        out_sm, bpos_ok, ck_ok = step(jnp.asarray(data), jnp.asarray(lengths))
        assert bool(np.all(np.asarray(bpos_ok))), np.asarray(bpos_ok)
        assert bool(np.all(np.asarray(ck_ok))), np.asarray(ck_ok)

    @pytest.mark.slow
    def test_undersized_window_is_detected(self, rng):
        """A too-small staged window must fail verification, not corrupt."""
        B, N, C = 1, 3072, 4
        S = N // C
        data = rng.integers(0, 256, (B, N), dtype=np.uint8)  # ~8.7 bits/byte
        lengths = np.full(B, N, np.int32)
        words, tb, adler, starts, eof = encode_linear(data, lengths, C)
        wwin = 128  # 4096 bits << ~6700 bits per chunk
        win = stage_blocked_from_linear(words, starts, C, wwin)
        out_sm, bpos = decode_blocked(win, T=S // 4, U=8, lane_major=False)
        ck = np.asarray(adler_step_major(out_sm, B, C, S, jnp.asarray(lengths)))
        assert not np.array_equal(ck, np.asarray(adler))
