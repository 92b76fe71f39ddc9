"""Out-of-bounds masking tests for the device kernels (SURVEY.md §5).

The reference needs no sanitizer (`#![forbid(unsafe_code)]`); the TPU
analogue of a memory-safety bug is a kernel that READS PAST the logical
stream length (`lengths`) or past a chunk's payload bits and lets the
garbage influence its output.  These tests are explicit masking checks:
every kernel must produce bit-identical results no matter what bytes sit
in the padding / beyond-end regions of its inputs.

All kernels run in interpret / CPU-XLA mode here; the same HLO executes on
hardware (tests/test_device_codec.py and the bench verify that end).
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _poison(buf: np.ndarray, lengths: np.ndarray, fill: int) -> np.ndarray:
    """Copy of `buf` with everything past each row's length set to `fill`."""
    out = buf.copy()
    for b in range(buf.shape[0]):
        out[b, lengths[b]:] = fill
    return out


def _corpus(B=3, N=2048, seed=7):
    rng = np.random.default_rng(seed)
    data = np.zeros((B, N), np.uint8)
    data[0] = np.where(rng.integers(0, 3, N) > 0, rng.integers(-6, 6, N), 0)
    if B > 1:
        data[1] = rng.integers(0, 256, N)
    if B > 2:
        data[2, :512] = np.tile(rng.integers(0, 256, 64, dtype=np.uint8), 8)
    lengths = np.array([N, N - 37, 512], np.int32)[:B]
    return data, lengths


class TestEncodeMasking:
    def test_linear_encoder_ignores_padding(self):
        from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_batch

        data, lengths = _corpus()
        outs = []
        for fill in (0, 0xFF, 0xA5):
            d = _poison(data, lengths, fill)
            w, bits, adler = encode_ultrafast_batch(
                jnp.asarray(d), jnp.asarray(lengths), lut_matmul=False
            )
            outs.append(
                (np.asarray(w), np.asarray(bits), np.asarray(adler))
            )
        w0, bits0, adler0 = outs[0]
        for w, bits, adler in outs[1:]:
            assert (bits == bits0).all()
            assert (adler == adler0).all()
            # Compare only the defined bit region of each stream.
            for b in range(w0.shape[0]):
                nwords = int(bits0[b]) // 32
                rem = int(bits0[b]) % 32
                assert (w[b, :nwords] == w0[b, :nwords]).all()
                if rem:
                    mask = (1 << rem) - 1
                    assert (int(w[b, nwords]) & mask) == (
                        int(w0[b, nwords]) & mask
                    )

    def test_blocked_encoder_ignores_padding(self):
        from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_blocked

        data, lengths = _corpus()
        C = 16
        outs = []
        for fill in (0, 0xFF):
            d = _poison(data, lengths, fill)
            win, cb, adler = encode_ultrafast_blocked(
                jnp.asarray(d), jnp.asarray(lengths), C, lut_matmul=False
            )
            outs.append(
                (np.asarray(win), np.asarray(cb), np.asarray(adler))
            )
        (win0, cb0, ad0), (win1, cb1, ad1) = outs
        assert (cb0 == cb1).all() and (ad0 == ad1).all()
        # Chunks fully inside the stream must match bit-exactly over their
        # payload; fully-padded chunks carry chunk_bits == 0 both ways.
        B, C_ = cb0.shape
        S = data.shape[1] // C
        for b in range(B):
            for c in range(C_):
                lane = b * C_ + c
                lb, sub, ln = lane // 1024, (lane // 128) % 8, lane % 128
                bits = int(cb0[b, c])
                nwords = bits // 32
                w0 = win0[lb, :, sub, ln]
                w1 = win1[lb, :, sub, ln]
                assert (w0[:nwords] == w1[:nwords]).all(), (b, c)
                rem = bits % 32
                if rem:
                    m = (1 << rem) - 1
                    assert int(w0[nwords]) & m == int(w1[nwords]) & m


class TestChecksumMasking:
    def test_adler32_pallas_ignores_padding(self):
        from fdeflate_tpu.ops.adler32_pallas import adler32_pallas

        import zlib

        rng = np.random.default_rng(11)
        n = 70000
        payload = rng.integers(0, 256, n, dtype=np.uint8)
        pad = 1 << 17  # kernel pads to its tile size internally
        for fill in (0, 0xFF):
            buf = np.full(pad, fill, np.uint8)
            buf[:n] = payload
            got = int(adler32_pallas(jnp.asarray(buf), length=n,
                                     interpret=True))
            assert got == zlib.adler32(payload.tobytes())

    def test_adler32_xla_ignores_padding(self):
        from fdeflate_tpu.ops.adler32 import adler32_jax

        import zlib

        rng = np.random.default_rng(12)
        n = 5000
        payload = rng.integers(0, 256, n, dtype=np.uint8)
        for fill in (0, 0x7F):
            buf = np.full(8192, fill, np.uint8)
            buf[:n] = payload
            got = int(np.asarray(
                adler32_jax(jnp.asarray(buf), length=n)
            ))
            assert got == zlib.adler32(payload.tobytes())


class TestDecodeMasking:
    @pytest.mark.slow  # 85s interpreted
    def test_decode_blocked_ignores_bits_past_chunk_end(self):
        """Garbage bits AFTER each chunk's payload (where the encoder never
        wrote) must not change any decoded byte or exit position."""
        from fdeflate_tpu.ops.pallas_decode2 import decode_blocked
        from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_blocked

        data, lengths = _corpus(B=2, N=2048)
        C = 8
        S = data.shape[1] // C
        win, cb, _ = encode_ultrafast_blocked(
            jnp.asarray(data), jnp.asarray(lengths), C, lut_matmul=False
        )
        win_np = np.asarray(win)
        poisoned = win_np.copy()
        pv = poisoned.view(np.uint32)
        B, C_ = np.asarray(cb).shape
        for b in range(B):
            for c in range(C_):
                lane = b * C_ + c
                lb, sub, ln = lane // 1024, (lane // 128) % 8, lane % 128
                bits = int(np.asarray(cb)[b, c])
                w = bits // 32
                rem = bits % 32
                if rem:
                    pv[lb, w, sub, ln] |= np.uint32(
                        (0xFFFFFFFF << rem) & 0xFFFFFFFF
                    )
                    w += 1
                pv[lb, w:, sub, ln] = np.uint32(0xDEADBEEF)
        outs = []
        for w_in in (win_np, poisoned):
            out, bpos = decode_blocked(
                jnp.asarray(w_in), T=S // 4, U=16, interpret=True,
                lane_major=False,
            )
            outs.append((np.asarray(out), np.asarray(bpos)))
        (o0, b0), (o1, b1) = outs
        # The masking contract covers FULL chunks (the fused pipeline's
        # verification scope): a partial tail chunk pads its remaining
        # output by decoding whatever bits follow the payload, so its
        # bytes-past-payload and exit position legitimately vary.
        L = B * C_
        lanes0 = np.transpose(o0, (0, 2, 3, 1)).reshape(-1, S // 4)[:L]
        lanes1 = np.transpose(o1, (0, 2, 3, 1)).reshape(-1, S // 4)[:L]
        offs = np.arange(C_, dtype=np.int64)[None, :] * S
        full = ((offs + S) <= lengths[:, None]).reshape(-1)
        assert full.sum() >= C_  # at least one stream is fully covered
        assert (lanes0[full] == lanes1[full]).all()
        assert (b0.reshape(-1)[:L][full] == b1.reshape(-1)[:L][full]).all()
        # Partial chunks must still agree over their payload bytes.
        part = (np.asarray(cb).reshape(-1) > 0) & ~full
        for lane in np.nonzero(part)[0]:
            b, c = divmod(int(lane), C_)
            nbytes = int(lengths[b]) - c * S
            w0 = lanes0[lane].astype("<i4").view(np.uint8)[:nbytes]
            w1 = lanes1[lane].astype("<i4").view(np.uint8)[:nbytes]
            assert (w0 == w1).all(), lane

    def test_xla_decoder_ignores_words_past_bit_end(self):
        """The streaming XLA symbol decoder must not read meaning from
        words past bit_end — poisoned padding gives identical records."""
        from fdeflate_tpu.ops import inflate as I

        import zlib

        data = np.tile(np.arange(64, dtype=np.uint8), 50).tobytes()
        comp = zlib.compress(data, 6)
        st = I._StreamState(comp)
        I._advance_headers(st)
        assert st.in_block and st.error is None
        ll, ls, dd, ds = st.tables
        sec = np.zeros((1, max(len(ls), 1)), np.uint32)
        sec[0, : len(ls)] = ls
        dsec = np.zeros((1, max(len(ds), 1)), np.uint32)
        dsec[0, : len(ds)] = ds

        results = []
        for fill in (0x00000000, 0xFFFFFFFF, 0xDEADBEEF):
            Wmax = (len(comp) + 3) // 4 + 4
            words_np = np.full((1, Wmax), fill, np.uint32)
            arr = np.frombuffer(comp + bytes((-len(comp)) % 4), "<u4")
            words_np[0, : len(arr)] = arr
            # Poison the slack bits of the final partial word too.
            rem_bits = (len(comp) * 8) % 32
            if rem_bits:
                keep = np.uint32((1 << rem_bits) - 1)
                words_np[0, len(arr) - 1] = (
                    (words_np[0, len(arr) - 1] & keep)
                    | (np.uint32(fill) & ~keep)
                )
            records, (bpos, opos, status) = I.decode_symbols(
                jnp.asarray(words_np),
                jnp.asarray([st.bitpos], np.int32),
                jnp.asarray([len(comp) * 8], np.int32),
                jnp.asarray([0], np.int32),
                jnp.asarray([True]),
                jnp.asarray([0], np.int32),
                jnp.asarray(ll[None, :].astype(np.uint32)),
                jnp.asarray(sec),
                jnp.asarray(dd[None, :].astype(np.uint32)),
                jnp.asarray(dsec),
                max_steps=4096,
            )
            results.append((
                tuple(np.asarray(r) for r in records),
                int(np.asarray(bpos)[0]),
                int(np.asarray(opos)[0]),
                int(np.asarray(status)[0]),
            ))
        r0 = results[0]
        for r in results[1:]:
            assert r[1:] == r0[1:]
            for a, b in zip(r[0], r0[0]):
                assert (a == b).all()
