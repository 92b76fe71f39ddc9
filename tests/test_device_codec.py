"""Device-path tests (run on CPU; the same programs run on TPU).

Covers the JAX batch encoder (bit-exact vs the numpy oracle), the batched
two-phase decoder, speculative chunked decode, and the sharded multi-device
codec over the virtual 8-device mesh.
"""

import zlib

import numpy as np
import pytest

import fdeflate_tpu as F
from fdeflate_tpu import errors as E
from fdeflate_tpu.ops.inflate import decompress_batch
from fdeflate_tpu.ops.ultrafast_kernel import compress_batch_ultra_fast
from fdeflate_tpu.parallel.speculative import decompress_speculative


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(123)


class TestDeviceEncoder:
    def test_bit_exact_vs_host_oracle(self, rng):
        streams = [
            b"",
            b"Hello world!",
            bytes(2048),
            bytes([5] * 300),
            bytes(259),
            bytes(258 * 3 + 2),
            rng.integers(0, 256, 1000, dtype=np.uint8).tobytes(),
            rng.choice([0] * 8 + [1, 200], 5000).astype(np.uint8).tobytes(),
            b"\x00" * 5 + b"ab" + b"\x00" * 600 + b"xyz" + b"\x00" * 3,
            bytes(7),
            bytes(9),
        ]
        outs = compress_batch_ultra_fast(streams)
        for i, (s, o) in enumerate(zip(streams, outs)):
            assert o == F.compress_to_vec_ultra_fast(s), i
            assert zlib.decompress(o) == s, i


class TestBatchDecoder:
    def test_mixed_encoders(self, rng):
        datas = [
            b"Hello world!",
            bytes(2048),
            rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),
            (rng.integers(0, 256, 20000, dtype=np.uint8) % 5).tobytes(),
            b"abcabcabc" * 500,
            b"",
        ]
        streams, expect = [], []
        for d in datas:
            for enc in (
                lambda x: zlib.compress(x, 6),
                F.compress_to_vec_ultra_fast,
                lambda x: F.compress_to_vec_with_level(x, 2),
            ):
                streams.append(enc(d))
                expect.append(d)
        res = decompress_batch(streams, max_steps=2048)
        for i, (r, e) in enumerate(zip(res, expect)):
            assert isinstance(r, bytes) and r == e, i

    def test_multi_launch_continuation(self, rng):
        big = (rng.integers(0, 256, 120_000, dtype=np.uint8) % 7).tobytes()
        res = decompress_batch([zlib.compress(big, 9)], max_steps=512)
        assert res[0] == big

    def test_stored_and_window_crossing(self, rng):
        stored = F.compress_to_vec_with_level(bytes(range(256)) * 300, 0)
        res = decompress_batch([stored], max_steps=512)
        assert res[0] == bytes(range(256)) * 300

    def test_errors(self):
        wc = bytearray(zlib.compress(b"hello world"))
        wc[-1] ^= 0xFF
        res = decompress_batch(
            [b"\x12\x34junk", zlib.compress(b"hi")[:-5], bytes(wc)],
            max_steps=256,
        )
        assert isinstance(res[0], E.BadZlibHeader)
        assert isinstance(res[1], E.InsufficientInput)
        assert isinstance(res[2], E.WrongChecksum)

    def test_fixed_block(self):
        co = zlib.compressobj(1, zlib.DEFLATED, 15, 9, zlib.Z_FIXED)
        data = b"fixed huffman block with backrefs backrefs backrefs"
        stream = co.compress(data) + co.flush()
        assert decompress_batch([stream], max_steps=256)[0] == data


class TestSpeculativeDecode:
    def test_ultrafast_streams(self, rng):
        data = rng.choice([0] * 7 + [40, 90], 100_000).astype(np.uint8).tobytes()
        comp = F.compress_to_vec_ultra_fast(data)
        assert decompress_speculative(comp, num_chunks=8) == data

    def test_dense_random(self, rng):
        data = rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes()
        comp = F.compress_to_vec_ultra_fast(data)
        assert decompress_speculative(comp, num_chunks=8) == data

    def test_fallback_multiblock(self, rng):
        data = (rng.integers(0, 256, 100_000, dtype=np.uint8) % 5).tobytes()
        comp = zlib.compress(data, 6)
        assert decompress_speculative(comp, num_chunks=8) == data

    def test_single_block_own_encoder(self, rng):
        data = (rng.integers(0, 256, 15000, dtype=np.uint8) % 9).tobytes()
        comp = F.compress_to_vec_with_level(data, 2)
        assert decompress_speculative(comp, num_chunks=4) == data


class TestSharded:
    def test_sharded_encode_matches_single(self, rng):
        import jax
        import jax.numpy as jnp

        from fdeflate_tpu.parallel.shard import make_mesh, sharded_encode_ultrafast
        from fdeflate_tpu.ops.ultrafast_kernel import finalize_streams

        mesh = make_mesh((8, 1))
        B, N = 16, 512
        data = rng.choice([0, 0, 7, 200], size=(B, N)).astype(np.uint8)
        lengths = np.full(B, N, np.int32)
        enc = sharded_encode_ultrafast(mesh)
        words, bits, adler = enc(jnp.asarray(data), jnp.asarray(lengths))
        outs = finalize_streams(words, bits, adler)
        for i in range(B):
            assert zlib.decompress(outs[i]) == data[i].tobytes()

    @pytest.mark.slow  # 87s; the mesh path also runs in __graft_entry__.dryrun_multichip
    def test_roundtrip_step_all_devices(self, rng):
        import __graft_entry__ as G

        G.dryrun_multichip(8)

    def test_checksum_tree_reduce(self, rng):
        import jax.numpy as jnp

        from fdeflate_tpu.parallel.shard import checksum_tree_reduce, make_mesh

        mesh = make_mesh((1, 8))
        data = rng.integers(0, 256, (4, 8 * 4096), dtype=np.uint8)
        ck = checksum_tree_reduce(mesh)(jnp.asarray(data))
        for i in range(4):
            assert int(np.asarray(ck)[i]) == zlib.adler32(data[i].tobytes())


class TestBatchSpeculative:
    def test_mixed_batch(self, rng):
        from fdeflate_tpu.parallel.batch_speculative import (
            decompress_batch_speculative,
        )

        datas = [
            rng.choice([0] * 7 + [40, 90, 200], 100_000).astype(np.uint8).tobytes(),
            bytes(120_000),
            rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes(),
            b"tiny",
            b"",
        ]
        streams = [F.compress_to_vec_ultra_fast(d) for d in datas]
        streams.append(zlib.compress(datas[0], 6))  # multi-block fallback
        datas.append(datas[0])
        res = decompress_batch_speculative(streams, chunks_per_stream=8)
        for r, e in zip(res, datas):
            assert isinstance(r, bytes) and r == e

    def test_checksum_and_errors(self, rng):
        from fdeflate_tpu.parallel.batch_speculative import (
            decompress_batch_speculative,
        )

        good = F.compress_to_vec_ultra_fast(bytes(50_000))
        bad = bytearray(good)
        bad[-1] ^= 0xFF
        res = decompress_batch_speculative([good, bytes(bad), b"\x01\x02x"])
        assert res[0] == bytes(50_000)
        assert isinstance(res[1], E.WrongChecksum)
        assert isinstance(res[2], E.BadZlibHeader)


class TestIndexedFusedPipeline:
    def test_roundtrip_and_verify(self, rng):
        import jax
        import jax.numpy as jnp

        from fdeflate_tpu.parallel.device_pipeline import (
            fused_ultrafast_roundtrip,
        )

        B, N, C = 4, 32768, 8
        data = np.zeros((B, N), np.uint8)
        data[0] = rng.integers(0, 256, N, dtype=np.uint8)
        data[1, ::5] = 9
        data[3, :50] = 3
        step = jax.jit(fused_ultrafast_roundtrip(C, max_steps=8192, N=N))
        out, produced, ok, ck_ok = step(
            jnp.asarray(data), jnp.asarray(np.full(B, N, np.int32))
        )
        assert np.asarray(ok).all()
        assert np.asarray(ck_ok).all()
        assert (np.asarray(produced) == N).all()
        assert (np.asarray(out)[:, :N] == data).all()

    def test_chunk_index_positions_are_symbol_starts(self, rng):
        import jax
        import jax.numpy as jnp

        from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_batch

        B, N, C = 2, 8192, 4
        data = rng.choice([0, 0, 0, 5, 250], size=(B, N)).astype(np.uint8)
        enc = jax.jit(
            lambda d, l: encode_ultrafast_batch(d, l, num_chunks=C)
        )
        words, bits, adler, idx = enc(
            jnp.asarray(data), jnp.asarray(np.full(B, N, np.int32))
        )
        idx = np.asarray(idx)
        bits = np.asarray(bits)
        for b in range(B):
            assert idx[b, 0] == 53 * 8 + 5
            assert (np.diff(idx[b]) >= 0).all()
            assert (idx[b] <= bits[b]).all()


class TestIndexedBatchAPI:
    def test_roundtrip_with_expansion(self, rng):
        from fdeflate_tpu.ops.ultrafast_kernel import compress_batch_ultra_fast
        from fdeflate_tpu.parallel.device_pipeline import (
            decompress_batch_indexed,
        )

        datas = [
            rng.choice([0] * 7 + [40, 90], 60_000).astype(np.uint8).tobytes(),
            bytes(200_000),  # high expansion exercises capacity growth
            rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes(),
            b"small",
            b"",
        ]
        streams, index = compress_batch_ultra_fast(datas, with_index=8)
        assert index.shape == (len(datas), 8)
        back = decompress_batch_indexed(streams, index)
        for r, e in zip(back, datas):
            assert r == e
        # streams stay plain zlib
        for s, e in zip(streams, datas):
            assert zlib.decompress(s) == e


class TestDeviceCorpusDifferential:
    def test_all_corpus_seeds_match_python(self):
        """The device batch decoder must produce the same outcome (bytes or
        error class) as the Python streaming oracle on every fuzz-corpus
        seed — the device-side analogue of the native differential."""
        import pathlib

        from fdeflate_tpu.models.decompressor import _decompress_to_vec_python

        corpus = sorted(
            (pathlib.Path(__file__).parent / "fixtures" / "corpus").iterdir()
        )
        streams = [p.read_bytes() for p in corpus]
        expected = []
        for s in streams:
            try:
                expected.append(("ok", _decompress_to_vec_python(s, 1 << 20)))
            except E.OutputTooLarge:
                expected.append(("big", None))
            except E.DecompressionError as e:
                expected.append(("err", type(e).__name__))
        results = decompress_batch(streams, max_steps=1024)
        for path, exp, got in zip(corpus, expected, results):
            if exp[0] == "ok":
                assert isinstance(got, bytes) and got == exp[1], path.name
            elif exp[0] == "err":
                assert isinstance(got, E.DecompressionError), path.name
                assert type(got).__name__ == exp[1], path.name


class TestSortedScatterPromise:
    """The encoders declare ``indices_are_sorted=True`` on their pack
    scatters; XLA:TPU's sorted-scatter lowering silently corrupts output
    when that promise is broken (881k bad words on a 16 MiB batch when
    empty pairs were routed to a past-the-end dump segment — see
    bench/debug_enc2048.py).  Run the encoders eagerly with segment_sum
    wrapped to verify every sorted-scatter's index stream really is
    nondecreasing, on run-heavy adversarial data where empty pairs
    interleave densely with real ones.
    """

    def _checked(self, monkeypatch):
        import jax

        orig = jax.ops.segment_sum
        calls = []

        def checked(data, segment_ids, **kw):
            if kw.get("indices_are_sorted"):
                ids = np.asarray(segment_ids)
                assert (np.diff(ids) >= 0).all(), \
                    "indices_are_sorted promise violated"
                calls.append(ids.size)
            return orig(data, segment_ids, **kw)

        monkeypatch.setattr(jax.ops, "segment_sum", checked)
        return calls

    def _adversarial(self, rng, B, N):
        data = np.zeros((B, N), np.uint8)
        data[0] = rng.integers(0, 256, N, dtype=np.uint8)   # no runs
        row = rng.integers(0, 256, N, dtype=np.uint8)       # dense short runs
        row[rng.random(N) < 0.6] = 0
        data[1] = row
        data[2, N // 3 : 2 * N // 3] = 7                    # long middle run
        # data[3] all zeros: every pair empty after the run heads
        return data

    def test_linear_encoder_indices_sorted(self, rng, monkeypatch):
        import jax.numpy as jnp

        from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_batch

        calls = self._checked(monkeypatch)
        B, N = 4, 4096
        data = self._adversarial(rng, B, N)
        lengths = np.array([N, N, N - 5, 0], np.int32)
        encode_ultrafast_batch(jnp.asarray(data), jnp.asarray(lengths),
                               lut_matmul=False)
        assert calls, "sorted scatters were not exercised"

    def test_blocked_encoder_indices_sorted(self, rng, monkeypatch):
        import jax.numpy as jnp

        from fdeflate_tpu.ops.ultrafast_kernel import (
            _assign_tokens,
            _pack_blocked,
        )

        calls = self._checked(monkeypatch)
        B, N, C = 4, 4096, 8
        S = N // C
        data = self._adversarial(rng, B, N)
        lengths = np.array([N, N, N - 8, 0], np.int32)
        v, nb, at_extra, _ = _assign_tokens(
            jnp.asarray(data), jnp.asarray(lengths), False, S
        )
        _pack_blocked(v, nb, at_extra, C, kernel_pack=False)
        assert calls, "sorted scatters were not exercised"


class TestPackKernelV2:
    """Linear-work Pallas pack kernel (ops/pallas_pack.pack_blocked_pallas_v2)
    vs the XLA sorted-scatter oracle, bit-exact in interpret mode — including
    chunk sizes past the old token-packing limit (S > 630)."""

    def _adversarial(self, rng, B, N):
        data = np.zeros((B, N), np.uint8)
        data[0] = rng.integers(0, 256, N, dtype=np.uint8)
        row = rng.integers(0, 256, N, dtype=np.uint8)
        row[rng.random(N) < 0.6] = 0
        data[1] = row
        data[2, N // 3 : 2 * N // 3] = 7
        return data

    @pytest.mark.parametrize("C", [8, 2])  # S = 512 and 2048
    def test_pack_v2_matches_oracle(self, rng, C):
        import jax
        import jax.numpy as jnp

        from fdeflate_tpu.ops.pallas_pack import (
            pack_blocked_pallas_v2,
            pack_tokens_v2,
        )
        from fdeflate_tpu.ops.ultrafast_kernel import (
            _assign_tokens,
            _pack_blocked,
            blocked_wpad,
        )

        B, N = 4, 4096
        S = N // C
        data = self._adversarial(rng, B, N)
        lengths = np.array([N, N, N - 8, 0], np.int32)
        v, nb, at_extra, _ = _assign_tokens(
            jnp.asarray(data), jnp.asarray(lengths), False, S
        )
        win_ref, cb_ref = _pack_blocked(v, nb, at_extra, C,
                                        kernel_pack=False)

        cum = jnp.cumsum(nb, axis=1)
        tok_pos = cum - nb
        eof = cum[:, -1]
        sym_start = (nb > 0) & ~at_extra
        masked = jnp.where(sym_start, tok_pos, eof[:, None])
        suffix_min = jax.lax.cummin(masked[:, ::-1], axis=1)[:, ::-1]
        cs = suffix_min[:, ::S].at[:, 0].set(0)
        rel = tok_pos - jnp.repeat(cs, S, axis=1)
        wpad0 = blocked_wpad(S)
        wwin = wpad0 + (-wpad0) % 8
        tok, relp, npair = pack_tokens_v2(v, nb, rel, C)
        win_k = pack_blocked_pallas_v2(tok, relp, npair, wwin)

        wr = np.asarray(win_ref)
        wk = np.asarray(win_k)
        m = min(wr.shape[1], wk.shape[1])
        assert (wr[:, :m] == wk[:, :m]).all()
        assert not wr[:, m:].any() and not wk[:, m:].any()


@pytest.mark.slow
class TestLinearPackMultiSlab:
    def test_kernel_linear_words_match_scatter_across_slabs(self):
        """Linear kernel-pack path vs the XLA scatter oracle on a stream
        whose payload spans SEVERAL 32768-bit output slabs.

        The round-4 pack path is near-chunk-relative: only the low 8 bits
        of each lane's in-slab offset fold into the pack kernel, and the
        word-granular remainder is applied by the log word-shift in
        _pack_linear_words.  Small-N tests never leave slab 0 (every orig
        is 0), so the shift stage needs this differential: dense random
        bytes at 16 KiB emit ~150k bits (~4.6 slabs), exercising all
        woff8 bit patterns.
        """
        import jax.numpy as jnp

        from fdeflate_tpu.ops import ultrafast_kernel as UK

        rng = np.random.default_rng(42)
        B, N = 2, 16384
        d = rng.integers(0, 256, (B, N)).astype(np.uint8)
        d[0, rng.random(N) < 0.3] = 0            # mixed runs + literals
        d[1, 5000:5800] = 0                      # a long run mid-stream
        lengths = jnp.asarray(np.array([N, N - 24], np.int32))
        kw = dict(num_chunks=8, fixed_geometry=True, return_eof=True)
        a = UK.encode_ultrafast_batch(
            jnp.asarray(d), lengths, kernel_pack=False,
            kernel_assign=False, **kw)
        b = UK.encode_ultrafast_batch(
            jnp.asarray(d), lengths, kernel_pack=True,
            kernel_assign=False, **kw)
        wa, wb = np.asarray(a[0]), np.asarray(b[0])
        assert int(np.asarray(a[1]).max()) > 3 * 32768, \
            "corpus must span several slabs for this test to bite"
        wc = min(wa.shape[1], wb.shape[1])
        np.testing.assert_array_equal(wa[:, :wc], wb[:, :wc])
        assert not wa[:, wc:].any() and not wb[:, wc:].any()
        for i in range(1, 5):
            np.testing.assert_array_equal(np.asarray(a[i]),
                                          np.asarray(b[i]))


class TestAssignKernelSmoke:
    def test_tiny_assign_and_combine_match_oracle(self):
        """Fast-tier smoke for the round-3 kernels (pallas_assign + the
        linear DMA combine): a broken kernel must not hide behind the
        ``slow`` marker (full differentials: tests/test_pallas_assign.py).
        """
        import os

        import jax.numpy as jnp

        from fdeflate_tpu.ops import ultrafast_kernel as UK

        os.environ["FDN_ASSIGN_U"] = "4"
        rng = np.random.default_rng(0)
        d = rng.integers(0, 256, (1, 128)).astype(np.uint8)
        d[0, 20:80] = 0
        lengths = jnp.asarray(np.array([128], np.int32))
        kw = dict(num_chunks=2, fixed_geometry=True, return_eof=True)
        a = UK.encode_ultrafast_batch(
            jnp.asarray(d), lengths, kernel_pack=False,
            kernel_assign=False, **kw)
        b = UK.encode_ultrafast_batch(
            jnp.asarray(d), lengths, kernel_pack=True,
            kernel_assign=True, **kw)
        wa, wb = np.asarray(a[0]), np.asarray(b[0])
        wc = min(wa.shape[1], wb.shape[1])
        np.testing.assert_array_equal(wa[:, :wc], wb[:, :wc])
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
