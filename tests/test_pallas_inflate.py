"""Foreign-block record kernel (ops/pallas_inflate) tests.

The kernel decodes arbitrary deflate blocks (runtime canonical trees up to
15 bits, real LZ77 backrefs) into records.  Ground truth is Python zlib;
the numpy oracle `decode_records_np` carries the kernel's exact semantics
(verified here against zlib), and the Pallas kernel must match the oracle
record-for-record in interpret mode.

Reference capability: the table-driven decode loops of
/root/reference/src/decompress.rs:611-1007 and the decode-table semantics
of /root/reference/src/huffman.rs:18-184 (incl. the 0/1-symbol distance
special cases at src/huffman.rs:40-59).
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

import fdeflate_tpu as F
from fdeflate_tpu.ops import inflate as I
from fdeflate_tpu.ops import pallas_inflate as PI

pytestmark = pytest.mark.slow  # interpret-mode record-kernel runs: 34-89s each (see pytest.ini)


def first_block_lane(z: bytes):
    """(words, sym_start_bit, meta, tab, bfinal) of a dynamic first block."""
    r = I._HostBitReader(z, 16)
    bfinal = r.take(1)
    btype = r.take(2)
    assert btype == 2, f"first block not dynamic (btype {btype})"
    lengths, hlit = I._parse_dynamic_lengths(r)
    meta, tab = PI.foreign_meta(lengths[:hlit], lengths[288:320])
    padded = z + bytes((-len(z)) % 4) + bytes(8)
    return np.frombuffer(padded, "<u4"), r.pos, meta, tab, bool(bfinal)


def materialize_records_np(recs: np.ndarray) -> bytes:
    out = bytearray()
    for rec in recs:
        k = (rec >> 28) & 0xF
        p = rec & 0x0FFFFFFF
        if k == PI.REC_LITS:
            out.append(p & 0xFF)
            if (p >> 16) & 3 == 2:
                out.append((p >> 8) & 0xFF)
        elif k == PI.REC_MATCH:
            ln = ((p >> 15) & 0xFF) + 3
            d = (p & 0x7FFF) + 1
            for _ in range(ln):
                out.append(out[-d])
        else:
            break
    return bytes(out)


class TestOracleVsZlib:
    """decode_records_np + foreign_meta against zlib ground truth."""

    @pytest.mark.parametrize("case", ["mixed", "zeros", "text", "rle"])
    def test_single_block_roundtrip(self, case):
        rng = np.random.default_rng(hash(case) % 2**31)
        if case == "mixed":
            wp = [rng.bytes(int(rng.integers(3, 12))) for _ in range(64)]
            data = b"".join(wp[int(rng.integers(64))] for _ in range(600))
            z = zlib.compress(data, 6)
        elif case == "zeros":
            data = bytes(6000)
            z = zlib.compress(data, 6)
        elif case == "text":
            data = b"the quick brown fox jumps over the lazy dog " * 80
            z = zlib.compress(data, 9)
        else:  # rle: single-distance-code tree (reference huffman.rs:40-59)
            data = bytes(500) + b"\x07" * 900 + bytes(300)
            z = F.compress_to_vec_rle(data)
        words, pos, meta, tab, bfinal = first_block_lane(z)
        recs, endpos, done = PI.decode_records_np(words, pos, meta, tab, 8192)
        assert done == 1, "EOB not reached"
        out = materialize_records_np(recs)
        ref = zlib.decompress(z)
        if bfinal:
            assert out == ref
        else:
            assert ref.startswith(out) and len(out) > 0

    def test_huffman_only_no_dist_codes(self):
        """Z_HUFFMAN_ONLY emits no matches; the dist tree may be empty."""
        rng = np.random.default_rng(3)
        data = (rng.integers(0, 16, 3000).astype(np.uint8) * 5).tobytes()
        co = zlib.compressobj(6, zlib.DEFLATED, 15, 9, zlib.Z_HUFFMAN_ONLY)
        z = co.compress(data) + co.flush()
        words, pos, meta, tab, bfinal = first_block_lane(z)
        recs, endpos, done = PI.decode_records_np(words, pos, meta, tab, 8192)
        assert done == 1
        out = materialize_records_np(recs)
        assert zlib.decompress(z).startswith(out) and (
            not bfinal or out == zlib.decompress(z))

    def test_fixed_tree_meta(self):
        """foreign_meta on the FIXED code lengths decodes a fixed block."""
        from fdeflate_tpu.tables import FIXED_CODE_LENGTHS

        data = b"fdeflate!"
        co = zlib.compressobj(6, zlib.DEFLATED, 15, 9, zlib.Z_FIXED)
        z = co.compress(data) + co.flush()
        r = I._HostBitReader(z, 16)
        r.take(1)
        assert r.take(2) == 1  # fixed block
        fl = np.asarray(FIXED_CODE_LENGTHS, np.int64)
        meta, tab = PI.foreign_meta(fl[:288], np.full(32, 5, np.int64))
        padded = z + bytes((-len(z)) % 4) + bytes(8)
        words = np.frombuffer(padded, "<u4")
        recs, endpos, done = PI.decode_records_np(words, r.pos, meta, tab, 64)
        assert done == 1
        assert materialize_records_np(recs) == data

    def test_invalid_distance_errors(self):
        """A '1' bit where a single-code dist tree expects '0' must error
        (sentinel entries), never decode garbage silently."""
        data = bytes(500) + b"\x07" * 900
        z = F.compress_to_vec_rle(data)
        words, pos, meta, tab, _ = first_block_lane(z)
        # degenerate tree: bounds[2:] block decode at L >= 2
        assert int(meta[32 + 1]) == 1 << (PI.MAXL - 1)
        # craft a peek whose first dist bit is 1 -> sentinel
        idx_bad = int(meta[48 + 2]) + 2
        e = PI._tab_entry(np.asarray(tab), idx_bad)
        assert (e & 0x1FF) == 0x1FF


def _kernel_inputs(lanes, K):
    import jax.numpy as jnp

    wwin = max(len(w) - (p >> 5) for (w, p, _, _, _) in lanes)
    wwin += (-wwin) % 8
    win = np.zeros((1, wwin, 8, 128), np.int32)
    pos0 = np.zeros((1, 8, 128), np.int32)
    meta_in = np.zeros((1, 64, 8, 128), np.int32)
    tab_in = np.zeros((1, PI._TPAIRS, 8, 128), np.int32)
    for i, (w, p, m, t, _) in enumerate(lanes):
        r_, c_ = divmod(i, 128)
        seg = w[p >> 5 :][:wwin]
        win[0, : len(seg), r_, c_] = seg.view(np.int32)
        pos0[0, r_, c_] = p & 31
        meta_in[0, :, r_, c_] = m
        tab_in[0, :, r_, c_] = t
    return (jnp.asarray(win), jnp.asarray(pos0), jnp.asarray(meta_in),
            jnp.asarray(tab_in))


class TestKernelVsOracle:
    def test_mixed_lanes_match_oracle(self):
        rng = np.random.default_rng(11)
        wp = [rng.bytes(int(rng.integers(3, 12))) for _ in range(64)]
        streams = [
            zlib.compress(
                b"".join(wp[int(rng.integers(64))] for _ in range(600)), 6),
            zlib.compress(bytes(5000), 6),
            zlib.compress(b"ab" * 4000, 1),
        ]
        lanes = [first_block_lane(z) for z in streams]
        K = 1024
        oracle = [
            PI.decode_records_np(w, p, m, t, K) for (w, p, m, t, _) in lanes
        ]
        recs, bpos, done = PI.decode_records_blocked(
            *_kernel_inputs(lanes, K), K=K, U=16, interpret=True)
        recs = np.asarray(recs)
        bpos = np.asarray(bpos)
        done = np.asarray(done)
        for i, (orecs, opos, odone) in enumerate(oracle):
            r_, c_ = divmod(i, 128)
            w, p, m, t, _ = lanes[i]
            assert (recs[0, :, r_, c_] == orecs).all(), f"lane {i} records"
            assert bpos[0, r_, c_] == opos - (p >> 5) * 32, f"lane {i} pos"
            assert done[0, r_, c_] == odone, f"lane {i} done"
        # idle lanes (zero windows/meta) must not report EOB
        assert done[0, 0, 10] != 1


class TestCraftedStreamsPallas:
    """Kernel edge paths on hand-built streams (zlib never emits these):
    15-bit litlen codes, max-distance/max-length matches, single-dist
    trees — through the sequential pallas engine."""

    def test_15bit_codes_and_extremes(self):
        from test_crafted_streams import emit_dynamic_block, lopsided_lengths

        # 15-bit litlen codes (deep canonical tree)
        z1, expected = emit_dynamic_block(
            lopsided_lengths(), np.zeros(30, np.int64),
            [0, 1, 2, 13, 14, 14, 0, 5, 9, 14] * 5)

        # max-length (258) and max-distance (32768) matches; history is
        # built with matches so the record count stays small
        litlen2 = np.full(286, 9, np.int64)
        litlen2[:226] = 8  # 226/256 + 60/512 = 1: exact Kraft
        dist2 = np.zeros(30, np.int64)
        dist2[17] = 1  # covers dist 385..512
        dist2[29] = 1  # base 24577, 13 extra -> up to 32768
        rng = np.random.default_rng(3)
        head = list(rng.integers(0, 226, 512).astype(np.uint8).tolist())
        syms2 = head + [(258, 512)] * 126 + [(258, 32768)]
        z2, expected2 = emit_dynamic_block(litlen2, dist2, syms2)
        assert len(expected2) == 512 + 127 * 258

        res = I._decompress_batch_sequential(
            [z1, z2], max_steps=640, engine="pallas")
        assert res[0] == expected
        assert res[1] == expected2
        # engine agreement
        res_x = I._decompress_batch_sequential(
            [z1, z2], max_steps=640, engine="xla")
        assert res == res_x


class TestBatchDifferential:
    def test_many_random_streams_one_launch(self):
        """64 streams of varied corpora/levels/strategies decode in shared
        kernel launches (lanes are ~free in interpret mode); every result
        must equal zlib's and the XLA engine's."""
        rng = np.random.default_rng(77)
        wp = [rng.bytes(int(rng.integers(2, 20))) for _ in range(64)]
        streams, datas = [], []
        for i in range(64):
            kind = i % 6
            n = int(rng.integers(50, 4000))
            if kind == 0:
                d = rng.bytes(n)  # incompressible -> stored blocks
            elif kind == 1:
                d = bytes(n)  # zeros
            elif kind == 2:
                d = b"".join(wp[int(rng.integers(64))]
                             for _ in range(max(1, n // 8)))
            elif kind == 3:
                d = (rng.integers(0, 4, n) * 67).astype(np.uint8).tobytes()
            elif kind == 4:
                d = (b"abc" * (n // 3 + 1))[:n]
            else:
                d = bytes([int(x) for x in rng.integers(0, 2, n)])
            lvl = int(rng.integers(1, 10))
            strat = [zlib.Z_DEFAULT_STRATEGY, zlib.Z_FIXED,
                     zlib.Z_HUFFMAN_ONLY, zlib.Z_RLE][i % 4]
            co = zlib.compressobj(lvl, zlib.DEFLATED, 15, 8, strat)
            streams.append(co.compress(d) + co.flush())
            datas.append(d)
        rp = I._decompress_batch_sequential(
            streams, max_steps=1024, engine="pallas")
        rx = I._decompress_batch_sequential(
            streams, max_steps=1024, engine="xla")
        for i, (a, b, d) in enumerate(zip(rp, rx, datas)):
            assert a == d, f"stream {i} pallas mismatch"
            assert b == d, f"stream {i} xla mismatch"


class TestForeignBatch:
    def test_mixed_batch(self):
        from fdeflate_tpu.parallel import discovery as D

        rng = np.random.default_rng(41)
        wp = [rng.bytes(int(rng.integers(3, 12))) for _ in range(64)]

        def mk(n, seed):
            r = np.random.default_rng(seed)
            return b"".join(wp[int(r.integers(64))] for _ in range(n))

        datas = [mk(3000, 1), mk(5000, 2), b"not zlib" * 50, mk(2000, 3)]
        streams = [zlib.compress(d, 6) if i != 2 else d
                   for i, d in enumerate(datas)]
        res = D.try_foreign_batch(streams, max_steps=1600, engine="pallas")
        assert res[2] is None
        for i in (0, 1, 3):
            assert res[i] == datas[i], i


class TestHeaderValidatorKernel:
    """Device stage-2 (header-validation kernel) vs the numpy oracle."""

    def test_matches_numpy_stage2(self):
        from fdeflate_tpu.parallel import discovery as D

        rng = np.random.default_rng(9)
        wp = [rng.bytes(int(rng.integers(3, 12))) for _ in range(256)]
        data = b"".join(
            wp[int(rng.integers(256))] for _ in range(12000))[: 72 << 10]
        for z in (zlib.compress(data, 6), zlib.compress(bytes(60000), 6)):
            c1 = D.scan_stage1(z)
            assert len(c1) > 0
            o_ref, e_ref = D.validate_stage2(z, c1)
            o_dev, e_dev = D.validate_stage2_device(z, c1)
            assert (o_ref == o_dev).all() and (e_ref == e_dev).all()

    def test_stage1_device_matches_numpy(self):
        from fdeflate_tpu.parallel import discovery as D

        rng = np.random.default_rng(13)
        data = (rng.integers(0, 16, 50000).astype(np.uint8) * 2).tobytes()
        z = zlib.compress(data, 6)
        a = D.scan_stage1(z)
        b = D.scan_stage1_device(z)
        assert len(a) == len(b) and (a == b).all()


class TestSequentialPallasEngine:
    """decompress_batch's per-block loop through the record kernel: one
    lane per stream, dynamic AND fixed blocks, exact per-stream XLA redo
    on kernel anomalies."""

    def test_mixed_batch_exact_and_engines_agree(self):
        from fdeflate_tpu import errors as E

        rng = np.random.default_rng(31)
        d1 = (rng.integers(0, 16, 3000).astype(np.uint8) * 3).tobytes()
        co = zlib.compressobj(6, zlib.DEFLATED, 15, 9, zlib.Z_FIXED)
        d2 = b"fixed block data " * 30
        d3 = rng.bytes(400)
        d4 = bytes(8000)
        z5 = zlib.compress(d1, 6)
        z6 = bytearray(zlib.compress(d2, 6))
        z6[len(z6) // 2] ^= 0xFF
        streams = [
            zlib.compress(d1, 6),                # dynamic
            co.compress(d2) + co.flush(),        # fixed
            zlib.compress(d3, 0),                # stored
            zlib.compress(d4, 9),                # degenerate dist tree
            z5[: len(z5) // 2],                  # truncated -> anomaly redo
            bytes(z6),                           # corrupted
        ]
        rp = I._decompress_batch_sequential(
            streams, max_steps=512, engine="pallas")
        rx = I._decompress_batch_sequential(
            streams, max_steps=512, engine="xla")
        assert rp[0] == d1 and rp[1] == d2 and rp[2] == d3 and rp[3] == d4
        assert isinstance(rp[4], E.DecompressionError)
        assert isinstance(rp[5], E.DecompressionError)
        for a, b in zip(rp, rx):
            assert type(a) is type(b)
            if isinstance(a, bytes):
                assert a == b

    def test_window_stall_resume(self, monkeypatch):
        """A block bigger than the staged bit window freezes in-kernel at
        the window edge (done=3) and resumes from a re-staged window next
        launch — no fallback, exact output."""
        rng = np.random.default_rng(37)
        data = (rng.integers(0, 16, 6000).astype(np.uint8) * 9).tobytes()
        z = zlib.compress(data, 6)
        assert len(z) > 64 * 4 * 3  # needs several 64-word windows
        monkeypatch.setattr(I, "_SEQ_WWIN_CAP", 64)
        r = I._decompress_batch_sequential([z], max_steps=512,
                                           engine="pallas")
        assert r[0] == data

    def test_multi_launch_resume(self):
        """A block bigger than one launch's record budget resumes mid-block
        (K slots exhausted -> _OK -> next launch continues)."""
        rng = np.random.default_rng(33)
        data = (rng.integers(0, 16, 4000).astype(np.uint8) * 7).tobytes()
        z = zlib.compress(data, 6)
        # max_steps=64 -> K=256 record slots, far fewer than the block needs
        r = I._decompress_batch_sequential([z], max_steps=64, engine="pallas")
        assert r[0] == data


class TestForeignPallasEngine:
    def test_try_foreign_pallas_single_block(self):
        from fdeflate_tpu.parallel import discovery as D

        rng = np.random.default_rng(21)
        data = (rng.integers(0, 16, 4000).astype(np.uint8) * 3).tobytes()
        z = zlib.compress(data, 6)
        r = D.try_foreign(z, max_steps=640, engine="pallas")
        assert r == data

    def test_host_materialize_option(self):
        """Consumer-side materialization (native fdn_materialize) agrees
        with the device materialize."""
        from fdeflate_tpu.models.native import available
        from fdeflate_tpu.parallel import discovery as D

        if not available():
            pytest.skip("native backend unavailable")
        rng = np.random.default_rng(23)
        data = (rng.integers(0, 16, 5000).astype(np.uint8) * 7).tobytes()
        z = zlib.compress(data, 6)
        rh = D.try_foreign(z, max_steps=640, engine="pallas",
                           materialize="host")
        rd = D.try_foreign(z, max_steps=640, engine="pallas",
                           materialize="device")
        assert rh == data and rd == data

    def test_try_foreign_engines_agree_or_fall_back(self):
        from fdeflate_tpu.parallel import discovery as D

        data = b"agreement corpus " * 300
        z = zlib.compress(data, 6)
        rx = D.try_foreign(z, max_steps=1024, engine="xla")
        rp = D.try_foreign(z, max_steps=1024, engine="pallas")
        assert rx is None or rx == data
        assert rp is None or rp == data
