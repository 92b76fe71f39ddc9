"""Class-separated throughput tree (ops/septree) + sep decode kernel.

The sep profile trades a measured sliver of compressed size for a decode
kernel whose advance chain needs no symbol table (ops/pallas_decode2.
_kernel_sep).  These tests pin:

* tree validity (Kraft-exact, class separation) and header decodability —
  streams encoded with the profile are PLAIN ZLIB (zlib.decompress is the
  external ground truth, playing miniz_oxide's role per SURVEY.md §4);
* bit-exactness of the sep kernel against the numpy canonical oracle and
  the full encode->repack->decode->verify pipeline;
* the size delta vs the trained tree (documented, bounded).
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from fdeflate_tpu.ops import ultrafast_kernel as UK
from fdeflate_tpu.ops.septree import sep_profile, kernel_tree, N_LIT, SEP_LEN


def _encode_oracle(d, lengths, C, tree):
    """XLA scatter-oracle encode (no Pallas) with the sep tree."""
    return UK.encode_ultrafast_batch(
        jnp.asarray(d), jnp.asarray(lengths), num_chunks=C,
        fixed_geometry=True, return_eof=True, kernel_pack=False,
        kernel_assign=False, tree=tree)


def _corpus(rng, B, N):
    d = rng.integers(0, 256, (B, N)).astype(np.uint8)
    d[0, rng.random(N) < 0.5] = 0
    if B > 1:
        d[1, N // 4 : N // 2] = 0
    return d


class TestTree:
    def test_class_separation_and_kraft(self):
        lens, codes = kernel_tree()
        assert (lens[N_LIT:] == SEP_LEN).all()
        assert (lens[:N_LIT] <= SEP_LEN - 1).all()
        assert int(np.sum(1 << (SEP_LEN - lens))) == 1 << SEP_LEN
        # canonical codes are unique per (length, code)
        assert len({(int(l), int(c)) for l, c in zip(lens, codes)}) == 286

    def test_streams_are_plain_zlib(self):
        rng = np.random.default_rng(5)
        B, N = 2, 4096
        d = _corpus(rng, B, N)
        lengths = np.array([N, N - 13], np.int32)
        w, bits, adler, starts, eof = _encode_oracle(d, lengths, 4,
                                                     sep_profile())
        streams = UK.finalize_streams(np.asarray(w), np.asarray(bits),
                                      np.asarray(adler))
        for i, s in enumerate(streams):
            assert zlib.decompress(s) == d[i, : lengths[i]].tobytes()

    def test_size_delta_vs_trained_is_small(self):
        rng = np.random.default_rng(11)
        B, N = 4, 8192
        d = np.zeros((B, N), np.uint8)
        d[0] = rng.integers(0, 256, N)                  # dense random
        d[1, rng.random(N) < 0.6] = 1                   # run-heavy
        d[1] *= rng.integers(0, 256, N).astype(np.uint8)
        d[2] = 0                                        # all zeros
        d[3] = _corpus(rng, 1, N)[0]
        lengths = np.full(B, N, np.int32)
        kw = dict(num_chunks=4, fixed_geometry=True, return_eof=True,
                  kernel_pack=False, kernel_assign=False)
        base = UK.encode_ultrafast_batch(
            jnp.asarray(d), jnp.asarray(lengths), **kw)
        sep = UK.encode_ultrafast_batch(
            jnp.asarray(d), jnp.asarray(lengths), tree=sep_profile(), **kw)
        b0 = np.asarray(base[1]).astype(np.int64)
        b1 = np.asarray(sep[1]).astype(np.int64)
        # Throughput profile may cost a few percent; it must stay bounded
        # and each stream must still be a valid zlib artifact.
        assert (b1 <= b0 * 1.06 + 512).all(), (b0, b1)


@pytest.mark.slow
class TestSepKernel:
    def test_sep_kernel_matches_oracle_and_verifies(self):
        from fdeflate_tpu.ops.pallas_decode2 import decode_chunk_np
        from fdeflate_tpu.ops.repack import stage_wwin
        from fdeflate_tpu.parallel.device_pipeline import (
            zlib_decode_step,
            zlib_encode_step,
        )

        rng = np.random.default_rng(3)
        # Tiny geometry: the sep kernel's XLA-CPU interpret compile blows
        # up superlinearly past T = S/4 = 64 (43 s at T=64, >10 min at
        # T=128); big-U/big-T coverage runs on hardware
        # (bench/probe_sep.py: bpos+adler 16/16 at the bench geometry).
        B, N, C = 2, 2048, 8
        S = N // C
        tree = sep_profile()
        d = _corpus(rng, B, N)
        lengths = np.full(B, N, np.int32)
        enc = zlib_encode_step(C, tree=tree)
        words, bits, adler, starts, eof = enc(jnp.asarray(d),
                                              jnp.asarray(lengths))

        # external ground truth at the stream level
        streams = UK.finalize_streams(np.asarray(words), np.asarray(bits),
                                      np.asarray(adler))
        for i, s in enumerate(streams):
            assert zlib.decompress(s) == d[i].tobytes()

        # chunk-level numpy oracle on lane 3 of stream 1
        lens, _ = kernel_tree()
        w_np = np.asarray(words)[1]
        st = int(np.asarray(starts)[1, 3])
        w64 = np.zeros(w_np.shape[0] + 8, np.uint64)
        w64[: w_np.shape[0]] = w_np
        shifted = ((w64 >> (st & 31))
                   | (np.roll(w64, -1) << (32 - (st & 31)) & 0xFFFFFFFF
                      if st & 31 else 0)) & 0xFFFFFFFF
        chunk_words = shifted[st >> 5 :].astype(np.uint32)
        out, consumed = decode_chunk_np(chunk_words.astype(np.int64), S,
                                        lens=lens)
        assert out.tobytes() == d[1, 3 * S : 4 * S].tobytes()

        # full sep pipeline: repack -> sep kernel -> bpos + adler verify
        # (jitted: eager interpret-mode pallas is pathologically slow)
        dec = jax.jit(zlib_decode_step(C, N, stage_wwin(S), U=8, tree=tree))
        out_sm, bpos_ok, ck_ok = dec(words, starts, eof, adler,
                                     jnp.asarray(lengths))
        assert bool(np.asarray(bpos_ok).all()), "exit bit positions"
        assert bool(np.asarray(ck_ok).all()), "device adler"
