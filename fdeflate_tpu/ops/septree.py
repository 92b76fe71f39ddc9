"""Class-separated ultra-fast tree: the decode kernel's throughput profile.

The v2 canonical decode kernel (ops/pallas_decode2) spends ~68% of its time
in cross-lane min/max reductions that feed dynamic fori_loop bounds — every
symbol lookup and window refill pays a vector->scalar sync
(bench/probe_ablate.py, round-4 marginal re-measurement: full 7.54 ms vs
2.45 ms with static bounds vs 1.22 ms pure arithmetic, 16 MiB R=1).  The
lookups exist because a canonical sorted index must be mapped through a
~286-entry table to learn a symbol's CLASS (literal / EOB / length) and its
extra-bit count before the bit cursor can advance — a serial dependence
that forces one bounded scan per decoded symbol.

This module builds a tree where that map is ARITHMETIC:

* all 256 literals get code lengths <= 11;
* EOB (256) and the 29 length symbols (257..285) get length EXACTLY 12.

Then, during decode, ``cls = (L == 12)`` and — because canonical order
sorts by (length, symbol) — the sorted index at length 12 is AFFINE in the
symbol id: ``sym = 256 + (idx - 256)`` (all 256 literals precede it).
Length bases/extra-bit counts follow RFC 1951's closed forms, so the
advance chain needs NO table at all; only literal VALUES remain a lookup,
and those are independent of the bit cursor, so one step's <=4 of them
merge into a single statically-bounded scan (ops/pallas_decode2's
sep kernel).

The price is compression ratio: length symbols the trained tree codes in
7-12 bits always cost 12 here.  Runs are rare among SYMBOLS (one token per
up-to-258 bytes), so the measured size delta is small (recorded by
tests/test_septree.py and PERF_NOTES.md); the trained tree remains the
default for the size-parity profile, and streams from EITHER tree are
plain standard zlib (the header below encodes this tree).

Reference bars: the canned-header scheme mirrors
/root/reference/src/compress/ultrafast.rs:70-91; the length-limited DP is
the same fpnge algorithm as /root/reference/src/lib.rs:42-101.
"""

from __future__ import annotations

import functools

import numpy as np

from ..tables import CLCL_ORDER, HUFFMAN_LENGTHS

N_LIT = 256          # literals, all present, lengths <= LIT_MAXL
LIT_MAXL = 11
SEP_LEN = 12         # EOB + length symbols all sit exactly here


@functools.lru_cache(maxsize=1)
def kernel_tree() -> tuple[np.ndarray, np.ndarray]:
    """(lengths i64[286], codes i64[286]) of the class-separated tree.

    Literal weights come from the trained tree (freq ~ 2^-len, the
    distribution fdeflate's corpus training distilled); the DP re-optimizes
    them under the <=11 cap with symbols 256..285 pinned to 12 bits.
    Codes are canonical and bit-reversed (LSB-first), matching
    tables.HUFFMAN_CODES' convention.
    """
    from ..huffman import compute_code_lengths

    trained = np.asarray(HUFFMAN_LENGTHS, np.int64)
    freqs = np.zeros(286, np.uint64)
    freqs[:N_LIT] = (1 << (24 - trained[:N_LIT])).astype(np.uint64)
    freqs[N_LIT:] = 1  # pinned anyway
    min_l = np.ones(286, np.int64)
    max_l = np.full(286, LIT_MAXL, np.int64)
    min_l[N_LIT:] = SEP_LEN
    max_l[N_LIT:] = SEP_LEN
    lens = compute_code_lengths(freqs, min_l, max_l)

    assert (lens[N_LIT:] == SEP_LEN).all()
    assert (lens[:N_LIT] >= 1).all() and (lens[:N_LIT] <= LIT_MAXL).all()
    assert int(np.sum(1 << (SEP_LEN - lens))) == 1 << SEP_LEN, "Kraft"

    codes = np.zeros(286, np.int64)
    code = 0
    for length in range(1, SEP_LEN + 1):
        for sym in np.nonzero(lens == length)[0]:
            codes[sym] = int(format(code, f"0{length}b")[::-1], 2)
            code += 1
        code <<= 1
    assert code == 2 << SEP_LEN
    return lens, codes


def _build_header(litlen_lens: np.ndarray) -> tuple[bytes, int]:
    """Canned zlib + dynamic-block header bytes for ``litlen_lens``.

    Same layout as the reference's precomputed ultra-fast header
    (src/compress/ultrafast.rs:82-87): zlib magic 78 01, BFINAL=1,
    BTYPE=dynamic, HLIT=29 (286 codes), HDIST=0 (one distance code,
    1 bit wide), HCLEN=15, then the CL-coded lengths WITHOUT 16/17/18
    run-length encoding (src/compress/bitstream.rs:133-141).

    Returns (bytes, total_bits); only ``total_bits`` of the byte string
    are header (the final byte's high bits are zero — payload ORs in).
    """
    from ..models.bitstream import build_huffman_tree

    lens = np.asarray(litlen_lens, np.int64)
    dist_lens = np.array([1], np.int64)
    cl_freq = np.bincount(
        np.concatenate([lens, dist_lens]), minlength=19)[:19]
    cl_lens, cl_codes, _ = build_huffman_tree(cl_freq, 7)

    acc = 0
    pos = 0

    def put(v: int, n: int):
        nonlocal acc, pos
        acc |= int(v) << pos
        pos += n

    put(0x78, 8)
    put(0x01, 8)
    put(0b101, 3)   # BFINAL=1, BTYPE=10 (dynamic)
    put(286 - 257, 5)
    put(1 - 1, 5)
    put(15, 4)
    for j in range(19):
        put(int(cl_lens[CLCL_ORDER[j]]), 3)
    for length in np.concatenate([lens, dist_lens]):
        put(int(cl_codes[length]), int(cl_lens[length]))
    nbytes = (pos + 7) // 8
    return acc.to_bytes(nbytes, "little"), pos


class TreeProfile:
    """Everything the encoder/decoder need for one ultra-fast tree.

    ``None``-tree call sites keep the trained-tree constants; a TreeProfile
    carries the class-separated profile (or any <=12-bit tree with all
    literals present).
    """

    def __init__(self, lens: np.ndarray, codes: np.ndarray):
        self.lens = np.asarray(lens, np.int64)
        self.codes = np.asarray(codes, np.int64)
        hdr, bits = _build_header(self.lens)
        self.header_bytes = hdr
        self.header_bits = int(bits)
        self.eof_code = int(self.codes[256])
        self.eof_bits = int(self.lens[256])
        self.n_lit = int(np.count_nonzero(self.lens[:N_LIT]))
        self._rt_dev = None

    def header_words(self, nwords: int) -> np.ndarray:
        raw = self.header_bytes + bytes(4 * nwords - len(self.header_bytes))
        return np.frombuffer(raw[: 4 * nwords], dtype="<u4").copy()

    def rt_arrays(self):
        """(codes i32[286], lens i32[286]) device arrays for the assign
        kernel (ops/pallas_assign.runtime_tables)."""
        import jax.numpy as jnp

        if self._rt_dev is None:
            self._rt_dev = (
                jnp.asarray(self.codes.astype(np.int32)),
                jnp.asarray(self.lens.astype(np.int32)),
            )
        return self._rt_dev

    def rt_dict(self):
        """Lookup-table dict for the XLA oracle tokenizer
        (ops/ultrafast_kernel._assign_tokens ``rt=``)."""
        import jax.numpy as jnp

        from ..tables import LENGTH_TO_LEN_EXTRA, LENGTH_TO_SYMBOL

        codes, lens = self.codes, self.lens
        lit_tab = (codes[:256] | (lens[:256] << 16)).astype(np.int32)
        tail = np.zeros(259, np.int32)
        for T in range(3, 259):
            sym = int(LENGTH_TO_SYMBOL[T - 3])
            tail[T] = (int(codes[sym]) | (int(lens[sym]) << 16)
                       | (int(LENGTH_TO_LEN_EXTRA[T - 3]) << 20))
        return {
            "lit_tab": jnp.asarray(lit_tab),
            "tail_tab": jnp.asarray(tail),
            "c0": jnp.int32(int(codes[0])),
            "l0": jnp.int32(int(lens[0])),
            "c285": jnp.int32(int(codes[285])),
            "l285": jnp.int32(int(lens[285])),
        }


@functools.lru_cache(maxsize=1)
def sep_profile() -> TreeProfile:
    """The class-separated throughput profile (module docstring)."""
    lens, codes = kernel_tree()
    return TreeProfile(lens, codes)
