"""Adaptive (dynamic-Huffman) device codec: on-device tree construction.

The reference optimizes dynamic Huffman table construction per block
(src/lib.rs:42-101 `compute_code_lengths`, src/compress/bitstream.rs:198-325
`build_huffman_tree`); round 1 of this framework built every dynamic table
on the host.  This module closes that gap the TPU way: the whole chain

    byte/symbol histogram  ->  length-limited optimal code lengths (DP)
    ->  canonical bit-reversed codes  ->  encoder code tables
    ->  canonical decode metadata (bounds/kvals/symbol table)

is one jitted XLA program, so an adaptive-tree batch encode+decode runs
with NO host round-trip for table building.  The DP mirrors the
fpnge-derived semantics of the reference (src/lib.rs:42-101) as a
``lax.scan`` over symbols with the codespace-offset axis vectorized.

Grammar: the ultra-fast token grammar (literals + dist-1 zero runs,
ops/ultrafast_kernel._assign_tokens) with codes drawn from a per-batch
adaptive tree instead of the corpus-trained one; the same Pallas kernel
(ops/pallas_decode2.decode_blocked) decodes the result by taking the
canonical metadata as runtime inputs.  On corpora whose byte distribution
differs from the PNG training set the adaptive tree compresses strictly
better at nearly the same speed.
"""

from __future__ import annotations

import numpy as np

from ..tables import (
    LEN_SYM_TO_LEN_BASE,
    LEN_SYM_TO_LEN_EXTRA,
    LENGTH_TO_SYMBOL,
    LENGTH_TO_LEN_EXTRA,
)

NSYM = 286        # literal/length alphabet (0..285; 256 = EOB)
MAXL = 12         # matches the decode kernel's peek width
_CLS_LIT = 0
_CLS_EOB = 1
_CLS_LEN = 2
_TAB_PAD = 512


def _entry_table_np() -> np.ndarray:
    """Static per-symbol decode-entry payloads (val | extra<<9 | cls<<13)."""
    ent = np.zeros(NSYM, np.int32)
    for s in range(NSYM):
        if s < 256:
            ent[s] = s | (_CLS_LIT << 13)
        elif s == 256:
            ent[s] = _CLS_EOB << 13
        else:
            ent[s] = (
                int(LEN_SYM_TO_LEN_BASE[s - 257])
                | (int(LEN_SYM_TO_LEN_EXTRA[s - 257]) << 9)
                | (_CLS_LEN << 13)
            )
    return ent


def code_lengths_dp(freqs, max_len: int = MAXL):
    """Length-limited optimal code lengths, on device (jittable).

    Semantics of the reference's DP (src/lib.rs:42-101): minimize
    sum(freq * len) subject to exact Kraft completeness and len <= max_len,
    every symbol coded.  The symbol loop is a ``lax.scan``; the codespace
    offset axis (2^max_len + 1 wide) is vectorized.  Frequencies are scaled
    into [0, 2^16] so all costs fit int32 (TPU has no 64-bit lanes); the
    scaling only perturbs tie-breaking, never validity.

    Returns i32[n] code lengths in [1, max_len].
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    n = freqs.shape[0]
    P = 1 << max_len
    INF = jnp.int32(1 << 30)

    total = jnp.maximum(jnp.sum(freqs), 1)
    f = jnp.ceil(
        freqs.astype(jnp.float32) * (65536.0 / total.astype(jnp.float32))
    ).astype(i32)

    def fwd(row, fsym):
        new = jnp.full(P + 1, INF, i32)
        for bits in range(1, max_len + 1):
            od = 1 << (max_len - bits)
            cost = fsym * bits
            cand = jnp.where(row[: P + 1 - od] >= INF, INF,
                             row[: P + 1 - od] + cost)
            new = jnp.concatenate(
                [new[:od], jnp.minimum(new[od:], cand)]
            )
        return new, row

    row0 = jnp.full(P + 1, INF, i32).at[0].set(0)
    final, rows = jax.lax.scan(fwd, row0, f)
    # rows[sym] = dynp[sym] (before processing sym); final = dynp[n].

    def bwd(carry, x):
        off, nxt = carry
        row, fsym = x
        target = nxt[off]
        found = jnp.int32(0)
        bits_c = jnp.int32(max_len)
        off_c = off
        for bits in range(1, max_len + 1):
            od = 1 << (max_len - bits)
            cost = fsym * bits
            prev = jnp.where(off >= od, row[jnp.maximum(off - od, 0)], INF)
            tot = jnp.where(prev >= INF, INF, prev + cost)
            hit = (found == 0) & (off >= od) & (tot == target)
            bits_c = jnp.where(hit, bits, bits_c)
            off_c = jnp.where(hit, off - od, off_c)
            found = found | hit.astype(i32)
        return (off_c, row), bits_c

    (_, _), lens_rev = jax.lax.scan(
        bwd, (jnp.int32(P), final), (rows[::-1], f[::-1])
    )
    return lens_rev[::-1]


def canonical_codes(lens):
    """Canonical bit-reversed codes for per-symbol lengths (jittable).

    Matches the reference's assignment (src/lib.rs:103-127): symbols sorted
    by (length, symbol), first_code[L] = (first_code[L-1]+cnt[L-1]) << 1,
    code bit-reversed to LSB-first write order.

    Returns (codes i32[n], first i32[MAXL+1], cnt i32[MAXL+1],
    idx_in_class i32[n]).
    """
    import jax.numpy as jnp

    i32 = jnp.int32
    lensc = jnp.clip(lens, 0, MAXL)
    cnt = jnp.zeros(MAXL + 1, i32).at[lensc].add(
        jnp.where(lens > 0, 1, 0)
    ).at[0].set(0)

    first_list = [jnp.int32(0), jnp.int32(0)]  # first[0] unused, first[1]=0
    code = jnp.int32(0)
    for L in range(1, MAXL):
        code = (code + cnt[L]) << 1
        first_list.append(code)
    first = jnp.stack(first_list)  # [MAXL+1]

    idx_in_class = jnp.zeros_like(lensc)
    for L in range(1, MAXL + 1):
        m = lensc == L
        idx_in_class = jnp.where(m, jnp.cumsum(m.astype(i32)) - 1,
                                 idx_in_class)

    codes = first[lensc] + idx_in_class

    def bitrev16(x):
        x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
        x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
        x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
        x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
        return x

    codes = jnp.where(
        lens > 0, bitrev16(codes) >> (16 - lensc), 0
    )
    return codes, first, cnt, idx_in_class


def decode_meta(lens):
    """Canonical decode metadata for the Pallas kernel (jittable).

    Returns (meta i32[1, 32], tabp i32[1, _TAB_PAD//2]):
      meta[0, L] (L in 1..MAXL): canonical bound — smallest 12-bit-scaled
        reversed peek NOT decodable at length <= L;
      meta[0, 16+L]: kvals[L] = sym_offset[L] - first_code[L];
      tabp: pair-packed (two 15-bit entries per int32) symbol table in
        (length, symbol) order.
    """
    import jax.numpy as jnp

    i32 = jnp.int32
    _, first, cnt, idx_in_class = canonical_codes(lens)
    lensc = jnp.clip(lens, 0, MAXL)

    csum = jnp.cumsum(cnt)  # csum[L] = #symbols with len <= L
    off = csum - cnt        # off[L] = #symbols with len < L

    bounds = (first + cnt) << (MAXL - jnp.arange(MAXL + 1, dtype=i32))
    bounds = bounds.at[0].set(0)
    kvals = off - first

    meta = jnp.concatenate([bounds, jnp.zeros(16 - (MAXL + 1), i32),
                            kvals, jnp.zeros(16 - (MAXL + 1), i32)])
    meta = meta.reshape(1, 32)

    ent = jnp.asarray(_entry_table_np())
    sorted_pos = jnp.where(lens > 0, off[lensc] + idx_in_class, _TAB_PAD - 1)
    packed = jnp.zeros(_TAB_PAD, i32).at[sorted_pos].set(
        jnp.where(lens > 0, ent, 0), mode="drop"
    )
    tabp = packed[0::2] | (packed[1::2] << 16)
    return meta, tabp.reshape(1, _TAB_PAD // 2)


def _runtime_tables(codes, lens):
    """Encoder-side fused LUTs from device code arrays."""
    import jax.numpy as jnp

    i32 = jnp.int32
    lit_tab = (codes[:256] | (lens[:256] << 16)).astype(i32)

    tail_sym_np = np.zeros(259, np.int32)
    tail_sym_np[3:] = LENGTH_TO_SYMBOL.astype(np.int32)
    tail_extra_np = np.zeros(259, np.int32)
    tail_extra_np[3:] = LENGTH_TO_LEN_EXTRA.astype(np.int32)
    ts = jnp.asarray(tail_sym_np)
    te = jnp.asarray(tail_extra_np)
    tail_tab = (codes[ts] | (lens[ts] << 16) | (te << 20)).astype(i32)
    tail_tab = tail_tab.at[:3].set(0)

    return {
        "lit_tab": lit_tab,
        "tail_tab": tail_tab,
        "c0": codes[0].astype(i32),
        "l0": lens[0].astype(i32),
        "c285": codes[285].astype(i32),
        "l285": lens[285].astype(i32),
    }


def symbol_freqs(data, lengths, S: int, lut_matmul: bool):
    """Batch-wide DEFLATE symbol histogram for the blocked token grammar."""
    import jax.numpy as jnp

    from .ultrafast_kernel import _assign_tokens

    B = data.shape[0]
    _, _, _, _, sym = _assign_tokens(
        data, lengths, lut_matmul, S, return_syms=True
    )
    s = sym.reshape(-1)
    freqs = jnp.zeros(NSYM + 1, jnp.int32).at[
        jnp.where(s >= 0, s, NSYM)
    ].add(1)[:NSYM]
    # EOB appears once per emitted stream when framed; keep it coded.
    return freqs.at[256].add(B)


def encode_adaptive_blocked(data, lengths, num_chunks: int,
                            lut_matmul: bool | None = None,
                            kernel_assign: bool | None = None):
    """Adaptive-tree, fixed-geometry, lane-blocked encode (one XLA program).

    Builds the optimal (length-limited) tree for THIS batch on device, then
    encodes with it.  Returns (win, chunk_bits, adler, lens, meta, tabp) —
    ``lens`` (i32[286]) defines the tree; ``meta``/``tabp`` feed the Pallas
    decoder directly.
    """
    import jax
    import jax.numpy as jnp

    from .ultrafast_kernel import _assign_tokens, _pack_blocked, adler32_batch

    B, N = data.shape
    C = num_chunks
    assert N % C == 0
    S = N // C
    assert S % 8 == 0
    if lut_matmul is None:
        lut_matmul = jax.default_backend() == "tpu" or (
            jax.devices()[0].platform not in ("cpu",)
        )

    if kernel_assign is None:
        kernel_assign = jax.default_backend() == "tpu"

    freqs = symbol_freqs(data, lengths, S, lut_matmul)
    lens = code_lengths_dp(freqs, MAXL)
    codes, _, _, _ = canonical_codes(lens)

    if kernel_assign and S % 32 == 0:
        # Whole-kernel adaptive encode: the assign kernel's tables are
        # runtime inputs, so THIS batch's tree reuses the same executable
        # as the trained-tree encoder (ops/pallas_assign).
        from .pallas_assign import assign_tokens_blocked
        from .pallas_pack import pack_blocked_pallas_v2
        from .ultrafast_kernel import blocked_wpad

        tok, relp, npair, chunk_bits = assign_tokens_blocked(
            data, lengths, C, rt=(codes.astype(jnp.int32),
                                  lens.astype(jnp.int32)))
        wpad0 = blocked_wpad(S)
        win = pack_blocked_pallas_v2(tok, relp, npair,
                                     wpad0 + (-wpad0) % 8)
        adler = adler32_batch(data, lengths)
        meta, tabp = decode_meta(lens)
        return win, chunk_bits, adler, lens, meta, tabp

    rt = _runtime_tables(codes, lens)
    v, nb, at_extra, _ = _assign_tokens(data, lengths, lut_matmul, S, rt=rt)
    win, chunk_bits = _pack_blocked(v, nb, at_extra, C)
    adler = adler32_batch(data, lengths)
    meta, tabp = decode_meta(lens)
    return win, chunk_bits, adler, lens, meta, tabp
