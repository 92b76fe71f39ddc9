"""Pallas bit-pack kernel: per-byte tokens -> per-lane chunk bit windows.

The blocked encoders' last stage places each token's bits at its
chunk-relative bit offset.  Two XLA formulations both lose badly here
(measured, bench/probe_enc.py, 16 MiB batch):

* scatter-add of pair contributions: ~13 ns/element -> ~225 ms;
* even forming token PAIRS via strided slices (``v[:, 0::2]``) costs
  ~70 ms in lane relayouts.

This kernel takes ONE int32 per input byte — ``tok = v | nb << 13 |
rel << 18`` (code bits, bit count, chunk-relative bit offset; all fit:
v <= 13 bits, nb <= 14, rel < 13*S <= 8192 for S <= 630) — and does the
pair combine AND the placement on the VPU as a dense select-accumulate:

    win[lane, w] = OR_p  (wi_p == w) ? lo_p : 0  |  (wi_p == w-1) ? hi_p : 0

over the lane's S/2 pairs.  ~0.7 cycles/byte across a (8, 128) lane-block;
no scatter, no relayout (output is produced directly in the decode
kernel's [LB, wwin, 8, 128] layout).  The XLA scatter path in
ops/ultrafast_kernel._pack_blocked is the bit-exact oracle.

The reference's analogue is the sequential 64-bit BitWriter
(src/compress/bitwriter.rs:3-51).
"""

from __future__ import annotations

import functools
import os

LANE = 128


def _kernel(tok_ref, out_ref, *, P: int, wwin: int):
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    u32 = jnp.uint32

    def word_group(g, _):
        w0 = g * 8
        accs = [jnp.zeros((8, LANE), i32) for _ in range(8)]

        def body(p, accs):
            t0 = tok_ref[0, 2 * p]
            t1 = tok_ref[0, 2 * p + 1]
            v0 = t0 & 0x1FFF
            n0 = (t0 >> 13) & 0x1F
            v1 = t1 & 0x1FFF
            n1 = (t1 >> 13) & 0x1F
            rel = t0 >> 18
            vp = (v0 | (v1 << n0)).astype(u32)
            npair = n0 + n1
            sh = (rel & 31).astype(u32)
            lo = (vp << sh).astype(i32)
            hi = ((vp >> 1) >> (31 - sh).astype(u32)).astype(i32)
            wi = jnp.where(npair > 0, rel >> 5, -3)
            new = []
            for j in range(8):
                a = accs[j]
                a = a | jnp.where(wi == w0 + j, lo, 0)
                a = a | jnp.where(wi == w0 + j - 1, hi, 0)
                new.append(a)
            return tuple(new)

        accs = jax.lax.fori_loop(0, P, body, tuple(accs))
        for j in range(8):
            out_ref[0, w0 + j] = accs[j]
        return 0

    jax.lax.fori_loop(0, wwin // 8, word_group, 0)


def pack_blocked_pallas(tok, wwin: int, interpret: bool | None = None):
    """Pack lane-blocked per-byte tokens into per-lane bit windows.

    Args:
      tok: i32[LB, S, 8, 128] — per-byte packed tokens (v | nb<<13 |
        rel<<18) in lane-blocked order (lane = stream*C + chunk).
      wwin: window words per lane (multiple of 8).

    Returns win i32[LB, wwin, 8, 128] — the decode kernel's input layout.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    LB, S, _, _ = tok.shape
    assert S % 2 == 0 and wwin % 8 == 0

    f = pl.pallas_call(
        functools.partial(_kernel, P=S // 2, wwin=wwin),
        grid=(LB,),
        in_specs=[
            pl.BlockSpec((1, S, 8, LANE), lambda lb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wwin, 8, LANE), lambda lb: (lb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LB, wwin, 8, LANE), jnp.int32),
        interpret=interpret,
        compiler_params=_vmem_params(pltpu),
    )
    return f(tok)


def _vmem_params(pltpu):
    """Raise Mosaic's VMEM budget above the 16 MiB scoped default.

    XLA's scoped-vmem pass can place a kernel's full result on the VMEM
    stack (observed on v5e at the bench geometry: s32[8,840,8,128] =
    22.56 MiB > the 16 MiB default -> compile-time OOM).  The kernel's
    declared vmem_limit_bytes lifts that per-kernel cap; v5e has 128 MiB
    of VMEM per core.  FDN_PACK_VMEM overrides for probes: a byte count,
    or ``none`` to send no compiler params at all (reproduces the
    unpatched compile-time OOM, bench/probe_packoom.py mode ``a``).
    """
    env = os.environ.get("FDN_PACK_VMEM", "")
    if env == "none":
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(env) if env else 100 * 1024 * 1024)


def _kernel_v2(tok_ref, rel_ref, bounds_ref, out_ref, *, wwin: int):
    """Linear-work pack: per 8-word group, scan only the pair range that can
    touch it.

    ``_kernel`` tests every pair against every word group — O(P * wwin/8)
    per lane-block, fine for the small chunks it was built for but quadratic
    in chunk size.  Here XLA precomputes per-(block, group) pair bounds from
    the monotone pair->word mapping (see pack_bounds); the kernel's total
    inner-loop trip count is ~P plus lane-divergence slack, so cost is
    linear in chunk size and the S <= 630 token-packing limit disappears
    (rel arrives as its own pair-level input).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i32 = jnp.int32
    u32 = jnp.uint32
    lb = pl.program_id(0)

    def word_group(g, _):
        w0 = g * 8
        p_lo = bounds_ref[lb, 0, g]
        p_hi = bounds_ref[lb, 1, g]
        accs = [jnp.zeros((8, LANE), i32) for _ in range(8)]

        def body(p, accs):
            t0 = tok_ref[0, 2 * p]
            t1 = tok_ref[0, 2 * p + 1]
            v0 = t0 & 0x1FFF
            n0 = (t0 >> 13) & 0x1F
            v1 = t1 & 0x1FFF
            n1 = (t1 >> 13) & 0x1F
            rel = rel_ref[0, p]
            vp = (v0 | (v1 << n0)).astype(u32)
            npair = n0 + n1
            sh = (rel & 31).astype(u32)
            lo = (vp << sh).astype(i32)
            hi = ((vp >> 1) >> (31 - sh).astype(u32)).astype(i32)
            wi = jnp.where(npair > 0, rel >> 5, -3)
            rel8 = wi - (jnp.zeros((8, LANE), i32) + w0)
            new = []
            for j in range(8):
                a = accs[j]
                a = a | jnp.where(rel8 == j, lo, 0)
                a = a | jnp.where(rel8 == j - 1, hi, 0)
                new.append(a)
            return tuple(new)

        accs = jax.lax.fori_loop(p_lo, p_hi, body, tuple(accs))
        for j in range(8):
            out_ref[0, w0 + j] = accs[j]
        return 0

    jax.lax.fori_loop(0, wwin // 8, word_group, 0)


def pack_bounds(relp, npair, wwin: int):
    """Per-(lane-block, word-group) pair scan bounds for _kernel_v2.

    relp/npair: i32[LB, P, 8, 128] pair bit offsets / pair bit counts.
    Group g covers words [8g, 8g+8); a pair touches words wi and wi+1, so
    its groups satisfy 8g-1 <= wi <= 8g+7.  Pair->word is monotone per
    lane; block-level envelopes (cummax of the per-pair lane max, suffix
    cummin of the lane min, empty pairs excluded via sentinels) stay
    monotone, so counting threshold crossings yields valid ranges:
      glo[g] = #{p : env_max[p] < 8g-1}
      ghi[g] = P - #{p : env_min[p] > 8g+7}
    Returns i32[LB, 2, G].
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    LB, P, _, _ = relp.shape
    G = wwin // 8
    wi = relp >> 5
    big = jnp.asarray(1 << 30, i32)
    raw_max = jnp.max(jnp.where(npair > 0, wi, -1), axis=(2, 3))   # [LB, P]
    raw_min = jnp.min(jnp.where(npair > 0, wi, big), axis=(2, 3))
    env_max = jax.lax.cummax(raw_max, axis=1)
    env_min = jax.lax.cummin(raw_min[:, ::-1], axis=1)[:, ::-1]
    thr_lo = (8 * jnp.arange(G, dtype=i32) - 1)[None, None, :]
    thr_hi = (8 * jnp.arange(G, dtype=i32) + 7)[None, None, :]
    glo = jnp.sum((env_max[:, :, None] < thr_lo).astype(i32), axis=1)
    ghi = P - jnp.sum((env_min[:, :, None] > thr_hi).astype(i32), axis=1)
    return jnp.stack([glo, jnp.maximum(ghi, glo)], axis=1)


def pack_blocked_pallas_v2(tok, relp, npair, wwin: int,
                           interpret: bool | None = None):
    """Linear-work variant of pack_blocked_pallas; no chunk-size limit.

    tok: i32[LB, S, 8, 128] — v | nb<<13 per byte (rel NOT packed).
    relp/npair: i32[LB, S//2, 8, 128] — per-pair bit offset / bit count.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    LB, S, _, _ = tok.shape
    assert S % 2 == 0 and wwin % 8 == 0
    bounds = pack_bounds(relp, npair, wwin)

    f = pl.pallas_call(
        functools.partial(_kernel_v2, wwin=wwin),
        grid=(LB,),
        in_specs=[
            pl.BlockSpec((1, S, 8, LANE), lambda lb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S // 2, 8, LANE), lambda lb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, wwin, 8, LANE), lambda lb: (lb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LB, wwin, 8, LANE), jnp.int32),
        interpret=interpret,
        compiler_params=_vmem_params(pltpu),
    )
    return f(tok, relp, bounds)


def pack_tokens_v2(v, nb, rel, C: int):
    """XLA-side prep for pack_blocked_pallas_v2: byte tokens (no rel
    packed — no S limit) plus pair-level rel/npair, lane-blocked."""
    import jax.numpy as jnp

    B, N = v.shape
    S = N // C
    tok = v | (nb << 13)

    def to_blocks(x, width):
        L = B * C
        LB = -(-L // 1024)
        pad = LB * 1024 - L
        x = x.reshape(L, width)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, width), x.dtype)], axis=0)
        return x.reshape(LB, 8, LANE, width).transpose(0, 3, 1, 2)

    relp = rel[:, 0::2]
    npair = nb[:, 0::2] + nb[:, 1::2]
    return (to_blocks(tok, S), to_blocks(relp, S // 2),
            to_blocks(npair, S // 2))


def pack_tokens(v, nb, rel, C: int):
    """XLA-side prep: one packed int32 per byte, in lane-blocked layout.

    ``v``/``nb``/``rel`` are per-byte token arrays ([B, N]); returns
    tok i32[LB, S, 8, 128] with lane = stream*C + chunk.
    """
    import jax.numpy as jnp

    B, N = v.shape
    S = N // C
    assert 13 * S < (1 << 13), "rel must fit 13 bits: S <= 630"
    rel_c = jnp.clip(rel, 0, (1 << 13) - 1)
    tok = v | (nb << 13) | (rel_c << 18)

    L = B * C
    LB = -(-L // 1024)
    pad = LB * 1024 - L
    tok = tok.reshape(L, S)
    if pad:
        tok = jnp.concatenate(
            [tok, jnp.zeros((pad, S), tok.dtype)], axis=0
        )
    return tok.reshape(LB, 8, LANE, S).transpose(0, 3, 1, 2)
