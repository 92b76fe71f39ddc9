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
    )
    return f(tok)


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
