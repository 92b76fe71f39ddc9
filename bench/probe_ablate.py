"""Ablation timing for the v2 decode kernel: where do the cycles go?

Clones ``_kernel_light`` (fdeflate_tpu/ops/pallas_decode2.py, the
pre-broadcast-VMEM-inputs design) with switches that stub out one cost
center at a time.  Stubbed variants produce WRONG bytes — only full/static
are checked — but each keeps real data dependencies so Mosaic cannot
dead-code the remaining work.

Variants:
  full        — production kernel structure (correct; baseline)
  static      — dynamic-bound fori_loops replaced by full static scans
                (correct; isolates the cross-lane min/max + trip savings)
  fixedbounds — 4-group static scans, NO cross-lane reductions (wrong
                bytes; isolates the min/max reduction cost)
  nosym       — sym_lookup returns a constant-composed entry (no table scan)
  norefill    — window refill never scans (wrong past 160 bits; upper bound)
  noscan      — nosym + norefill (floor of the pure step arithmetic)
  nolen       — length compare chain replaced by L=9 (wrong; bounds cost)
  nopeek      — peek32 returns the first window word only (wrong)
  twosub      — 2 decode sub-iterations per word instead of 4 (wrong byte
                accounting; scales the per-sub arithmetic volume)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from fdeflate_tpu.ops.pallas_decode2 import (
    LANE, MAXL, _TAB_PAD, canonical_meta,
)
from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_blocked
from probe_decode2 import make_idat


def _kernel_abl(win_ref, tab_ref, meta_ref, out_ref, bpos_ref, state, *,
                wwin: int, U: int, abl: str):
    from jax.experimental import pallas as pl

    i32 = jnp.int32
    u32 = jnp.uint32
    sb = pl.program_id(1)
    num_sb = pl.num_programs(1)
    npairs = _TAB_PAD // 2
    dyn = abl != "static"

    def zeros():
        return jnp.zeros((8, LANE), i32)

    def bound_v(l):
        return meta_ref[l]

    def kval_v(l):
        return meta_ref[16 + l]

    def word_at(widx):
        if abl in ("norefill", "noscan"):
            return widx  # dependency-preserving stub
        if abl == "fixedbounds":
            glo, ghi = 0, 4
        elif dyn:
            glo = jnp.minimum(jnp.min(widx) >> 3, wwin // 8)
            ghi = jnp.minimum((jnp.max(widx) >> 3) + 1, wwin // 8)
        else:
            glo, ghi = 0, wwin // 8

        def body(g, acc):
            w0 = g * 8
            rel = widx - (zeros() + w0)
            for j in range(8):
                v = win_ref[0, w0 + j]
                acc = jnp.where(rel == j, v, acc)
            return acc

        return jax.lax.fori_loop(glo, ghi, body, zeros())

    def sym_lookup(idx):
        if abl in ("nosym", "noscan"):
            return (idx & 0xFF)  # all-literal stub keeps idx live
        pidx = idx >> 1
        if abl == "fixedbounds":
            ghi = 4
        elif dyn:
            ghi = jnp.minimum((jnp.max(pidx) >> 3) + 1, npairs // 8)
        else:
            ghi = npairs // 8

        def body(g, acc):
            p0 = g * 8
            rel = pidx - (zeros() + p0)
            for j in range(8):
                v = tab_ref[p0 + j]
                acc = jnp.where(rel == j, v, acc)
            return acc

        accp = jax.lax.fori_loop(0, ghi, body, zeros())
        return (accp >> ((idx & 1) * 16)) & 0x7FFF

    @pl.when(sb == 0)
    def _init():
        state[0] = zeros()
        state[1] = zeros()
        state[2] = zeros()
        for j in range(5):
            state[3 + j] = win_ref[0, j]

    pos, run_rem, base = state[0], state[1], state[2]
    w = [state[3 + j] for j in range(5)]

    def bitrev12(x):
        x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
        x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
        x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
        x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
        return x >> 4

    for u in range(U):
        pos_off = pos - (base << 5)

        def peek32(o):
            oo = pos_off + o
            if abl == "nopeek":
                return w[0].astype(u32) >> (oo & 31).astype(u32)
            wsel = oo >> 5
            a = w[3]
            b = w[4]
            for j in (2, 1, 0):
                a = jnp.where(wsel == j, w[j], a)
                b = jnp.where(wsel == j, w[j + 1], b)
            a = a.astype(u32)
            b = b.astype(u32)
            sh = (oo & 31).astype(u32)
            return (a >> sh) | jnp.where(
                sh == 0, u32(0), b << ((32 - (oo & 31)).astype(u32) & 31)
            )

        consumed = zeros()
        word = zeros().astype(u32)
        filled = zeros()
        nsub = 2 if abl == "twosub" else 4
        for _sub in range(nsub):
            space = 4 - filled
            take = jnp.minimum(run_rem, space)
            filled = filled + take
            run_rem = run_rem - take

            need = (filled < 4) & (run_rem == 0)
            bits = peek32(consumed)
            if abl == "nolen":
                L = jnp.full((8, LANE), 9, i32) + (bits & 0).astype(i32)
                Kv = zeros()
            else:
                r12 = bitrev12((bits & 0xFFF).astype(i32))
                L = jnp.ones((8, LANE), i32)
                for l in range(1, MAXL):
                    L = L + (r12 >= bound_v(l)).astype(i32)
                Kv = zeros() + kval_v(MAXL)
                for l in range(1, MAXL):
                    Kv = jnp.where(L == l, kval_v(l), Kv)
            if abl == "nolen":
                idx = (bits & 0xFF).astype(i32)
            else:
                idx = Kv + (r12 >> (MAXL - L))
            e = sym_lookup(jnp.where(need, idx, 0))
            val = e & 0x1FF
            extra = (e >> 9) & 0xF
            cls = e >> 13

            is_lit = need & (cls == 0)
            is_run = need & (cls == 2)
            word = word | jnp.where(
                is_lit, val.astype(u32) << (filled * 8).astype(u32), u32(0)
            )
            filled = filled + is_lit.astype(i32)
            run_val = val + ((bits >> L.astype(u32)).astype(i32)
                             & ((1 << extra) - 1))
            run_rem = jnp.where(is_run, run_val, run_rem)
            consumed = consumed + jnp.where(
                is_lit, L, jnp.where(is_run, L + extra + 1, 0)
            )

        take = jnp.minimum(run_rem, 4 - filled)
        filled = filled + take
        run_rem = run_rem - take

        pos = pos + consumed
        out_ref[0, u] = word.astype(i32)

        for _ in range(2):
            need_r = (pos >> 5) > base
            for j in range(4):
                w[j] = jnp.where(need_r, w[j + 1], w[j])
            base = jnp.where(need_r, base + 1, base)
            w[4] = jnp.where(need_r, word_at(base + 4), w[4])

    state[0], state[1], state[2] = pos, run_rem, base
    for j in range(5):
        state[3 + j] = w[j]

    @pl.when(sb == num_sb - 1)
    def _finish():
        bpos_ref[0] = state[0]


def decode_abl(win, T: int, U: int, abl: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    LB, wwin, _, _ = win.shape
    if wwin % 8 != 0:
        pad = 8 - wwin % 8
        win = jnp.pad(win, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wwin += pad
    SB = T // U
    npairs = _TAB_PAD // 2
    bounds, kvals, packed = canonical_meta()
    p64 = packed.astype(np.int64)
    tab = (p64[0::2] | (p64[1::2] << 16)).astype(np.int32)
    tab_arg = jnp.asarray(np.ascontiguousarray(
        np.broadcast_to(tab[:, None, None], (npairs, 8, LANE))))
    meta_np = np.zeros(32, np.int32)
    meta_np[: MAXL + 1] = bounds
    meta_np[16: 16 + MAXL + 1] = kvals
    meta_arg = jnp.asarray(np.ascontiguousarray(
        np.broadcast_to(meta_np[:, None, None], (32, 8, LANE))))

    f = pl.pallas_call(
        functools.partial(_kernel_abl, wwin=wwin, U=U, abl=abl),
        grid=(LB, SB),
        in_specs=[
            pl.BlockSpec((1, wwin, 8, LANE), lambda lb, sb: (lb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npairs, 8, LANE), lambda lb, sb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 8, LANE), lambda lb, sb: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, U, 8, LANE), lambda lb, sb: (lb, sb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANE), lambda lb, sb: (lb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((LB, T, 8, LANE), jnp.int32),
            jax.ShapeDtypeStruct((LB, 8, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((8, 8, LANE), jnp.int32)],
        interpret=False,
    )
    return f(win, tab_arg, meta_arg)


def main():
    B = int(os.environ.get("ABL_B", "16"))
    N = int(os.environ.get("ABL_N", str(1 << 20)))
    C = int(os.environ.get("ABL_C", "512"))
    U = int(os.environ.get("ABL_U", "32"))
    repeats = 5
    S = N // C
    data = make_idat(B, N)
    lengths = jnp.asarray(np.full(B, N, np.int32))
    enc = jax.jit(lambda d, ln: encode_ultrafast_blocked(d, ln, C))
    win, chunk_bits, _ = enc(jnp.asarray(data), lengths)
    win = jax.block_until_ready(win)
    cb = np.asarray(chunk_bits)

    variants = sys.argv[1:] or [
        "full", "static", "fixedbounds", "nosym", "norefill", "noscan",
        "nolen", "nopeek", "twosub"]
    reps = int(os.environ.get("ABL_REPS", "8"))
    for abl in variants:
        # Marginal timing (round-4 fix): each launch pays the ~25-32 ms
        # tunnel dispatch floor, which JITTERS by several ms between runs —
        # the wall deltas between 3-7 ms kernel variants were mostly floor
        # noise.  R in-program reps with a serial data dependency isolate
        # the kernel cost exactly as bench.py does.
        def make(r, abl=abl):
            @jax.jit
            def g(w):
                def body(k, acc):
                    w2 = w.at[0, 0, 0, 0].add(acc & 1)
                    out_sm, bpos = decode_abl(w2, T=S // 4, U=U, abl=abl)
                    return (acc
                            + jnp.sum(out_sm.reshape(-1)[::997])
                            + jnp.sum(bpos))

                return jax.lax.fori_loop(0, r, body, jnp.int32(0))

            return g

        @jax.jit
        def dec_check(w, abl=abl):
            out_sm, bpos = decode_abl(w, T=S // 4, U=U, abl=abl)
            return jnp.sum(out_sm), bpos

        r = dec_check(win)
        bp = np.asarray(r[1]).reshape(-1)[: B * C].reshape(B, C)
        ok = bool((bp == cb).all()) if abl in ("full", "static") else None

        def wall(f):
            _ = int(np.asarray(f(win)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _ = int(np.asarray(f(win)))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1 = wall(make(1))
        tR = wall(make(reps))
        t = max((tR - t1) / (reps - 1), 1e-9)
        tag = "" if ok is None else f"  bpos_ok={ok}"
        print(f"{abl:11s}: wall(1) {t1*1e3:6.1f} ms  marginal {t*1e3:6.2f} ms"
              f"  ({B*N/t/1e9:.2f} GB/s){tag}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
