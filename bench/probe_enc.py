"""Stage-by-stage hardware timing of the blocked encoder."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("FDN_JAX_CACHE", "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from fdeflate_tpu.ops import ultrafast_kernel as UK

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


def timeit(name, fn, *args, repeats=3):
    # NB: readback via np.asarray — block_until_ready does not reliably
    # block on the axon tunnel platform.
    f = jax.jit(fn)
    _ = float(np.asarray(f(*args)))
    ts = []
    for _ in range(repeats):
        t = time.perf_counter()
        _ = float(np.asarray(f(*args)))
        ts.append(time.perf_counter() - t)
    stamp(f"{name}: {min(ts)*1e3:.1f} ms")


def main():
    B = int(os.environ.get("PB_B", "16"))
    N = int(os.environ.get("PB_N", str(1 << 20)))
    C = int(os.environ.get("PB_C", "512"))
    S = N // C
    if os.environ.get("PB_CORPUS", "rand") == "idat":
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import importlib.util as _u
        spec = _u.spec_from_file_location(
            "benchmod", os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench.py"))
        bm = _u.module_from_spec(spec)
        spec.loader.exec_module(bm)
        data = bm.make_idat_corpus(B, N)
    else:
        rng = np.random.default_rng(0)
        data = rng.integers(0, 255, (B, N), np.uint8)
        data[:, ::3] = 0
    d = jax.device_put(jnp.asarray(data))
    lengths = jax.device_put(jnp.asarray(np.full(B, N, np.int32)))
    stamp(f"start backend={jax.default_backend()} B={B} N={N} C={C}")

    def fold(x):
        # XOR-ish fold XLA cannot rewrite through a scatter/cumsum: weight
        # by a position-dependent multiplier before reducing.
        x = x.astype(jnp.int32).reshape(-1)
        w = (jnp.arange(x.shape[0], dtype=jnp.int32) & 7) + 1
        return jnp.sum(x * w)

    def sum_all(*xs):
        return sum(fold(x) for x in xs)

    timeit("assign_tokens",
           lambda d, ln: sum_all(*UK._assign_tokens(d, ln, True, S)[:3]),
           d, lengths)

    def upto_cum(d, ln):
        v, nb, at_extra, aligned = UK._assign_tokens(d, ln, True, S)
        cum = jnp.cumsum(nb, axis=1)
        return sum_all(v, cum, at_extra)

    timeit("+cumsum", upto_cum, d, lengths)

    def upto_starts(d, ln):
        v, nb, at_extra, aligned = UK._assign_tokens(d, ln, True, S)
        cum = jnp.cumsum(nb, axis=1)
        tok_pos = cum - nb
        eof_pos = cum[:, -1]
        sym_start = (nb > 0) & ~at_extra
        masked = jnp.where(sym_start, tok_pos, eof_pos[:, None])
        suffix_min = jax.lax.cummin(masked[:, ::-1], axis=1)[:, ::-1]
        chunk_starts = suffix_min[:, ::S].at[:, 0].set(0)
        rel = tok_pos - jnp.repeat(chunk_starts, S, axis=1)
        return sum_all(v, rel, chunk_starts)

    timeit("+chunk_starts+rel", upto_starts, d, lengths)

    def pack_stage(d, ln, transpose):
        v, nb, at_extra, aligned = UK._assign_tokens(d, ln, True, S)
        cum = jnp.cumsum(nb, axis=1)
        tok_pos = cum - nb
        eof_pos = cum[:, -1]
        sym_start = (nb > 0) & ~at_extra
        masked = jnp.where(sym_start, tok_pos, eof_pos[:, None])
        suffix_min = jax.lax.cummin(masked[:, ::-1], axis=1)[:, ::-1]
        chunk_starts = suffix_min[:, ::S].at[:, 0].set(0)
        rel = tok_pos - jnp.repeat(chunk_starts, S, axis=1)
        v0 = v[:, 0::2].astype(jnp.uint32)
        v1 = v[:, 1::2].astype(jnp.uint32)
        n0 = nb[:, 0::2]
        n1 = nb[:, 1::2]
        vp = (v0 | (v1 << n0.astype(jnp.uint32))).astype(jnp.uint32)
        npair = n0 + n1
        rel_pair = rel[:, 0::2]
        wpad = UK.blocked_wpad(S)
        L = B * C
        LB = -(-L // 1024)
        wi = rel_pair >> 5
        sh = (rel_pair & 31).astype(jnp.uint32)
        lo = (vp << sh).astype(jnp.uint32)
        hi = ((vp >> 1) >> (31 - sh).astype(jnp.uint32)).astype(jnp.uint32)
        valid = npair > 0
        Np = N // 2
        brow = jax.lax.broadcasted_iota(jnp.int32, (B, Np), 0)
        pcol = jax.lax.broadcasted_iota(jnp.int32, (B, Np), 1)
        lane = brow * C + (pcol * 2) // S
        flat0 = lane * wpad + wi
        total = LB * 1024 * wpad
        flat_lo = jnp.where(valid, flat0, total)
        flat_hi = jnp.where(valid, flat0 + 1, total)
        win = jax.ops.segment_sum(
            jnp.where(valid, lo.astype(jnp.int32), 0).reshape(-1),
            flat_lo.reshape(-1), num_segments=total + 1,
            indices_are_sorted=True)
        win = win + jax.ops.segment_sum(
            jnp.where(valid, hi.astype(jnp.int32), 0).reshape(-1),
            flat_hi.reshape(-1), num_segments=total + 1,
            indices_are_sorted=True)
        win = win[:total].reshape(LB, 8, 128, wpad)
        if transpose:
            win = win.transpose(0, 3, 1, 2)
        return fold(win)

    timeit("pack scatter only", lambda d, ln: pack_stage(d, ln, False),
           d, lengths)
    timeit("pack scatter+transpose", lambda d, ln: pack_stage(d, ln, True),
           d, lengths)

    def kp_stage(d, ln, upto):
        from fdeflate_tpu.ops.pallas_pack import (
            pack_blocked_pallas, pack_tokens,
        )
        v, nb, at_extra, aligned = UK._assign_tokens(d, ln, True, S)
        cum = jnp.cumsum(nb, axis=1)
        tok_pos = cum - nb
        eof_pos = cum[:, -1]
        sym_start = (nb > 0) & ~at_extra
        masked = jnp.where(sym_start, tok_pos, eof_pos[:, None])
        suffix_min = jax.lax.cummin(masked[:, ::-1], axis=1)[:, ::-1]
        chunk_starts = suffix_min[:, ::S].at[:, 0].set(0)
        rel = tok_pos - jnp.repeat(chunk_starts, S, axis=1)
        tok = pack_tokens(v, nb, rel, C)
        if upto == "tokens":
            return fold(tok)
        wpad = UK.blocked_wpad(S)
        wwin = wpad + (-wpad) % 8
        win = pack_blocked_pallas(tok, wwin)
        return fold(win)

    timeit("kp: tokens", lambda d, ln: kp_stage(d, ln, "tokens"), d, lengths)
    timeit("kp: +pack kernel", lambda d, ln: kp_stage(d, ln, "pack"),
           d, lengths)

    timeit("full encode_blocked",
           lambda d, ln: sum_all(*UK.encode_ultrafast_blocked(d, ln, C)),
           d, lengths)

    timeit("linear encode_batch",
           lambda d, ln: sum_all(*UK.encode_ultrafast_batch(d, ln)),
           d, lengths)

    timeit("adler only", lambda d, ln: UK.adler32_batch(d, ln).sum(), d,
           lengths)


if __name__ == "__main__":
    main()
