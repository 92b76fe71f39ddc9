"""Isolate the S=2048 encode corruption: token assignment vs pack scatter.

Computes (v, nb) on TPU and CPU (matmul vs gather LUT), then packs the SAME
host tokens through the XLA scatter on both backends, with
indices_are_sorted True/False.  Prints which stage diverges.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

CACHE = os.environ.get("FDN_JAX_CACHE", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/bench")

from fdeflate_tpu.ops.ultrafast_kernel import _assign_tokens, blocked_wpad
from probe_decode2 import make_idat

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


B = int(os.environ.get("DBG_B", "16"))
N = int(os.environ.get("DBG_N", str(1 << 20)))
C = int(os.environ.get("DBG_C", "512"))
S = N // C

cpu = jax.devices("cpu")[0]
stamp(f"backend={jax.default_backend()} B={B} N={N} C={C} S={S}")

data = make_idat(B, N)
lengths = np.full(B, N, np.int32)


def tokens(lut_matmul):
    def f(d, ln):
        v, nb, at_extra, _ = _assign_tokens(d, ln, lut_matmul, S)
        return v, nb, at_extra
    return f


# --- stage 1: token assignment, TPU matmul vs CPU gather -------------------
vt, nbt, aet = jax.jit(tokens(True))(jnp.asarray(data), jnp.asarray(lengths))
vt, nbt, aet = (np.asarray(x) for x in (vt, nbt, aet))
stamp("TPU tokens done")
with jax.default_device(cpu):
    vc, nbc, aec = jax.jit(tokens(False))(
        jax.device_put(data, cpu), jax.device_put(lengths, cpu)
    )
vc, nbc, aec = (np.asarray(x) for x in (vc, nbc, aec))
stamp(f"tokens equal: v={(vt == vc).all()} nb={(nbt == nbc).all()} "
      f"ae={(aet == aec).all()}")
if not (vt == vc).all():
    bad = np.argwhere(vt != vc)
    stamp(f"  first v mismatches: {bad[:5].tolist()}")

# --- stage 2: pack scatter from identical host tokens ----------------------
v, nb = vc, nbc
cum = np.cumsum(nb, axis=1)
tok_pos = cum - nb
eof_pos = cum[:, -1]
sym_start = (nb > 0) & ~aec
masked = np.where(sym_start, tok_pos, eof_pos[:, None])
suffix_min = np.minimum.accumulate(masked[:, ::-1], axis=1)[:, ::-1]
chunk_starts = suffix_min[:, ::S]
chunk_starts[:, 0] = 0
rel = tok_pos - np.repeat(chunk_starts, S, axis=1)

wpad = blocked_wpad(S)
LANE = 128
L = B * C
LB = -(-L // 1024)
total = LB * 1024 * wpad


def pack(vv, nbb, rell, sorted_flag):
    i32, u32 = jnp.int32, jnp.uint32
    v0 = vv[:, 0::2].astype(u32)
    v1 = vv[:, 1::2].astype(u32)
    n0 = nbb[:, 0::2]
    n1 = nbb[:, 1::2]
    vp = (v0 | (v1 << n0.astype(u32))).astype(u32)
    npair = n0 + n1
    rel_pair = rell[:, 0::2]
    wi = rel_pair >> 5
    sh = (rel_pair & 31).astype(u32)
    lo = (vp << sh).astype(u32)
    hi = ((vp >> 1) >> (31 - sh).astype(u32)).astype(u32)
    valid = npair > 0
    Np = N // 2
    brow = jax.lax.broadcasted_iota(i32, (B, Np), 0)
    pcol = jax.lax.broadcasted_iota(i32, (B, Np), 1)
    lane = brow * C + (pcol * 2) // S
    flat0 = lane * wpad + wi
    flat_lo = jnp.where(valid, flat0, total)
    flat_hi = jnp.where(valid, flat0 + 1, total)
    win = jax.ops.segment_sum(
        jnp.where(valid, lo.astype(i32), 0).reshape(-1),
        flat_lo.reshape(-1), num_segments=total + 1,
        indices_are_sorted=sorted_flag,
    )
    win = win + jax.ops.segment_sum(
        jnp.where(valid, hi.astype(i32), 0).reshape(-1),
        flat_hi.reshape(-1), num_segments=total + 1,
        indices_are_sorted=sorted_flag,
    )
    return win[:total]


args = (jnp.asarray(v), jnp.asarray(nb), jnp.asarray(rel))
w_tpu_sorted = np.asarray(jax.jit(lambda a, b, c: pack(a, b, c, True))(*args))
stamp("TPU sorted pack done")
w_tpu_uns = np.asarray(jax.jit(lambda a, b, c: pack(a, b, c, False))(*args))
stamp("TPU unsorted pack done")
with jax.default_device(cpu):
    cargs = tuple(jax.device_put(np.asarray(a), cpu) for a in args)
    w_cpu = np.asarray(jax.jit(lambda a, b, c: pack(a, b, c, True))(*cargs))
stamp(f"pack equal: tpu_sorted==cpu {(w_tpu_sorted == w_cpu).all()} | "
      f"tpu_unsorted==cpu {(w_tpu_uns == w_cpu).all()}")
if not (w_tpu_sorted == w_cpu).all():
    badw = np.flatnonzero(w_tpu_sorted != w_cpu)
    stamp(f"  sorted-pack bad words: {badw.size} "
          f"first={badw[:5].tolist()} lanes={np.unique(badw // wpad)[:10].tolist()}")
