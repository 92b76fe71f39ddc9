"""Debug the S=2048 fused-verify failure (6/16 streams) on hardware.

Stages (timestamped): encode -> kernel decode -> host compare per chunk ->
numpy-oracle decode of failing chunks (splits encoder vs kernel blame).
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

from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_blocked
from fdeflate_tpu.ops.pallas_decode2 import decode_blocked, decode_chunk_np
sys.path.insert(0, "/root/repo/bench")
from probe_decode2 import make_idat

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


B = int(os.environ.get("DBG_B", "16"))
N = int(os.environ.get("DBG_N", str(1 << 20)))
C = int(os.environ.get("DBG_C", "512"))
U = int(os.environ.get("DBG_U", "32"))
INTERP = os.environ.get("DBG_INTERP", "0") == "1"
S = N // C

stamp(f"backend={jax.default_backend()} B={B} N={N} C={C} S={S} U={U} "
      f"interp={INTERP}")

data = make_idat(B, N)
lengths = jnp.asarray(np.full(B, N, np.int32))
enc = jax.jit(lambda d, ln: encode_ultrafast_blocked(d, ln, C))
win, chunk_bits, adler = enc(jnp.asarray(data), lengths)
win = jax.block_until_ready(win)
stamp(f"encode done win{tuple(win.shape)}")

dec = jax.jit(lambda w: decode_blocked(w, T=S // 4, U=U, interpret=INTERP,
                                       lane_major=False))
out_sm, bpos = dec(win)
out_sm = jax.block_until_ready(out_sm)
stamp("decode done")

out = np.asarray(out_sm)                      # [LB, T, 8, 128]
L = B * C
lanes = np.ascontiguousarray(
    np.transpose(out, (0, 2, 3, 1)).reshape(-1, S // 4)[:L]
)
decoded = lanes.astype("<i4").view(np.uint8).reshape(B, C, S)
ref = data.reshape(B, C, S)
bad = ~(decoded == ref).all(axis=2)           # [B, C] chunk mismatch map
bp = np.asarray(bpos).reshape(-1)[:L].reshape(B, C)
cb = np.asarray(chunk_bits)
bad_bp = bp != cb
stamp(f"byte-bad chunks: {int(bad.sum())}/{bad.size}; "
      f"bpos-bad: {int(bad_bp.sum())}")
per_stream = bad.any(axis=1) | bad_bp.any(axis=1)
stamp(f"bad streams: {np.flatnonzero(per_stream).tolist()}")

win_np = np.asarray(win)                      # [LB, wwin, 8, 128]
wwin = win_np.shape[1]


def lane_words(lane):
    lb, r = divmod(lane, 1024)
    sl, ln = divmod(r, 128)
    return win_np[lb, :, sl, ln]


bad_idx = np.argwhere(bad | bad_bp)
for b, c in bad_idx[:8]:
    lane = b * C + c
    words = lane_words(lane)
    try:
        oracle, obits = decode_chunk_np(words, S)
        o_bytes_ok = bool((oracle == ref[b, c]).all())
        o_bits_ok = int(obits) == int(cb[b, c])
        msg = f"oracle bytes_ok={o_bytes_ok} bits {obits} vs enc {cb[b, c]}"
    except Exception as e:  # noqa: BLE001
        msg = f"oracle raised: {e}"
    nb_bad = int((decoded[b, c] != ref[b, c]).sum())
    first_bad = int(np.argmax(decoded[b, c] != ref[b, c])) if nb_bad else -1
    stamp(f"  chunk ({b},{c}): kernel bad_bytes={nb_bad} first={first_bad} "
          f"bpos {bp[b, c]} vs {cb[b, c]} | {msg}")

# distribution of chunk_bits for failing vs passing chunks
stamp(f"chunk_bits: min={cb.min()} max={cb.max()} "
      f"bad_max={cb[bad | bad_bp].max() if (bad | bad_bp).any() else -1} "
      f"good_min={cb[~(bad | bad_bp)].min()}")
stamp(f"wwin={wwin} capacity_bits={wwin * 32}")
