"""Hardware repro + fix probe for the pack_blocked_pallas_v2 VMEM OOM.

First real-hardware compile of the v2 pack kernel (bench geometry B=16,
N=1 MiB, C=512 -> LB=8, S=2048, wwin=840) died with

    Scoped allocation with size 22.56M and limit 16.00M exceeded scoped
    vmem limit ... allocating on stack for %_lambda_.1 = s32[8,840,8,128]

i.e. XLA tried to place the custom call's FULL result (not the per-grid
block) in scoped VMEM.  This probe times three candidate fixes:

  a) as-is, no compiler params (FDN_PACK_VMEM=none; expected OOM)
  b) pltpu.CompilerParams(vmem_limit_bytes=...)

Run on hardware: python bench/probe_packoom.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)


def main():
    import jax
    import jax.numpy as jnp

    from probe_decode2 import make_idat
    from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_blocked

    B, N, C = 16, 1 << 20, 512
    data = jnp.asarray(make_idat(B, N))
    lengths = jnp.full((B,), N, jnp.int32)

    for mode in (m.strip() for m in
                 os.environ.get("PACK_MODES", "a,b").split(",")):
        os.environ["FDN_PACK_VMEM"] = (
            "134217728" if mode == "b" else "none"
        )
        enc = jax.jit(lambda d, ln: encode_ultrafast_blocked(d, ln, C))
        try:
            t0 = time.perf_counter()
            win, bits, adler = jax.block_until_ready(enc(data, lengths))
            print(f"mode {mode}: compile+run {time.perf_counter()-t0:.1f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"mode {mode}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            jax.clear_caches()
            continue
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(enc(data, lengths))
            ts.append(time.perf_counter() - t0)
        gbps = B * N / min(ts) / 1e9
        print(f"mode {mode}: warm {min(ts)*1e3:.1f} ms  {gbps:.3f} GB/s",
              flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
