"""Multi-device scaling harness.

Runs the sharded codec step over meshes of 1..N devices with fixed
per-device work (weak scaling).  On this sandbox only one physical chip
exists, so the harness exercises the real sharding machinery on a virtual
CPU mesh (JAX_PLATFORMS=cpu with --xla_force_host_platform_device_count);
on a pod slice the same script measures true ICI/DCN scaling
(BASELINE.md's >=85% multi-host target).

What each reported number means (round-4 methodology):

* ``weak_scaling_efficiency_wall`` — raw wall-clock weak scaling.  On the
  virtual CPU mesh every "device" shares the host's cores, so this
  measures HOST SATURATION, not interconnect scaling; it is reported for
  continuity, not as the scaling claim.
* ``collective_overhead_efficiency`` — the simulation-honest measure:
  the same per-device program timed WITH its cross-chip collectives vs
  with them replaced by shard-local reductions (roundtrip_step_*'s
  ``collectives`` switch).  Host saturation hits both arms identically
  and cancels; what remains is exactly what scaling out costs this
  workload — the collectives.
* ``collective_payload_bytes`` — static accounting of the program's
  cross-device traffic.  The codec is stream-data-parallel by design
  (SURVEY.md P1): per step the ONLY collective payload is one i32
  verification scalar (psum over ``streams`` + pmean over ``seq``), so
  the compute:communication ratio at 1 MiB/stream is ~10^6:1 and the
  >=85% target is structural, not marginal.  (The seq-axis checksum
  reduction all-gathers 3 i32 per stream per chip — same class.)

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python bench/scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    import jax
    import jax.numpy as jnp

    from fdeflate_tpu.parallel.shard import (
        make_mesh,
        roundtrip_step_v2,
        roundtrip_step_zlib,
    )
    import bench as B

    total_devices = len(jax.devices())
    platform = jax.devices()[0].platform
    if platform == "cpu":
        print(json.dumps({
            "note": "virtual CPU mesh: all devices share the host's cores; "
                    "wall efficiency reflects host saturation.  The scaling "
                    "claim rests on collective_overhead_efficiency (same "
                    "saturated host in both arms) plus the static "
                    "collective_payload_bytes accounting — run on a pod "
                    "slice for true ICI/DCN numbers"
        }), flush=True)
    per_device_streams = int(os.environ.get("FDN_SCALING_STREAMS", "2"))
    N = int(os.environ.get("FDN_SCALING_N", str(1 << 20)))

    pipeline = os.environ.get("FDN_SCALING_PIPELINE", "v2")
    make_step = (roundtrip_step_zlib if pipeline == "zlib"
                 else roundtrip_step_v2)
    chunks = max(32, N >> 11)  # keep S within the kernel's VMEM bound

    reps = int(os.environ.get("FDN_SCALING_REPS", "7"))

    def timed(step, data):
        out = step(data)
        _ = int(np.asarray(out[2]))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = step(data)
            _ = int(np.asarray(r[2]))
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    results = {}
    base_time = None
    counts = [d for d in (1, 2, 4, 8, 16) if d <= total_devices]
    for nd in counts:
        mesh = make_mesh((nd, 1), devices=jax.devices()[:nd])
        Bt = per_device_streams * nd
        data = jnp.asarray(B.make_idat_corpus(Bt, N))

        step = make_step(mesh, chunks=chunks)
        t, out = timed(step, data)
        total = int(np.asarray(out[2]))
        assert total == Bt * N, (total, Bt * N)

        step_nc = make_step(mesh, chunks=chunks, collectives=False)
        t_nc, _ = timed(step_nc, data)

        # Direct measurement of the step's entire cross-device traffic:
        # ONE i32 psum+pmean under the same mesh.  Far more robust than
        # subtracting two ~0.2 s saturated-host walls to find a us-scale
        # collective; in-program reps amortize dispatch.
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        CR = 64

        def coll_only(x):
            def body(k, acc):
                # pmean promotes int32 -> float32; cast back for the carry.
                return acc + jax.lax.pmean(
                    jax.lax.psum(x[0] + k + acc, "streams"),
                    "seq").astype(jnp.int32)

            return jax.lax.fori_loop(0, CR, body, jnp.int32(0))

        coll = jax.jit(shard_map(
            coll_only, mesh=mesh, in_specs=P("streams"), out_specs=P(),
            check_rep=False))
        xs = jnp.arange(nd, dtype=jnp.int32)
        _ = int(np.asarray(coll(xs)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = int(np.asarray(coll(xs)))
            ts.append(time.perf_counter() - t0)
        t_coll = min(ts) / CR

        if base_time is None:
            base_time = t
        results[nd] = {
            "devices": nd,
            "streams": Bt,
            "seconds": round(t, 4),
            "gbps": round(Bt * N / t / 1e9, 4),
            "weak_scaling_efficiency_wall": round(base_time / t, 3),
            "collective_overhead_efficiency": round(min(t_nc / t, 1.0), 3),
            "collective_seconds": round(t_coll, 6),
            "efficiency_from_collective_cost": round(t / (t + t_coll), 4),
            "collective_payload_bytes": 4,  # one psum+pmean i32 per step
        }
        print(json.dumps(results[nd]), flush=True)


if __name__ == "__main__":
    main()
