"""Profiler cross-check of the marginal-timing methodology (VERDICT r3 #4).

The bench's headline rates are MARGINAL: leg cost = (t_R - t_1)/(R - 1)
with R in-program reps, justified by the measured ~25-32 ms tunnel
dispatch floor.  This probe closes the loop with two independent checks
on the decode leg:

1. **Profiler device-time.**  Runs the R-rep decode program under
   jax.profiler.trace with a perfetto trace and sums the device-track
   event durations; device_time/R should agree with the marginal rate.
   (If the axon platform cannot produce a trace, that is recorded.)
2. **Rep-count linearity.**  Wall times at R in {1, 2, 4, 8, 16} fit
   t(R) = floor + R * slope; the fit's slope must agree with the
   two-point marginal and the residuals stay within floor jitter —
   i.e. the marginal is measuring a per-rep device cost, not an artifact
   of one R choice.

Run: python bench/probe_devicetime.py
"""

from __future__ import annotations

import glob
import gzip
import json
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

from fdeflate_tpu.ops.repack import stage_wwin
from fdeflate_tpu.parallel.device_pipeline import (
    zlib_decode_step,
    zlib_encode_step,
)

T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


def device_time_from_perfetto(tracedir: str) -> float | None:
    """Device busy time (seconds) from a perfetto trace.

    Slices on the device tracks NEST (a program slice contains its
    kernels' slices) and several tracks can run concurrently, so a naive
    duration sum double-counts — the first run of this probe measured a
    'device time' of 136 ms against a 70 ms wall for the same program.
    The honest scalar is the measure of the UNION of all device-slice
    intervals: merge [ts, ts+dur) across every device track, sum the
    merged lengths."""
    paths = glob.glob(os.path.join(tracedir, "**", "*.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Identify device process ids by metadata name.
    dev_pids = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "args" in e):
            name = str(e["args"].get("name", "")).lower()
            if any(k in name for k in ("tpu", "device", "axon", "/device:")):
                dev_pids.add(e.get("pid"))
    ivals = []
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            t0 = float(e.get("ts", 0.0))
            ivals.append((t0, t0 + float(e.get("dur", 0.0))))
    stamp(f"  perfetto: {len(paths)} trace(s), {len(ivals)} device slices "
          f"from pids {sorted(dev_pids)}")
    if not ivals:
        return None
    ivals.sort()
    busy = 0.0
    cur_s, cur_e = ivals[0]
    for s, e in ivals[1:]:
        if s > cur_e:
            busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    busy += cur_e - cur_s
    return busy / 1e6


def main():
    B = int(os.environ.get("PB_B", "16"))
    N = int(os.environ.get("PB_N", str(1 << 20)))
    C = int(os.environ.get("PB_C", "512"))
    S = N // C

    import importlib.util as _u

    spec = _u.spec_from_file_location("benchmod", "/root/repo/bench.py")
    bm = _u.module_from_spec(spec)
    spec.loader.exec_module(bm)
    data = bm.make_idat_corpus(B, N)
    d = jax.device_put(jnp.asarray(data))
    lengths = jax.device_put(jnp.asarray(np.full(B, N, np.int32)))
    stamp(f"backend={jax.default_backend()} B={B} N={N} C={C}")

    enc = jax.jit(zlib_encode_step(C))
    words, bits, adler, starts, eof = (
        jax.block_until_ready(x) for x in enc(d, lengths))
    max_bits = int(np.asarray(jnp.max(jnp.diff(jnp.concatenate(
        [starts, eof[:, None]], axis=1)))))
    wwin = min(stage_wwin(S),
               stage_wwin(S, cap_bits_per_byte=max_bits / S + 0.26))
    dec = zlib_decode_step(C, N, wwin, U=32, R=4)

    def make(r):
        @jax.jit
        def g(words, starts, eof, adler, lengths):
            def body(k, acc):
                w2 = words.at[0, -1].add(acc & 1)
                out_sm, b_ok, c_ok = dec(w2, starts, eof, adler, lengths)
                return acc + jnp.sum(b_ok.astype(jnp.int32)) + jnp.sum(
                    c_ok.astype(jnp.int32))

            return jax.lax.fori_loop(0, r, body, jnp.int32(0))

        return g

    args = (words, starts, eof, adler, lengths)

    def wall(f, reps=3):
        _ = int(np.asarray(f(*args)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = int(np.asarray(f(*args)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # --- check 2: linearity across R -----------------------------------
    Rs = [1, 2, 4, 8, 16]
    ts = []
    for r in Rs:
        t = wall(make(r))
        ts.append(t)
        stamp(f"  R={r:2d}: wall {t*1e3:7.2f} ms")
    A = np.vstack([np.ones(len(Rs)), np.asarray(Rs, float)]).T
    (floor_fit, slope), res, *_ = np.linalg.lstsq(A, np.asarray(ts),
                                                  rcond=None)
    marg2pt = (ts[-1] - ts[0]) / (Rs[-1] - Rs[0])
    resid = np.asarray(ts) - A @ np.array([floor_fit, slope])
    stamp(f"linear fit: floor {floor_fit*1e3:.2f} ms  slope "
          f"{slope*1e3:.3f} ms/rep ({B*N/slope/1e9:.2f} GB/s); "
          f"2-point marginal {marg2pt*1e3:.3f} ms/rep "
          f"({B*N/marg2pt/1e9:.2f} GB/s); max residual "
          f"{np.abs(resid).max()*1e3:.2f} ms")

    # --- check 1: profiler device time over the R=8 program -------------
    tracedir = "/tmp/fdn_trace"
    os.system(f"rm -rf {tracedir}")
    f8 = make(8)
    _ = int(np.asarray(f8(*args)))  # compile outside the trace
    try:
        with jax.profiler.trace(tracedir, create_perfetto_trace=True):
            _ = int(np.asarray(f8(*args)))
        dt = device_time_from_perfetto(tracedir)
        if dt is None:
            stamp("profiler: no parseable device trace on this platform")
        else:
            stamp(f"profiler device time for R=8 program: {dt*1e3:.2f} ms "
                  f"-> {dt/8*1e3:.3f} ms/rep ({B*N/(dt/8)/1e9:.2f} GB/s)")
    except Exception as e:
        stamp(f"profiler unavailable: {e!r}")


if __name__ == "__main__":
    main()
