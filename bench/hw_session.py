"""Hardware measurement session for the post-broadcast-fix decode kernel.

Polls for TPU availability (the axon tunnel drops occasionally), then runs:
  1. decode_blocked R/U sweep at the bench operating point
  2. probe_vpu bcast calibration (scalar-broadcast cost confirmation)

Run: python bench/hw_session.py   (prints results; safe to re-run)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def wait_for_tpu(max_wait_s: float = 86400.0) -> bool:
    """Poll until jax sees a TPU.  Each probe runs in a subprocess so a
    hung backend init can't wedge this process."""
    import subprocess

    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert jax.devices()[0].platform != 'cpu'"],
                capture_output=True, timeout=120,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass  # backend init hung: tunnel still down
        print(f"[hw_session] tpu not up ({time.time()-t0:.0f}s)", flush=True)
        time.sleep(60)
    return False


def sweep():
    import jax
    import jax.numpy as jnp

    from probe_decode2 import make_idat
    from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_blocked
    from fdeflate_tpu.ops.pallas_decode2 import decode_blocked

    B, N, C = 16, 1 << 20, 512
    S = N // C
    data = make_idat(B, N)
    lengths = jnp.asarray(np.full(B, N, np.int32))
    enc = jax.jit(lambda d, ln: encode_ultrafast_blocked(d, ln, C))
    win, chunk_bits, _ = enc(jnp.asarray(data), lengths)
    win = jax.block_until_ready(win)
    cb = np.asarray(chunk_bits)

    cfgs = [tuple(int(v) for v in c.split(":")) for c in os.environ.get(
        "HW_SWEEP", "32:1,32:4,32:8,128:8").split(",")]
    for U, R in cfgs:
        @jax.jit
        def dec(w, U=U, R=R):
            out_sm, bpos = decode_blocked(w, T=S // 4, U=U,
                                          lane_major=False, R=R)
            return jnp.sum(out_sm), bpos

        try:
            t0 = time.perf_counter()
            r = dec(win)
            bp = np.asarray(r[1])
            print(f"U={U} R={R}: compile+run {time.perf_counter()-t0:.0f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"U={U} R={R}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        ok = bool((bp.reshape(-1)[: B * C].reshape(B, C) == cb).all())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = dec(win)
            _ = int(np.asarray(r[0]))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"U={U} R={R}: {t*1e3:6.1f} ms  {B*N/t/1e9:.3f} GB/s  ok={ok}",
              flush=True)


def enc_sweep():
    """Blocked-encoder throughput by chunk count: above S=630 the Pallas
    pack kernel can't engage (token bit-packing range) and the XLA scatter
    packs instead — quantify what the bench loses at its C=512 default."""
    import jax
    import jax.numpy as jnp

    from probe_decode2 import make_idat
    from fdeflate_tpu.ops.ultrafast_kernel import encode_ultrafast_blocked
    from fdeflate_tpu.ops.pallas_decode2 import decode_blocked

    B, N = 16, 1 << 20
    data = make_idat(B, N)
    lengths = jnp.asarray(np.full(B, N, np.int32))
    d = jax.device_put(jnp.asarray(data))

    for C in (512, 1024, 2048, 4096):
        S = N // C

        @jax.jit
        def enc(dd, ln, C=C):
            win, bits, adler = encode_ultrafast_blocked(dd, ln, C)
            return jnp.sum(win), jnp.sum(bits) + jnp.sum(
                adler.astype(jnp.int32))

        try:
            r = enc(d, lengths)
            _ = int(np.asarray(r[0]))
        except Exception as e:  # noqa: BLE001
            print(f"enc C={C}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = enc(d, lengths)
            _ = int(np.asarray(r[0]))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"enc C={C} (S={S}): {t*1e3:6.1f} ms  {B*N/t/1e9:.3f} GB/s",
              flush=True)

        # decode at the same C, auto U/R
        from fdeflate_tpu.ops.ultrafast_kernel import (
            encode_ultrafast_blocked as _e,
        )
        win, chunk_bits, _a = jax.jit(
            lambda dd, ln, C=C: _e(dd, ln, C))(d, lengths)
        win = jax.block_until_ready(win)
        cb = np.asarray(chunk_bits)

        @jax.jit
        def dec(w, S=S):
            out_sm, bpos = decode_blocked(w, T=S // 4, U=32,
                                          lane_major=False)
            return jnp.sum(out_sm), bpos

        try:
            r = dec(win)
            bp = np.asarray(r[1])
        except Exception as e:  # noqa: BLE001
            print(f"dec C={C}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        ok = bool((bp.reshape(-1)[: B * C].reshape(B, C) == cb).all())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = dec(win)
            _ = int(np.asarray(r[0]))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"dec C={C} (S={S}): {t*1e3:6.1f} ms  {B*N/t/1e9:.3f} GB/s"
              f"  ok={ok}", flush=True)


def foreign_sweep():
    """Foreign (un-indexed) multi-block zlib decode: the Pallas record
    kernel engine vs the XLA decode_symbols engine vs host zlib."""
    import time
    import zlib

    import numpy as np

    from fdeflate_tpu.parallel import discovery as D

    rng = np.random.default_rng(9)
    wp = [rng.bytes(int(rng.integers(3, 12))) for _ in range(256)]
    data = b"".join(wp[int(rng.integers(256))] for _ in range(2_400_000))
    data = data[: 16 << 20]
    z = zlib.compress(data, 6)
    offs, _ = D.find_block_boundaries(z)
    print(f"foreign: {len(data)} raw, {len(z)} compressed, "
          f"{len(offs)} candidate headers", flush=True)

    t0 = time.perf_counter()
    ref = zlib.decompress(z)
    t_z = time.perf_counter() - t0
    print(f"zlib host: {t_z*1e3:.0f} ms  {len(data)/t_z/1e9:.3f} GB/s",
          flush=True)

    for engine in ("pallas", "xla"):
        try:
            t0 = time.perf_counter()
            r = D.try_foreign(z, engine=engine)
            t = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"foreign {engine}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            continue
        ok = r == ref if r is not None else None
        print(f"foreign {engine}: {t*1e3:6.0f} ms "
              f"{len(data)/t/1e9:.3f} GB/s  exact={ok}", flush=True)
        if r is not None and ok:
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = D.try_foreign(z, engine=engine)
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            print(f"foreign {engine} warm: {t*1e3:6.0f} ms "
                  f"{len(data)/t/1e9:.3f} GB/s", flush=True)
            if engine == "pallas":
                words_dev = D.stage_words(z)
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    rd = D.try_foreign(z, engine=engine,
                                       words_dev=words_dev,
                                       return_device=True)
                    assert rd is not None
                    ts.append(time.perf_counter() - t0)
                t = min(ts)
                print(f"foreign {engine} device-resident: {t*1e3:6.0f} ms "
                      f"{len(data)/t/1e9:.3f} GB/s", flush=True)
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    rh = D.try_foreign(z, engine=engine,
                                       words_dev=words_dev,
                                       materialize="host")
                    ts.append(time.perf_counter() - t0)
                t = min(ts)
                print(f"foreign {engine} host-materialize: {t*1e3:6.0f} ms "
                      f"{len(data)/t/1e9:.3f} GB/s  exact={rh == ref}",
                      flush=True)


def batch_sweep():
    """Batched foreign decode: 8 x 2 MiB streams in shared launches vs
    per-stream try_foreign (lane-utilization measurement)."""
    import time
    import zlib

    import numpy as np

    from fdeflate_tpu.parallel import discovery as D

    rng = np.random.default_rng(11)
    wp = [rng.bytes(int(rng.integers(3, 12))) for _ in range(256)]
    datas = []
    for s in range(8):
        r = np.random.default_rng(100 + s)
        datas.append(b"".join(
            wp[int(r.integers(256))] for _ in range(310000))[: 2 << 20])
    streams = [zlib.compress(d, 6) for d in datas]
    total = sum(len(d) for d in datas)

    t0 = time.perf_counter()
    res = D.try_foreign_batch(streams, engine="pallas")
    t_first = time.perf_counter() - t0
    ok = all(r == d for r, d in zip(res, datas))
    print(f"batch first: {t_first:6.2f} s  ok={ok}", flush=True)
    if not ok:
        print("batch results:", [r is not None for r in res], flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = D.try_foreign_batch(streams, engine="pallas")
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"batch warm: {t*1e3:6.0f} ms  {total/t/1e9:.3f} GB/s "
          f"(8 x 2 MiB)", flush=True)

    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        res2 = [D.try_foreign(z, engine="pallas") for z in streams]
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    ok2 = all(r == d for r, d in zip(res2, datas))
    print(f"per-stream:  {t*1e3:6.0f} ms  {total/t/1e9:.3f} GB/s  ok={ok2}",
          flush=True)


def main():
    if not wait_for_tpu():
        print("[hw_session] gave up waiting for TPU", flush=True)
        return
    print("[hw_session] TPU is up", flush=True)
    # HW_STAGES selects in-process stages by name (comma list); default all.
    # Lets a re-run after a mid-session failure skip already-measured stages.
    known = {"foreign_sweep", "batch_sweep", "sweep", "enc_sweep",
             "probe_foreign", "probe_ablate", "probe_vpu", "bench"}
    stages = {s.strip() for s in os.environ.get(
        "HW_STAGES", ",".join(sorted(known))).split(",")}
    for s in stages - known:
        print(f"[hw_session] unknown stage name {s!r} ignored "
              f"(known: {sorted(known)})", flush=True)
    for stage in (foreign_sweep, batch_sweep, sweep, enc_sweep):
        if stage.__name__ not in stages:
            continue
        try:
            stage()
        except Exception as e:  # noqa: BLE001
            print(f"[hw_session] {stage.__name__} FAIL {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    for desc, args, tmo in (
        ("probe_foreign", [sys.executable,
                           os.path.join(here, "probe_foreign.py")], 1800),
        ("probe_ablate", [sys.executable, os.path.join(here, "probe_ablate.py"),
                          "full", "static", "fixedbounds", "noscan", "twosub"], 1800),
        ("probe_vpu", [sys.executable, os.path.join(here, "probe_vpu.py"),
                       "bcast"], 900),
        ("bench", [sys.executable, os.path.join(root, "bench.py")], 1800),
    ):
        if desc not in stages:
            continue
        print(f"[hw_session] === {desc} ===", flush=True)
        try:
            r = subprocess.run(args, capture_output=True, text=True,
                               timeout=tmo, cwd=root)
            print(r.stdout, flush=True)
            if r.returncode != 0:
                print(f"[hw_session] {desc} rc={r.returncode}:\n"
                      + r.stderr[-2000:], flush=True)
        except subprocess.TimeoutExpired:
            print(f"[hw_session] {desc} timed out", flush=True)


if __name__ == "__main__":
    main()
