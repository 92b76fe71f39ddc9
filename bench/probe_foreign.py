"""Stage breakdown of the foreign-stream decode pipeline on hardware.

Splits try_foreign(engine="pallas") into its stages and times each:
  host:   boundary scan (numpy), header parse + canonical meta build
  device: window gather + record kernel, record unpack + stitch checks,
          materialize, on-device Adler-32

Run: python bench/probe_foreign.py [raw_mb]   (default 16)
"""

from __future__ import annotations

import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    raw_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    import jax
    import jax.numpy as jnp

    from fdeflate_tpu.ops import inflate as I
    from fdeflate_tpu.parallel import discovery as D

    rng = np.random.default_rng(9)
    wp = [rng.bytes(int(rng.integers(3, 12))) for _ in range(256)]
    data = b"".join(
        wp[int(rng.integers(256))] for _ in range((raw_mb << 20) // 7)
    )[: raw_mb << 20]
    z = zlib.compress(data, 6)
    print(f"{len(data)} raw -> {len(z)} compressed", flush=True)

    t0 = time.perf_counter()
    offsets, hdr_ends = D.find_block_boundaries(z)
    t_scan = time.perf_counter() - t0
    print(f"host boundary scan: {t_scan*1e3:7.1f} ms "
          f"({len(offsets)} candidates)", flush=True)

    t0 = time.perf_counter()
    lanes = []
    for off in offsets.tolist():
        r = I._HostBitReader(z, off)
        bfinal = r.take(1)
        if r.take(2) != 0b10:
            continue
        try:
            lengths, hlit = I._parse_dynamic_lengths(r)
        except Exception:  # noqa: BLE001
            continue
        lanes.append((off, bool(bfinal), r.pos, lengths, hlit))
    t_parse = time.perf_counter() - t0
    print(f"host header parse:  {t_parse*1e3:7.1f} ms "
          f"({len(lanes)} lanes)", flush=True)

    words_dev = D.stage_words(z)
    words_dev = jax.block_until_ready(words_dev)

    # First full run = compile; then warm total.
    t0 = time.perf_counter()
    rd = D.try_foreign(z, engine="pallas", words_dev=words_dev,
                       return_device=True)
    t_first = time.perf_counter() - t0
    ok = rd is not None
    print(f"first run (compile): {t_first:7.2f} s  ok={ok}", flush=True)
    if not ok:
        return

    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        rd = D.try_foreign(z, engine="pallas", words_dev=words_dev,
                           return_device=True)
        ts.append(time.perf_counter() - t0)
    t_total = min(ts)
    print(f"warm total: {t_total*1e3:7.1f} ms  "
          f"{len(data)/t_total/1e9:.3f} GB/s", flush=True)

    # Stage: lane decode (kernel + unpack) alone.
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        records, bpos_np, eob_np = D._pallas_lane_decode(
            z, lanes, 6144, words_dev=words_dev)
        _ = jax.block_until_ready(records[0])
        ts.append(time.perf_counter() - t0)
    t_sym = min(ts)
    print(f"symbol phase (kernel+unpack+readback): {t_sym*1e3:7.1f} ms",
          flush=True)

    # Stage: materialize alone on the decoded records.
    L = len(lanes)
    K = records[0].shape[0]
    rl, rlh, rc, rn, rd_ = records

    def rearrange(a):
        return a.T.reshape(L * K, 1)

    rl2, rlh2, rc2, rn2, rd2 = map(rearrange, (rl, rlh, rc, rn, rd_))
    adv = rc2.astype(jnp.int32) + rn2
    produced = int(np.asarray(jnp.sum(adv)))
    cap = 1 << int(np.ceil(np.log2(max(produced, 256))))
    recs_dev = tuple(jax.block_until_ready(x)
                     for x in (rl2, rlh2, rc2, rn2, rd2))
    mat = I._jit_materialize(cap)
    win0 = jnp.zeros((1, I.WINDOW), jnp.uint8)
    pr = jnp.asarray([produced], jnp.int32)
    out, _ = mat(recs_dev, win0, pr)
    _ = jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, _ = mat(recs_dev, win0, pr)
        _ = jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    t_mat = min(ts)
    print(f"materialize ({produced} B, cap {cap}): {t_mat*1e3:7.1f} ms  "
          f"{produced/t_mat/1e9:.3f} GB/s", flush=True)

    from fdeflate_tpu.ops.adler32 import adler32_jax

    aj = jax.jit(lambda o, n: adler32_jax(o[0], length=n))
    _ = int(np.asarray(aj(out, jnp.int32(produced))))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(np.asarray(aj(out, jnp.int32(produced))))
        ts.append(time.perf_counter() - t0)
    print(f"device adler32: {min(ts)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
