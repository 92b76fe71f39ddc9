"""Benchmark: PNG-IDAT-corpus encode+decode throughput per chip.

Measures the device batch codec on a synthetic filtered-PNG-IDAT corpus
(zero-heavy byte streams with small residuals — the reference's target
workload) and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": R}

vs_baseline compares against single-core zlib (C implementation) measured on
this host: the reference (image-rs/fdeflate, Rust) claims parity with
zlib-ng, and no Rust toolchain exists in this image to measure it directly
(BASELINE.md), so zlib level 1 encode + decode is the stand-in baseline for
the same corpus.

Timing notes: device arrays are materialized to host scalars to defeat async
dispatch; input data is device-resident (matching the reference's in-memory
loops).
"""

from __future__ import annotations

import json
import os
import sys
import time
import zlib

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    # The environment's sitecustomize may import jax before this script runs,
    # which makes the env var alone insufficient — force it via the config.
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def make_idat_corpus(batch: int, length: int, seed: int = 0) -> np.ndarray:
    """Filtered-PNG IDAT-like bytes.

    Synthesizes grayscale image rows (smooth gradients + texture noise +
    flat regions) and applies the PNG Sub filter per row — producing the
    real workload shape: long zero runs from flat areas and small signed
    residuals elsewhere.
    """
    rng = np.random.default_rng(seed)
    width = 1024
    rows = length // width + 1
    out = np.zeros((batch, rows * width), np.uint8)
    for b in range(batch):
        y = np.arange(rows)[:, None]
        x = np.arange(width)[None, :]
        base = (
            128
            + 60 * np.sin(x / (50 + 10 * (b % 7)) + b)
            + 40 * np.cos(y / 37.0)
        )
        noise = rng.normal(0, 2.0, (rows, width))
        flat = (x // 128 + y // 16) % 3 == 0  # flat patches -> zero runs
        img = np.where(flat, 200, base + noise).astype(np.uint8)
        # PNG Sub filter: residual against the left neighbor.
        sub = img - np.roll(img, 1, axis=1)
        sub[:, 0] = img[:, 0]
        out[b] = sub.reshape(-1)[: rows * width]
    return out[:, :length]


def bench_zlib_baseline(data: np.ndarray, repeats: int = 2) -> tuple[float, float]:
    """Single-core zlib level-1 encode and decode GB/s on the corpus."""
    rows = [row.tobytes() for row in data]
    comp = [zlib.compress(r, 1) for r in rows]
    total = data.size

    enc_times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for r in rows:
            zlib.compress(r, 1)
        enc_times.append(time.perf_counter() - t0)

    dec_times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for c in comp:
            zlib.decompress(c)
        dec_times.append(time.perf_counter() - t0)

    return total / min(enc_times) / 1e9, total / min(dec_times) / 1e9


def bench_device(
    data: np.ndarray, repeats: int = 3
) -> tuple[float, float, float]:
    """Device codec GB/s: fused encode -> Pallas decode -> checksum verify.

    Returns (encode, decode, zlib_stream_encode): ``encode`` is the
    production (blocked) encoder of the verified pipeline;
    ``zlib_stream_encode`` is the linear encoder that emits standard zlib
    bytes, reported in detail.

    The whole pipeline is one XLA program; only scalars read back (this
    sandbox's host<->device link is ~20 MB/s, so any benchmark that moves
    payloads per call would measure the tunnel, not the chip).

    Decode engine: the v2 fixed-geometry canonical-Huffman Pallas kernel
    (ops/pallas_decode2) by default; ``FDN_BENCH_PIPELINE=v1`` selects the
    round-1 XLA lane decoder for comparison.  Decode time is the verified
    fused roundtrip minus the separately-timed encode stage.
    """
    import jax
    import jax.numpy as jnp

    from fdeflate_tpu.ops.ultrafast_kernel import (
        encode_ultrafast_batch,
        encode_ultrafast_blocked,
    )

    B, N = data.shape
    d = jax.device_put(jnp.asarray(data))
    lengths = jax.device_put(jnp.asarray(np.full(B, N, np.int32)))

    @jax.jit
    def enc_scalar(d, lengths):
        w, bits, adler = encode_ultrafast_batch(d, lengths)
        return jnp.sum(bits) + jnp.sum(adler.astype(jnp.int32))

    _ = float(np.asarray(enc_scalar(d, lengths)))  # compile+sync
    enc_times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(np.asarray(enc_scalar(d, lengths)))
        enc_times.append(time.perf_counter() - t0)
    enc_gbps = data.size / min(enc_times) / 1e9

    pipeline = os.environ.get("FDN_BENCH_PIPELINE", "v2")
    # v2's kernel holds a lane-block's output (8*128*S bytes) in VMEM, so
    # chunks must keep S = N/C <= 2896; C=512 -> S=2048 at the 1 MiB default.
    chunks = int(
        os.environ.get("FDN_BENCH_CHUNKS", "512" if pipeline == "v2" else "256")
    )
    if pipeline == "v2":
        from fdeflate_tpu.parallel.device_pipeline import (
            fused_ultrafast_roundtrip_v2,
        )

        # Time the blocked encoder alone so its cost can be subtracted
        # from the fused roundtrip (the v2 decode consumes its layout).
        @jax.jit
        def benc_scalar(d, lengths):
            win, bits, adler = encode_ultrafast_blocked(d, lengths, chunks)
            return jnp.sum(bits) + jnp.sum(adler.astype(jnp.int32))

        _ = float(np.asarray(benc_scalar(d, lengths)))
        benc_times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            _ = float(np.asarray(benc_scalar(d, lengths)))
            benc_times.append(time.perf_counter() - t0)
        t_enc_stage = min(benc_times)

        # R=4 won the hardware U:R sweep (0.615 GB/s vs 0.547 at R=1 and
        # 0.562 at R=8, 16 MiB IDAT, v5e) once the kernel declared its VMEM
        # budget; LB=8 at the default geometry so R=4 divides evenly.
        step = fused_ultrafast_roundtrip_v2(
            chunks, N=N, U=int(os.environ.get("FDN_BENCH_U", "32")),
            R=int(os.environ.get("FDN_BENCH_R", "4")),
        )

        @jax.jit
        def fused_scalar(d, lengths):
            out_sm, bpos_ok, ck_ok = step(d, lengths)
            return (
                jnp.sum(bpos_ok.astype(jnp.int32)),
                jnp.sum(ck_ok.astype(jnp.int32)),
            )

        ok, ck = (int(np.asarray(x)) for x in fused_scalar(d, lengths))
        # The headline encode leg is the PRODUCTION encoder of the verified
        # pipeline (blocked layout + chunk index, consumed bit-exactly by
        # the decode leg).  The linear zlib-stream encoder is timed above
        # (enc_gbps) and reported separately in detail.
        blk_enc_gbps = data.size / t_enc_stage / 1e9
        if ok != B or ck != B:
            return blk_enc_gbps, 0.0, enc_gbps  # decode unverified: omit
    else:
        from fdeflate_tpu.parallel.device_pipeline import (
            fused_ultrafast_roundtrip,
        )

        # Step budget sized for the corpus (measured max lane steps ~410 at
        # C=256); a pathological lane flips ok=False and the device decode
        # number is simply omitted (encode still reports).
        max_steps = int(os.environ.get("FDN_BENCH_STEPS", "768"))
        stepv1 = fused_ultrafast_roundtrip(
            chunks, max_steps=max_steps, N=N,
            ptr_rounds=int(os.environ.get("FDN_BENCH_PTR_ROUNDS", "2")),
        )
        t_enc_stage = min(enc_times)

        @jax.jit
        def fused_scalar(d, lengths):
            out, produced, ok, ck_ok = stepv1(d, lengths)
            return (
                jnp.sum(produced),
                jnp.sum(ok.astype(jnp.int32)),
                jnp.sum(ck_ok.astype(jnp.int32)),
            )

        produced, ok, ck = (
            int(np.asarray(x)) for x in fused_scalar(d, lengths)
        )
        blk_enc_gbps = enc_gbps
        if produced != data.size or ok != B or ck != B:
            return enc_gbps, 0.0, enc_gbps  # decode unverified: omit

    rt_times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = fused_scalar(d, lengths)
        _ = int(np.asarray(r[0]))
        rt_times.append(time.perf_counter() - t0)
    rt = min(rt_times)
    # Decode time = fused roundtrip minus the encode stage.
    dec_time = max(rt - t_enc_stage, rt * 0.05)
    dec_gbps = data.size / dec_time / 1e9

    return blk_enc_gbps, dec_gbps, enc_gbps


def bench_native(data: np.ndarray, repeats: int = 3) -> tuple[float, float]:
    """Native C++ host codec GB/s (fallback when no device is reachable)."""
    from fdeflate_tpu.models import native

    rows = [row.tobytes() for row in data]
    comp = [native.compress_ultra(r) for r in rows]
    total = data.size

    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for r in rows:
            native.compress_ultra(r)
        ts.append(time.perf_counter() - t0)
    enc = total / min(ts) / 1e9

    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for c, r in zip(comp, rows):
            native.inflate(c, size_hint=len(r) + 64)
        ts.append(time.perf_counter() - t0)
    dec = total / min(ts) / 1e9
    return enc, dec


def _device_worker(batch: int, length: int, q) -> None:
    try:
        data = make_idat_corpus(batch, length)
        q.put(("ok", bench_device(data)))
    except Exception as e:  # pragma: no cover
        q.put(("err", repr(e)))


def run_device_guarded(
    batch: int,
    length: int,
    timeout_s: float = float(os.environ.get("FDN_BENCH_TIMEOUT", "600")),
):
    """Run the device benchmark in a subprocess with a hard timeout so a
    wedged accelerator tunnel cannot hang the whole benchmark."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_device_worker, args=(batch, length, q))
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.terminate()
        p.join(10)
        return None, "device benchmark timed out (accelerator unreachable)"
    if not q.empty():
        kind, payload = q.get()
        if kind == "ok":
            return payload, None
        return None, payload
    return None, "device benchmark crashed"


def _foreign_worker(raw_mb: int, q) -> None:
    try:
        import zlib

        from fdeflate_tpu.parallel import discovery as D

        rng = np.random.default_rng(9)
        wp = [rng.bytes(int(rng.integers(3, 12))) for _ in range(256)]
        data = b"".join(
            wp[int(rng.integers(256))] for _ in range((raw_mb << 20) // 7)
        )[: raw_mb << 20]
        z = zlib.compress(data, 6)

        t0 = time.perf_counter()
        ref = zlib.decompress(z)
        t_z = time.perf_counter() - t0

        # Exactness first: full host-bytes roundtrip once.
        r = D.try_foreign(z, engine="pallas")
        if r is None or r != ref:
            q.put(("ok", (0.0, len(data) / t_z / 1e9)))
            return
        # Timed runs use the device-resident contract (stream words staged
        # once, Adler-32 verified on device, no output download): the
        # sandbox's ~20 MB/s host<->device tunnel would otherwise dominate
        # and the number would measure the link, not the chip.
        words_dev = D.stage_words(z)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            rd = D.try_foreign(z, engine="pallas", words_dev=words_dev,
                               return_device=True)
            assert rd is not None
            ts.append(time.perf_counter() - t0)
        q.put(("ok", (len(data) / min(ts) / 1e9, len(data) / t_z / 1e9)))
    except Exception as e:  # pragma: no cover
        q.put(("err", repr(e)))


def run_foreign_guarded(
    raw_mb: int = int(os.environ.get("FDN_BENCH_FOREIGN_MB", "8")),
    timeout_s: float = float(os.environ.get("FDN_BENCH_TIMEOUT", "900")),
):
    """Foreign (standard zlib-6, un-indexed, multi-block) stream decode via
    the block-parallel Pallas path, vs host zlib.  Detail metric only."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_foreign_worker, args=(raw_mb, q))
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.terminate()
        p.join(10)
        return None, "foreign benchmark timed out"
    if not q.empty():
        kind, payload = q.get()
        if kind == "ok":
            return payload, None
        return None, payload
    return None, "foreign benchmark crashed"


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    length = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20

    data = make_idat_corpus(batch, length)
    z_enc, z_dec = bench_zlib_baseline(data[: max(batch // 8, 1)])
    n_enc, n_dec = bench_native(data[: max(batch // 4, 1)])

    device, err = run_device_guarded(batch, length)
    d_enc, d_dec, d_enc_zlib = (
        device if device is not None else (0.0, 0.0, 0.0)
    )
    foreign, foreign_err = (
        run_foreign_guarded() if device is not None else (None, "skipped")
    )
    f_dec, f_zlib = foreign if foreign is not None else (0.0, 0.0)

    def combined(e, d):
        return 2.0 / (1.0 / e + 1.0 / d) if e > 0 and d > 0 else 0.0

    # Bench integrity (VERDICT round 1, item 6): the headline metric is the
    # TPU path ONLY.  If the device is unreachable or decode fails
    # verification, the headline is 0.0 and the host engines appear solely
    # as detail fields — host throughput is never presented as a per-chip
    # TPU number.
    ours = combined(d_enc, d_dec)
    baseline = combined(z_enc, z_dec)

    result = {
        "metric": "png_idat_codec_throughput_per_chip",
        "value": round(ours, 3),
        "unit": "GB/s",
        "vs_baseline": round(ours / baseline, 2) if ours > 0 else 0.0,
        "detail": {
            "path": "tpu" if ours > 0 else "tpu_unverified",
            "device_encode_gbps": round(d_enc, 3),
            "device_decode_gbps": round(d_dec, 3),
            "device_zlib_stream_encode_gbps": round(d_enc_zlib, 3),
            "foreign_decode_gbps": round(f_dec, 3),
            "foreign_zlib_host_gbps": round(f_zlib, 3),
            "native_encode_gbps": round(n_enc, 3),
            "native_decode_gbps": round(n_dec, 3),
            "zlib1_encode_gbps": round(z_enc, 3),
            "zlib1_decode_gbps": round(z_dec, 3),
            "batch": batch,
            "stream_bytes": length,
            **({"device_error": err} if err else {}),
            **({"foreign_error": str(foreign_err)} if foreign_err else {}),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
