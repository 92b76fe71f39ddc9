"""Synthetic-distribution benchmark suite.

Mirrors the reference's bench workloads (benches/bench.rs:9-75): the
code-length-DP microbench plus four 1 MiB byte distributions
(uniform-random, low-entropy, mixture, distribution), compressing with
``compress_to_vec`` (level 1) and reporting MB/s, plus decode MB/s for the
produced streams.

Run: python bench/distributions.py [--device]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fdeflate_tpu as F  # noqa: E402
from fdeflate_tpu.huffman import compute_code_lengths  # noqa: E402

MB = 1024 * 1024


def gen_uniform(rng):
    return rng.integers(0, 256, MB, dtype=np.uint8)


def gen_low(rng):
    return ((rng.integers(0, 16, MB, dtype=np.uint8) * 2) - 16).astype(np.uint8)


def gen_mixture(rng):
    data = (rng.integers(0, 32, MB, dtype=np.int64) - 16).astype(np.uint8)
    mask = rng.integers(0, 200, MB) == 1
    data[mask] = rng.integers(0, 256, int(mask.sum()), dtype=np.uint8)
    return data


def gen_distribution(rng):
    sel = rng.integers(0, 100, MB)
    data = np.zeros(MB, np.uint8)
    for lo, hi, width, offset in [(1, 3, 32, 16), (11, 51, 16, 8), (51, 81, 8, 4)]:
        mask = (sel >= lo) & (sel < hi)
        data[mask] = (
            rng.integers(0, width, int(mask.sum()), dtype=np.int64) - offset
        ).astype(np.uint8)
    mask = sel == 0
    data[mask] = rng.integers(0, 256, int(mask.sum()), dtype=np.uint8)
    return data


WORKLOADS = {
    "uniform_random": gen_uniform,
    "low": gen_low,
    "mixture": gen_mixture,
    "distribution": gen_distribution,
}


def bench_compute_code_lengths(repeats: int = 20) -> float:
    rng = np.random.default_rng(0)
    freqs = rng.integers(1, 1000, 48)
    min_l = np.ones(48, np.int64)
    max_l = np.full(48, 8, np.int64)
    t0 = time.perf_counter()
    for _ in range(repeats):
        compute_code_lengths(freqs, min_l, max_l)
    return (time.perf_counter() - t0) / repeats * 1e6  # microseconds


def main():
    rng = np.random.default_rng(42)
    results = {"compute_code_lengths_us": round(bench_compute_code_lengths(), 1)}
    for name, gen in WORKLOADS.items():
        data = gen(rng).tobytes()
        # warm + measure encode (level 1, like the reference's compress_to_vec)
        comp = F.compress_to_vec(data)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            comp = F.compress_to_vec(data)
        enc = len(data) * reps / (time.perf_counter() - t0) / 1e6
        # decode
        F.decompress_to_vec(comp)
        t0 = time.perf_counter()
        for _ in range(reps):
            F.decompress_to_vec(comp)
        dec = len(data) * reps / (time.perf_counter() - t0) / 1e6
        results[name] = {
            "encode_mbps": round(enc, 1),
            "decode_mbps": round(dec, 1),
            "ratio": round(len(comp) / len(data), 4),
        }
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
