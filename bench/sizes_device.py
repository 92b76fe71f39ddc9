"""Device-encode size parity: levels 1-3 on TPU vs the emulated fdeflate.

VERDICT r4 #7: the device matched encoder (ops/matchscan) must cover the
reference's general levels 1-3 — "done" is device size <= the host fde*
port at L1/L2/L3 on all five benchmark corpora, roundtrip-verified.

The level map mirrors the reference's search-effort ladder
(/root/reference/src/compress/mod.rs:75-88: 1 = single-probe hash table,
2-3 = hash chains of growing depth) in the sorted-neighborhood
formulation's terms: deeper k-predecessor probes per level.

Run: python bench/sizes_device.py            (TPU; CPU works but slow)
"""

from __future__ import annotations

import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sizes import corpora, emulated_fdeflate  # noqa: E402
from fdeflate_tpu.ops.matchscan import (  # noqa: E402
    DEVICE_LEVELS,
    compress_batch_device,
)


def main():
    rows = []
    for name, data in corpora():
        cells = [name]
        for lvl in (1, 2, 3):
            t0 = time.perf_counter()
            out = compress_batch_device([data], lvl)[0]
            dt = time.perf_counter() - t0
            assert zlib.decompress(out) == data, (name, lvl)
            fde = emulated_fdeflate(data, lvl)
            ok = "<=" if len(out) <= fde else "> !"
            cells.append(f"L{lvl}: dev {len(out)} {ok} fde* {fde}"
                         f" ({dt:.1f}s)")
            print(f"{name:16s} {cells[-1]}", flush=True)
        rows.append(cells)
    print("\nlevel map:", DEVICE_LEVELS)


if __name__ == "__main__":
    main()
