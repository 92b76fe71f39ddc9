"""Settle speculation (VERDICT r4 #8): where does self-sync chunked decode win?

Speculative chunk-parallel decode targets UN-INDEXED single-block streams.
Self-synchronization fails on run-structured data (misalignment inside a
sea of identical run tokens is self-consistent — the round-1 finding that
led to the indexed design), but on literal-heavy text the code tree
re-aligns within a few symbols.  This probe measures exactly that corpus:
word-salad text, ultra-fast-compressed (single dynamic block, trained
tree, no index), decoded by

  * decompress_speculative (C speculative lanes + stitch + re-decode)
  * the same module's sequential fallback path (one lane per stream —
    what a foreign single-block stream would otherwise get)
  * host zlib (reference point)

Both device paths pay the same host<->device transfer contract, so the
speculative-vs-sequential comparison is apples-to-apples.

Run: python bench/probe_speculative.py [MiB]
"""

from __future__ import annotations

import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fdeflate_tpu as F  # noqa: E402
from fdeflate_tpu.parallel import speculative as SP  # noqa: E402


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(11)
    words = [rng.bytes(int(rng.integers(3, 12))) for _ in range(256)]
    text = b"".join(
        words[int(rng.integers(256))] for _ in range((mb << 20) // 7)
    )[: mb << 20]

    stream = F.compress_to_vec_ultra_fast(text)
    print(f"corpus {len(text)} B text -> {len(stream)} B single-block "
          f"ultra-fast stream", flush=True)

    def timeit(name, fn, reps=3):
        out = fn()
        assert out == text, f"{name} mismatch"
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        g = len(text) / min(ts) / 1e9
        print(f"{name:24s}: {min(ts)*1e3:8.1f} ms  ({g:.3f} GB/s)",
              flush=True)
        return g

    g_z = timeit("host zlib", lambda: zlib.decompress(stream))
    g_seq = timeit("sequential fallback", lambda: SP._fallback(stream))
    for C in (16, 64, 128):
        timeit(f"speculative C={C}",
               lambda C=C: SP.decompress_speculative(stream, num_chunks=C))


if __name__ == "__main__":
    main()
