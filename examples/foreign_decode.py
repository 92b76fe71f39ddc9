"""Foreign-stream decode example — arbitrary zlib input on the TPU.

Decodes zlib streams this framework did NOT produce (zlib, zlib-ng,
libdeflate, PNG IDATs from any encoder) through the block-parallel device
path: dynamic-block headers are discovered structurally (stage-1 screen +
header-validation kernel on the accelerator), every block decodes in its
own kernel lane with its own runtime canonical trees, and one materialize
launch resolves the LZ77 records.  Streams the discovery cannot cover fall
back transparently; output is always Adler-32 verified.

Usage:
  python examples/foreign_decode.py file1.zz [file2.zz ...]   # decode files
  python examples/foreign_decode.py --demo                    # synthetic demo
"""

from __future__ import annotations

import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fdeflate_tpu as F  # noqa: E402
from fdeflate_tpu.ops.inflate import decompress_batch  # noqa: E402


def demo() -> None:
    import numpy as np

    rng = np.random.default_rng(0)
    words = [rng.bytes(int(rng.integers(3, 12))) for _ in range(256)]
    streams, datas = [], []
    for s in range(4):
        r = np.random.default_rng(s)
        d = b"".join(words[int(r.integers(256))] for _ in range(150000))
        d = d[: 1 << 20]
        datas.append(d)
        streams.append(zlib.compress(d, 6))

    t0 = time.perf_counter()
    outs = decompress_batch(streams)  # batch: shared kernel launches
    dt = time.perf_counter() - t0
    total = sum(len(d) for d in datas)
    assert all(o == d for o, d in zip(outs, datas))
    print(f"decoded {len(streams)} foreign zlib streams "
          f"({total >> 20} MiB) in {dt:.2f}s — bit-exact vs zlib")

    # single-stream convenience API (same engines underneath)
    assert F.decompress_to_vec(streams[0]) == datas[0]
    print("decompress_to_vec: OK")


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] == "--demo":
        demo()
        return
    streams = [open(p, "rb").read() for p in sys.argv[1:]]
    t0 = time.perf_counter()
    outs = decompress_batch(streams)
    dt = time.perf_counter() - t0
    for p, o in zip(sys.argv[1:], outs):
        if isinstance(o, Exception):
            print(f"{p}: {type(o).__name__}")
        else:
            out_path = p + ".out"
            open(out_path, "wb").write(o)
            print(f"{p}: {len(o)} bytes -> {out_path}")
    print(f"{dt:.2f}s total")


if __name__ == "__main__":
    main()
