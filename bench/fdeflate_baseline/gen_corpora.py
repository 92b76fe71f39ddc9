"""Write the five benchmark corpora as raw .bin files for the Rust harness.

Exactly the corpora the in-box benchmarks use: the four synthetic byte
distributions of bench/distributions.py (mirroring the reference's
benches/bench.rs:24-75) and the filtered-PNG-IDAT corpus of
bench.py:make_idat_corpus.  Deterministic (fixed seeds), so the off-box
fdeflate measurement runs on byte-identical inputs.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "bench"))


def main():
    import importlib.util as _u

    from distributions import WORKLOADS  # bench/distributions.py

    spec = _u.spec_from_file_location(
        "benchmod", os.path.join(ROOT, "bench.py"))
    bm = _u.module_from_spec(spec)
    spec.loader.exec_module(bm)

    import numpy as np

    outdir = os.path.join(HERE, "corpora")
    os.makedirs(outdir, exist_ok=True)
    # Same rng discipline as bench/distributions.main: one generator seeded
    # 42, consumed in WORKLOADS order — byte-identical corpora.
    rng = np.random.default_rng(42)
    for name, gen in WORKLOADS.items():
        data = gen(rng).tobytes()
        with open(os.path.join(outdir, f"{name}.bin"), "wb") as f:
            f.write(data)
        print(f"{name}.bin: {len(data)} bytes")
    idat = bm.make_idat_corpus(1, 1 << 20)[0]
    with open(os.path.join(outdir, "idat.bin"), "wb") as f:
        f.write(idat.tobytes())
    print(f"idat.bin: {idat.size} bytes")


if __name__ == "__main__":
    main()
