"""Regenerate SIZES.md: per-level compressed sizes vs zlib on the five
reference corpora (four synthetic distributions + Sub-filtered PNG IDAT).

Run: python bench/sizes.py          # prints the markdown
     python bench/sizes.py --write  # rewrites SIZES.md in place
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

sys.path.insert(0, os.path.join(ROOT, "bench"))

import fdeflate_tpu as F  # noqa: E402
from distributions import (  # noqa: E402
    gen_distribution,
    gen_low,
    gen_mixture,
    gen_uniform,
)

LEVELS = [1, 3, 6, 9]


def corpora():
    rng = np.random.default_rng(0)
    out = [
        ("uniform_random", gen_uniform(rng).tobytes()),
        ("low", gen_low(rng).tobytes()),
        ("mixture", gen_mixture(rng).tobytes()),
        ("distribution", gen_distribution(rng).tobytes()),
    ]
    import bench as B

    out.append(("png_idat", B.make_idat_corpus(1, 1 << 20)[0].tobytes()))
    return out


def emulated_fdeflate(data: bytes, level: int) -> int:
    """Size the reference encoder would emit: the statement-level-faithful
    Python port (models/) with the demotion pass disabled — byte-for-byte
    the reference's symbol choices and block serialization
    (src/compress/bitstream.rs:143-194).  Stands in for the real fdeflate,
    which can't run here (no Rust toolchain in this image)."""
    from fdeflate_tpu.models import bitstream
    from fdeflate_tpu.models.compressor import (
        _compress_to_vec_with_level_python,
    )

    old = bitstream.ENABLE_DEMOTION
    bitstream.ENABLE_DEMOTION = False
    try:
        out = _compress_to_vec_with_level_python(data, level)
    finally:
        bitstream.ENABLE_DEMOTION = old
    assert zlib.decompress(bytes(out)) == data
    return len(out)


def main():
    rows = []
    for name, data in corpora():
        uf = len(F.compress_to_vec_ultra_fast(data))
        cells = [name, str(len(data)), str(uf)]
        ok = True
        for lvl in LEVELS:
            ours = F.compress_to_vec_with_level(data, lvl)
            if zlib.decompress(bytes(ours)) != data:
                ok = False
            cells.append(str(len(ours)))
            cells.append(str(emulated_fdeflate(data, lvl)))
            cells.append(str(len(zlib.compress(data, lvl))))
        assert ok, name
        rows.append(cells)

    hdr = ["corpus", "raw", "ours uf"]
    for lvl in LEVELS:
        hdr += [f"ours L{lvl}", f"fde* L{lvl}", f"zlib L{lvl}"]
    lines = [
        "| " + " | ".join(hdr) + " |",
        "|" + "---|" * len(hdr),
    ]
    for cells in rows:
        lines.append("| " + " | ".join(cells) + " |")
    table = "\n".join(lines)

    doc = f"""# Compressed-size comparison

Methodology: no Rust toolchain exists in this image (BASELINE.md), so the
real fdeflate can't run here.  Two stand-ins bracket it:

* `fde*` — **emulated fdeflate**: the statement-level-faithful port of the
  reference's parse/match/bitstream layers (models/) with this framework's
  demotion pass disabled, i.e. the reference's exact symbol choices and
  block serialization.  `ours <= fde*` at every level is enforced by
  tests/test_compress.py::test_size_le_emulated_fdeflate (the BASELINE.json
  "size <= fdeflate at every level" criterion).
* `zlib` — the C library via Python, for the reference's "outperforms
  zlib-rs" claims (README.md:27) at matching levels.

Corpora: the reference's four synthetic 1 MiB distributions
(benches/bench.rs) plus the Sub-filtered PNG-IDAT corpus (bench.py).
Regenerate with `python bench/sizes.py --write`.

Sizes in bytes (smaller is better). `uf` is the ultra-fast single-block
mode.  Levels 4-7 price every short backref against a shadow literal tree
and demote losers (models/bitstream.py), so higher levels are never worse
than lower ones beyond tree-header noise (<0.25%); the size-monotonicity
property is enforced by tests/test_compress.py.

{table}

Round-trip of every cell is verified in this script and by the test
suite; decode output is bit-exact against zlib's decoder on all corpora.
"""
    if "--write" in sys.argv:
        with open(os.path.join(ROOT, "SIZES.md"), "w") as f:
            f.write(doc)
        print("wrote SIZES.md")
    else:
        print(doc)


if __name__ == "__main__":
    main()
