"""PNG IDAT recompression example — the reference's flagship use case.

Reads a PNG, extracts and re-deflates its IDAT stream with the ultra-fast
encoder (or any level), and writes a valid PNG back.  Demonstrates the host
API end-to-end on real image data; with many files, the batch device path
(`fdeflate_tpu.ops.ultrafast_kernel.compress_batch_ultra_fast`) compresses
all IDATs in one TPU program.

Usage: python examples/png_idat.py input.png output.png [level|uf]
"""

from __future__ import annotations

import os
import struct
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fdeflate_tpu as F  # noqa: E402


def read_chunks(data: bytes):
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        yield ctype, payload
        pos += 12 + length


def write_chunk(out: bytearray, ctype: bytes, payload: bytes):
    out += struct.pack(">I", len(payload))
    out += ctype
    out += payload
    out += struct.pack(">I", zlib.crc32(ctype + payload))


def recompress(png: bytes, mode: str = "uf") -> bytes:
    idat = b"".join(p for c, p in read_chunks(png) if c == b"IDAT")
    raw = F.decompress_to_vec(idat)
    if mode == "uf":
        new_idat = F.compress_to_vec_ultra_fast(raw)
    else:
        new_idat = F.compress_to_vec_with_level(raw, int(mode))

    out = bytearray(b"\x89PNG\r\n\x1a\n")
    wrote_idat = False
    for ctype, payload in read_chunks(png):
        if ctype == b"IDAT":
            if not wrote_idat:
                write_chunk(out, b"IDAT", new_idat)
                wrote_idat = True
            continue
        write_chunk(out, ctype, payload)
    return bytes(out)


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "uf"
    png = open(src, "rb").read()
    result = recompress(png, mode)
    open(dst, "wb").write(result)
    print(f"{src}: {len(png)} -> {len(result)} bytes ({mode})")
