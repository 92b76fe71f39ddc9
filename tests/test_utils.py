"""Shared decode-driver test utility.

Mirrors the reference's ``decompress_by_chunks``
(src/decompress/tests/test_utils.rs:47-87): drives ``Decompressor.read`` with
an arbitrary input chunking pattern, a fixed 1 MB output buffer, an iteration
cap, and checksum verification disabled.
"""

from __future__ import annotations

import itertools

from fdeflate_tpu import Decompressor, DecompressionError


class DriverError(Exception):
    def __init__(self, kind: str):
        super().__init__(kind)
        self.kind = kind

    def __eq__(self, other):
        return isinstance(other, DriverError) and self.kind == other.kind


def decompress_by_chunks(data: bytes, chunks, output_size: int = 1_000_000):
    """Returns decoded bytes; raises DecompressionError or TestError."""
    chunks = iter(chunks)
    d = Decompressor()
    d.ignore_adler32()
    out = bytearray(output_size)
    in_pos = 0
    out_pos = 0
    iterations = 0
    while not d.is_done():
        iterations += 1
        if iterations > 5000:
            raise DriverError("TooManyIterations")
        chunk_size = next(chunks, 0)
        end = min(in_pos + chunk_size, len(data))
        consumed, produced = d.read(data[in_pos:end], out, out_pos)
        in_pos += consumed
        out_pos += produced
        if out_pos == len(out) and consumed == 0 and not d.is_done():
            raise DriverError("OutputTooLarge")
    return bytes(out[:out_pos])


def result_of(fn):
    """Capture a decode outcome as a comparable value."""
    try:
        return ("ok", fn())
    except DecompressionError as e:
        return ("err", type(e).__name__)
    except DriverError as e:
        return ("testerr", e.kind)


def verify_no_sensitivity_to_input_chunking(data: bytes):
    """Whole-input and byte-by-byte decoding must agree exactly
    (reference: src/decompress.rs:1331-1338)."""
    r_whole = result_of(lambda: decompress_by_chunks(data, [len(data)]))
    r_bytewise = result_of(lambda: decompress_by_chunks(data, itertools.repeat(1)))
    assert r_whole == r_bytewise, (r_whole[0], r_bytewise[0])
    return r_whole
