"""Speculative chunked decode: RETIRED to an engine-selection shim.

The original module implemented the rapidgzip-style approach (SURVEY.md
P2, PAPERS.md): split a single compressed block at guessed byte offsets,
decode each chunk speculatively on its own device lane relying on Huffman
self-synchronization, stitch at the first agreeing bit position, and
re-decode the rare unsynced chunks from their then-known entries.

Round 5 settled it with measurements (bench/probe_speculative.py, the
corpus MOST favorable to self-sync — literal-heavy word-salad text,
single-block ultra-fast stream, 1 MiB):

    host zlib                12 ms
    sequential device lane   11,008 ms
    speculative C=16         27,236 ms
    speculative C=64         39,479 ms
    speculative C=128        47,310 ms

Speculation never beat the sequential fallback anywhere — it DEGRADED
with chunk count, because every chunk still decodes through the XLA
symbol loop whose per-step dispatch cost is the binding constraint
(PERF_NOTES round 3: the ~0.04 GB/s XLA-loop ceiling); splitting a
hopeless base multiplies launches without shortening the critical path,
and the stitch adds host round-trips on top.  Self-sync itself also
fails structurally on run-dominated streams (round-1 finding: in a sea
of identical run tokens a misaligned decode is self-consistent and
never re-syncs) — which is why the production intra-stream parallelism
is the exact chunk INDEX carried by the encoder (ops/ultrafast_kernel
``num_chunks`` -> parallel/device_pipeline), and un-indexed foreign
streams route to the block-parallel discovery path or the native host
engine (parallel/discovery, models/native).

The public API is preserved; it now routes to the engine-selection
batch decoder (ops/inflate.decompress_batch), which picks the best
real path per stream.
"""

from __future__ import annotations

from .. import errors as E


def decompress_speculative(
    data: bytes,
    num_chunks: int = 16,
    chunk_symbol_slack: float = 1.25,
) -> bytes:
    """Decode one zlib stream; chunk-parallel where a real path exists.

    ``num_chunks``/``chunk_symbol_slack`` are accepted for API
    compatibility; chunking decisions now live in the engine selection
    (see module docstring for the measured retirement rationale).
    """
    del num_chunks, chunk_symbol_slack
    from ..ops.inflate import decompress_batch

    out = decompress_batch([data])[0]
    if isinstance(out, E.DecompressionError):
        raise out
    return out
