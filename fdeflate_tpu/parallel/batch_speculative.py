"""Batched speculative decode: RETIRED to an engine-selection shim.

See parallel/speculative.py for the round-5 measurements that retired
the speculative machinery (it lost to its own sequential fallback at
every chunk count, on the corpus most favorable to self-sync).  The
batch API is preserved and routes to ops/inflate.decompress_batch,
which already performs per-stream engine selection: indexed streams to
the fixed-geometry pipeline, large foreign streams to the block-parallel
discovery path, the rest to the sequential device lane, with the full
error taxonomy (errors.py) returned per stream.
"""

from __future__ import annotations

from .. import errors as E  # noqa: F401  (re-exported for callers)


def decompress_batch_speculative(
    streams: list[bytes],
    chunks_per_stream: int = 8,
    max_steps: int = 8192,
) -> list[bytes | E.DecompressionError]:
    """Decode many zlib streams; returns bytes or the error per stream.

    ``chunks_per_stream`` is accepted for API compatibility (see module
    docstring).
    """
    del chunks_per_stream
    from ..ops.inflate import decompress_batch

    return decompress_batch(streams, max_steps=max_steps)
