"""fdeflate_tpu — a TPU-native zlib/DEFLATE framework.

A from-scratch reimplementation of the capabilities of image-rs/fdeflate,
designed TPU-first:

* the compute path (batch encode/decode, checksums) runs as JAX/XLA programs
  with Pallas kernels for the hot ops, scaling over device meshes via
  ``jax.sharding`` (see ``fdeflate_tpu.parallel``);
* the streaming host API mirrors the reference crate exactly —
  ``Compressor`` levels 0-9, ``UltraFastCompressor``, and a resumable
  ``Decompressor`` with the chunking-insensitive ``read`` contract;
* a native C++ backend accelerates the serial host paths.

Public API parity with the reference (src/lib.rs:29-36):

    compress_to_vec, compress_to_vec_with_level, compress_to_vec_rle,
    compress_to_vec_ultra_fast, Compressor, UltraFastCompressor,
    decompress_to_vec, decompress_to_vec_bounded, Decompressor,
    DecompressionError (+ concrete subclasses), OutputTooLarge,
    compute_code_lengths.
"""

from .errors import (
    BadCodeLengthHuffmanTree,
    BadDistanceHuffmanTree,
    BadLiteralLengthHuffmanTree,
    BadZlibHeader,
    DecompressionError,
    DistanceTooFarBack,
    ExtraInput,
    InputStartsWithRun,
    InsufficientInput,
    InvalidBlockType,
    InvalidCodeLengthRepeat,
    InvalidDistanceCode,
    InvalidHdist,
    InvalidHlit,
    InvalidLiteralLengthCode,
    InvalidUncompressedBlockLength,
    OutputTooLarge,
    Status,
    WrongChecksum,
)
from .huffman import compute_code_lengths
from .models.compressor import (
    Compressor,
    compress_to_vec,
    compress_to_vec_rle,
    compress_to_vec_ultra_fast,
    compress_to_vec_with_level,
)
from .models.decompressor import (
    Decompressor,
    decompress_to_vec,
    decompress_to_vec_bounded,
)
from .models.ultrafast import UltraFastCompressor

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy access to the device/batch APIs (they import jax)."""
    if name == "compress_batch_ultra_fast":
        from .ops.ultrafast_kernel import compress_batch_ultra_fast

        return compress_batch_ultra_fast
    if name == "decompress_batch":
        from .ops.inflate import decompress_batch

        return decompress_batch
    if name == "decompress_batch_indexed":
        from .parallel.device_pipeline import decompress_batch_indexed

        return decompress_batch_indexed
    if name == "decompress_speculative":
        from .parallel.speculative import decompress_speculative

        return decompress_speculative
    if name == "decompress_batch_speculative":
        from .parallel.batch_speculative import decompress_batch_speculative

        return decompress_batch_speculative
    if name == "decompress_foreign":
        from .parallel.discovery import decompress_foreign

        return decompress_foreign
    if name == "compress_batch_matched":
        from .ops.matchscan import compress_batch_matched

        return compress_batch_matched
    if name == "compress_batch_device":
        from .ops.matchscan import compress_batch_device

        return compress_batch_device
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "Compressor",
    "UltraFastCompressor",
    "Decompressor",
    "compress_to_vec",
    "compress_to_vec_with_level",
    "compress_to_vec_rle",
    "compress_to_vec_ultra_fast",
    "decompress_to_vec",
    "decompress_to_vec_bounded",
    "compute_code_lengths",
    "DecompressionError",
    "OutputTooLarge",
    "Status",
]
