"""ctypes bindings for the native C++ host codec.

Loads ``libfdeflate_native.so`` (building it from ``native/`` on first use if
a compiler is available).  All entry points degrade gracefully: callers check
``available()`` and fall back to the pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

from .. import errors as E

_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_SRC = _ROOT / "native" / "fdeflate_native.cpp"
_SRC2 = _ROOT / "native" / "deflate.cpp"
_LIB = _ROOT / "native" / "libfdeflate_native.so"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("FDEFLATE_TPU_NO_NATIVE"):
        return None
    sources = [s for s in (_SRC, _SRC2) if s.exists()]
    if not _LIB.exists() or any(
        s.stat().st_mtime > _LIB.stat().st_mtime for s in sources
    ):
        if not sources:
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 *[str(s) for s in sources], "-o", str(_LIB)],
                check=True, capture_output=True, timeout=180,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None

    lib.fdn_inflate.restype = ctypes.c_longlong
    lib.fdn_inflate.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.c_int, ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.fdn_compress_ultra.restype = ctypes.c_longlong
    lib.fdn_compress_ultra.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
    ]
    lib.fdn_deflate.restype = ctypes.c_longlong
    lib.fdn_deflate.argtypes = [
        ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t, ctypes.c_int,
    ]
    lib.fdn_materialize.restype = ctypes.c_longlong
    lib.fdn_materialize.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def inflate(data: bytes, ignore_adler32: bool = False,
            maxlen: int | None = None, size_hint: int | None = None) -> bytes:
    """Whole-stream decode through the native kernel.

    Raises the matching DecompressionError / OutputTooLarge on failure.
    """
    lib = _load()
    assert lib is not None
    import numpy as np

    cap = size_hint if size_hint is not None else max(4 * len(data), 1 << 16)
    if maxlen is not None:
        cap = min(cap, maxlen)
    needed = ctypes.c_size_t(0)
    while True:
        out = np.empty(cap, np.uint8)
        rc = lib.fdn_inflate(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            int(ignore_adler32), ctypes.byref(needed),
        )
        if rc >= 0:
            return out[:rc].tobytes()
        status = -rc
        if status == int(E.Status.OUTPUT_TOO_LARGE):
            want = max(needed.value, cap * 2)
            if maxlen is not None and cap >= maxlen:
                raise E.OutputTooLarge(out[: min(needed.value, cap)].tobytes())
            cap = want if maxlen is None else min(want, maxlen)
            continue
        raise E.error_for_status(status)


def compress_ultra(data: bytes) -> bytes:
    import numpy as np

    lib = _load()
    assert lib is not None
    cap = 64 + len(data) + len(data) // 2 + (len(data) * 3) // 5
    while True:
        out = np.empty(cap, np.uint8)
        rc = lib.fdn_compress_ultra(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        )
        if rc >= 0:
            return out[:rc].tobytes()
        cap *= 2


def deflate(data: bytes, level: int, zlib_mode: bool = True) -> bytes:
    """Whole-buffer compression at the given level (0-9)."""
    import numpy as np

    lib = _load()
    assert lib is not None
    cap = 1024 + len(data) + len(data) // 2
    while True:
        out = np.empty(cap, np.uint8)
        rc = lib.fdn_deflate(
            min(level, 7), data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            int(zlib_mode),
        )
        if rc >= 0:
            return out[:rc].tobytes()
        cap *= 2


def materialize_records(recs, expected_size: int) -> bytes | None:
    """Expand packed kernel records (ops/pallas_inflate format) into bytes.

    Consumer-side materialization: the TPU record kernel does the parallel
    symbol phase; the memcpy-bound LZ77 expansion runs on the host that
    consumes the bytes.  ``recs`` is a C-contiguous int32 array (records in
    output order; idle/EOB records are skipped).  Returns None on malformed
    records or when the native backend is unavailable.
    """
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    recs = np.ascontiguousarray(recs, np.int32)
    out = np.empty(max(expected_size, 1), np.uint8)
    rc = lib.fdn_materialize(
        recs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), recs.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
    )
    if rc < 0:
        return None
    return out[:rc].tobytes()
