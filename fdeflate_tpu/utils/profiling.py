"""Profiling: throughput counters and jax.profiler trace helpers.

The reference encodes perf work as #[bench] benchmarks; here every hot op
can be wrapped in a Throughput counter, and device work can be captured with
``trace()`` for the XLA profiler UI.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class Throughput:
    """Accumulating bytes/sec counter for a named op."""

    name: str
    bytes: int = 0
    seconds: float = 0.0
    calls: int = 0
    _t0: float = field(default=0.0, repr=False)

    @contextlib.contextmanager
    def measure(self, nbytes: int):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds += time.perf_counter() - t0
            self.bytes += nbytes
            self.calls += 1

    @property
    def gbps(self) -> float:
        return self.bytes / self.seconds / 1e9 if self.seconds else 0.0

    def report(self) -> str:
        return (
            f"{self.name}: {self.gbps:.3f} GB/s "
            f"({self.bytes / 1e6:.1f} MB over {self.calls} calls)"
        )


_counters: dict[str, Throughput] = {}


def counter(name: str) -> Throughput:
    if name not in _counters:
        _counters[name] = Throughput(name)
    return _counters[name]


def report_all() -> str:
    return "\n".join(c.report() for c in _counters.values())


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fdeflate_tpu_trace"):
    """Capture a jax.profiler trace around a region of device work."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sync(*arrays) -> None:
    """Force device work to finish (works around async-dispatch platforms
    where block_until_ready is unreliable: reads back a tiny slice)."""
    import numpy as np

    for a in arrays:
        try:
            np.asarray(a.ravel()[:1] if hasattr(a, "ravel") else a)
        except Exception:
            pass
