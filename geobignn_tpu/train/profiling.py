"""Tracing / profiling hooks (aux subsystem; the reference has only
wall-clock prints, SURVEY §5).

`trace(dir)` wraps a code region in a jax profiler trace viewable in
TensorBoard/Perfetto; `StepTimer` collects host-side step latencies with
percentile summaries for quick regressions without a trace viewer.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with profiling.trace('/tmp/trace'): step()`"""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.samples: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        a = np.asarray(self.samples)
        if a.size == 0:
            return {}
        return dict(
            n=int(a.size),
            mean_ms=float(a.mean() * 1e3),
            p50_ms=float(np.percentile(a, 50) * 1e3),
            p95_ms=float(np.percentile(a, 95) * 1e3),
            max_ms=float(a.max() * 1e3),
        )
