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


def device_sync(x) -> float:
    """Force completion of the computation producing `x` and return one
    scalar from it.

    `jax.block_until_ready` is NOT a reliable fence on every PJRT backend:
    on tunneled/remote platforms (axon) it returns as soon as the dispatch
    RPC is acknowledged, long before the device finishes — wall-clock
    timed that way reports physically impossible throughput (measured:
    an 8192^3 f32 matmul "completing" in 0.01 ms).  A device->host value
    transfer cannot be faked, so this is the one trustworthy sync point."""
    import jax
    import jax.numpy as jnp

    leaf = x if hasattr(x, "ravel") else jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.ravel(leaf)[0]))


def measure_chained(fn, k_small: int = 1, k_large: int = 6, reps: int = 2) -> float:
    """Seconds per iteration of `fn(k) -> array`, where fn runs its workload
    k times chained inside one dispatch.  Differencing two chain lengths
    cancels both the dispatch round-trip (~90 ms over the axon tunnel) and
    the host->device sync cost; `device_sync` provides the real fence."""
    device_sync(fn(k_small))  # warm / compile both traces
    device_sync(fn(k_large))

    def once(k):
        t0 = time.perf_counter()
        device_sync(fn(k))
        return time.perf_counter() - t0

    t_small = min(once(k_small) for _ in range(reps))
    t_large = min(once(k_large) for _ in range(reps))
    return max(t_large - t_small, 1e-9) / (k_large - k_small)


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
