"""Profiling/observability hooks (SURVEY.md §5: the reference has none beyond
print-debugging; the TPU build provides jax.profiler traces + a steps/sec
meter around the rollout scan)."""
from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """env-steps/s (and anything/s) over a sliding window.

    NOTE: call `sync()` (device->host fetch) on a result before `tick`; on
    some transports block_until_ready returns before execution finishes.
    """

    def __init__(self, window: int = 20):
        self.window = window
        self._times = []
        self._counts = []

    @staticmethod
    def sync(x):
        return np.asarray(x)

    def tick(self, n_items: int):
        self._times.append(time.perf_counter())
        self._counts.append(n_items)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._counts.pop(0)

    @property
    def rate(self) -> float:
        if len(self._times) < 2:
            return float("nan")
        dt = self._times[-1] - self._times[0]
        return sum(self._counts[1:]) / dt if dt > 0 else float("nan")
