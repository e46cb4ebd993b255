"""Profiling & throughput metering (the reference has none — SURVEY §5;
its only perf tool is pressing 'v' to disable rendering).

- ``trace(path)``: context manager around jax.profiler for TensorBoard /
  Perfetto traces of the fused step;
- ``Meter``: env-steps/s EMA used by the runner and bench.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir="/tmp/legged_gym_tpu_trace"):
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Meter:
    """Exponential-moving-average steps/s meter."""

    def __init__(self, alpha=0.2):
        self.alpha = alpha
        self.rate = None
        self._t = None

    def tick(self, steps):
        now = time.perf_counter()
        if self._t is not None:
            r = steps / (now - self._t)
            self.rate = r if self.rate is None else \
                (1 - self.alpha) * self.rate + self.alpha * r
        self._t = now
        return self.rate
