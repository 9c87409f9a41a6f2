"""Profiling / tracing utilities.

The reference has no first-party profiling (SURVEY.md §5); Lightning's
profiler is only touched in a bug workaround. Here profiling is first-class:

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (config: ``training.main.profile_dir`` +
  ``profile_steps``);
- :class:`StepTimer` — rolling wall-clock stats per step with percentiles,
  logged alongside the training metrics.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 100, steps_per_tick: int = 1):
        self.times: deque = deque(maxlen=window)
        self._last: float | None = None
        # steps_per_call mode ticks once per K-step device call; report
        # per-step durations so the perf/ metrics stay comparable
        self.steps_per_tick = max(1, int(steps_per_tick))

    def tick(self) -> float | None:
        """Call once per step (or per K-step call); returns the last
        per-step duration."""
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = (now - self._last) / self.steps_per_tick
            self.times.append(dt)
        self._last = now
        return dt

    def stats(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "perf/step_time_mean_s": float(arr.mean()),
            "perf/step_time_p50_s": float(np.percentile(arr, 50)),
            "perf/step_time_p95_s": float(np.percentile(arr, 95)),
        }
