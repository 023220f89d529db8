"""Tracing / profiling hooks (SURVEY §5: the reference has none; we add them).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-viewable trace for a window of train steps.
- :class:`StepTimer` — wall-clock per-step timing with images/sec and an EMA,
  logged through the ScalarLogger.
- :func:`annotate` — named TraceAnnotation for region attribution inside
  steps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (open with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step timing: step/s, images/s, EMA-smoothed."""

    def __init__(self, batch_size: int, ema_decay: float = 0.9):
        self.batch_size = batch_size
        self.ema_decay = ema_decay
        self._last: Optional[float] = None
        self._ema: Optional[float] = None

    def tick(self) -> dict:
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return {}
        dt = now - self._last
        self._last = now
        self._ema = dt if self._ema is None else (
            self._ema * self.ema_decay + dt * (1 - self.ema_decay)
        )
        return {
            "step_time_s": dt,
            "step_time_ema_s": self._ema,
            "images_per_sec": self.batch_size / self._ema,
        }
