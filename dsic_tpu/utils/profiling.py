"""Tracing / profiling: jax.profiler traces + a lightweight step timer.

The reference has no profiling beyond wall-clock prints (SURVEY.md section 5);
here traces are first-class: wrap any region in :func:`trace` and open the
result in XProf/TensorBoard, or use :class:`StepTimer` for rolling
steps/sec + device-time accounting in training loops.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a trace (shows up on the XProf timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling window step timer: call tick() once per step."""

    def __init__(self, window: int = 50):
        self._times: deque[float] = deque(maxlen=window)
        self._last: float | None = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
        self._last = now
        return dt

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    @property
    def sec_per_step(self) -> float:
        if not self._times:
            return 0.0
        return sum(self._times) / len(self._times)
