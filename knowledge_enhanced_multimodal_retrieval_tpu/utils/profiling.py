"""Profiling hooks (the reference has none — SURVEY §5).

Thin wrappers over ``jax.profiler`` so any hot path can be traced for the
XProf/TensorBoard toolchain, plus a step-timer that feeds the metrics sinks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: ``with trace('/tmp/profile'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Name a region in the trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling step timing (steps/sec, examples/sec) for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    def stats(self, batch_size: int = 1) -> Dict[str, float]:
        if not self._times:
            return {}
        mean = sum(self._times) / len(self._times)
        return {
            "step_time_s": mean,
            "steps_per_sec": 1.0 / mean,
            "examples_per_sec": batch_size / mean,
        }
