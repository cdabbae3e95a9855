"""Tracing / profiling hooks — new scope (reference has none, SURVEY.md §5).

* ``trace(dir)``: JAX profiler trace (XPlane; view in TensorBoard /
  xprof) around a code region.
* ``StepTimer``: lightweight rolling step timer + edges/s meter, usable in
  any training loop without device syncs (reads are explicit).
"""
from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling throughput meter (host wall clock; call mark() per step)."""

    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self._last = None

    def mark(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def mean_step_s(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def throughput(self, items_per_step: float) -> float:
        s = self.mean_step_s
        return items_per_step / s if s == s and s > 0 else float("nan")
