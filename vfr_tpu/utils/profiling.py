"""Profiling hooks (SURVEY.md §5 tracing): jax.profiler + step timing."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """Wrap a region in ``jax.profiler.trace`` when a dir is given."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


class StepTimer:
    """Wall-clock step timing with block_until_ready semantics left to the
    caller (time the *dispatch-to-ready* window around a blocking fetch)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._n = 0
        self._total = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self._total += dt
        return dt

    @property
    def mean(self) -> float:
        counted = max(self._n - self.warmup, 1)
        return self._total / counted
