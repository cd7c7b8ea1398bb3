"""Profiling hooks (SURVEY.md §5.1 — the reference has only wall-clock
timing; the TPU build gets ``jax.profiler`` traces and edges/s as a
first-class throughput metric)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler`` trace context; no-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Wall-clock step timing + derived edges/s (device-sync-free: the
    caller decides when results are forced)."""

    def __init__(self, edges_per_step: int):
        self.edges_per_step = int(edges_per_step)
        self._t0 = time.perf_counter()

    def lap(self) -> tuple:
        """Returns ``(step_time_s, edges_per_sec)`` since the last lap."""
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        return dt, (self.edges_per_step / dt if dt > 0 else 0.0)
