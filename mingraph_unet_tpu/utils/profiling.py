"""Profiling / tracing hooks (absent from the reference; SURVEY §5).

Thin wrappers around ``jax.profiler`` plus a wall-clock step timer. Traces are
viewable in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace_if", "step_timer", "StepTimer"]


@contextlib.contextmanager
def trace_if(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``trace_dir`` if it is non-None."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


class StepTimer:
    """Rolling wall-clock step timer (blocks on device completion)."""

    def __init__(self):
        self._t0 = None
        self.last_ms = float("nan")

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, *sync_arrays) -> float:
        for a in sync_arrays:
            jax.block_until_ready(a)
        self.last_ms = (time.perf_counter() - self._t0) * 1e3
        return self.last_ms


@contextlib.contextmanager
def step_timer() -> Iterator[StepTimer]:
    t = StepTimer()
    t.start()
    yield t
