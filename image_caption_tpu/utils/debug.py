"""Observability: profiling hooks, NaN guards, step timing.

The reference has no tracing/profiling beyond wall-clock prints
(SURVEY.md §5): demo total time (``/root/reference/main.py:247``) and
data-load elapse (``core/utils.py:61-62``).  TPU-native equivalents:

  * ``trace(...)``       — ``jax.profiler`` trace context around a region
                           (view in TensorBoard / xprof);
  * ``annotate(name)``   — named sub-region inside a trace;
  * ``enable_nan_debugging()`` — ``jax_debug_nans`` and disabled donation
                           for post-mortem (debug mode only; recompiles);
  * ``StepTimer``        — per-step wall-clock with compile-step exclusion.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside an active trace (context manager)."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_debugging(enable: bool = True) -> None:
    """Debug mode: raise on NaN inside jitted code (recompiles everything;
    never enable in production runs)."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Steps/sec with the first (compile-bearing) step excluded."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0: Optional[float] = None
        self._steps = 0
        self._first_step_s: Optional[float] = None
        self._t_start = time.perf_counter()

    def step(self, n: int = 1) -> None:
        """Record n steps completed by one dispatch (n > 1: a scanned
        multi-step dispatch).  The first dispatch is excluded entirely —
        it carries the compile."""
        now = time.perf_counter()
        if self._first_step_s is None:
            self._first_step_s = now - self._t_start
            self._t0 = now
        else:
            self._steps += n

    @property
    def compile_seconds(self) -> Optional[float]:
        return self._first_step_s

    @property
    def steps_per_sec(self) -> Optional[float]:
        if self._t0 is None or self._steps == 0:
            return None
        return self._steps / (time.perf_counter() - self._t0)
