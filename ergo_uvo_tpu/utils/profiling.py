"""Tracing / profiling helpers (SURVEY.md §5: the reference has none).

  * :func:`stage` — ``jax.named_scope`` context for per-pipeline-stage
    attribution in XLA profiles;
  * :func:`trace` — capture a ``jax.profiler`` trace around a callable
    (viewable in TensorBoard/Perfetto);
  * :class:`FrameRateCounter` — host-side frames/s (the BASELINE metric).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def stage(name: str):
    """Named scope for a pipeline stage (shows up in profiler traces)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(logdir: str):
    """Profile everything inside the context into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameRateCounter:
    """Exponential-moving-average frames/s counter."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self._last: float | None = None
        self.fps = 0.0
        self.total_frames = 0

    def tick(self, frames: int = 1) -> float:
        now = time.perf_counter()
        if self._last is not None:
            dt = max(now - self._last, 1e-9)
            inst = frames / dt
            self.fps = inst if self.fps == 0 else (
                self.alpha * inst + (1 - self.alpha) * self.fps
            )
        self._last = now
        self.total_frames += frames
        return self.fps


def time_fn(fn: Callable, *args, reps: int = 10, warmup: int = 1, **kw):
    """Wall-time a jitted callable with block_until_ready; returns seconds/rep."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps
