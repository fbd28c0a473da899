"""Tracing/profiling: jax.profiler traces + per-step wall-clock metrics.

Capability parity: the reference only keeps time.time() deltas in pickles
(SURVEY.md §5.1; run_nerf.py:539,653). TPU equivalent: device traces via
jax.profiler (viewable in TensorBoard/XProf) plus a cheap StepTimer whose
history feeds the same loss_vs_time.pkl format.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device profile for everything inside the block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step wall times + simple rates."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> float:
        now = time.perf_counter()
        dt = 0.0 if self._last is None else now - self._last
        self._last = now
        if dt > 0:
            self.times.append(dt)
            if len(self.times) > self.window:
                self.times.pop(0)
        return dt

    @property
    def mean_step_s(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def rays_per_s(self, n_rays: int) -> float:
        m = self.mean_step_s
        return n_rays / m if m > 0 else 0.0

    def summary(self, n_rays: int) -> Dict[str, float]:
        return {
            "mean_step_s": self.mean_step_s,
            "rays_per_s": self.rays_per_s(n_rays),
        }
