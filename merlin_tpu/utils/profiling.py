"""Tracing / profiling subsystem (SURVEY.md §5: the reference has none;
the TPU build makes it first-class).

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory
* :class:`StepTimer` — rolling step timing with tokens/sec and
  model-flops-utilization estimates
* :func:`annotate` — named trace regions inside host code
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, *, host_tracer_level: int = 2) -> Iterator[None]:
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock per step + throughput/MFU."""

    def __init__(self, *, tokens_per_step: int = 0,
                 flops_per_step: float = 0.0,
                 peak_flops: float = 197e12,  # v5e bf16
                 window: int = 20):
        self.tokens_per_step = tokens_per_step
        self.flops_per_step = flops_per_step
        self.peak_flops = peak_flops
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> Dict[str, float]:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            self._times = self._times[-self.window:]
        self._last = now
        return self.stats()

    def stats(self) -> Dict[str, float]:
        if not self._times:
            return {}
        dt = sum(self._times) / len(self._times)
        out = {"step_time_s": dt}
        if self.tokens_per_step:
            out["tokens_per_sec"] = self.tokens_per_step / dt
        if self.flops_per_step:
            out["mfu"] = self.flops_per_step / dt / self.peak_flops
        return out


def train_step_flops(n_params: int, tokens_per_step: int,
                     remat: bool = True) -> float:
    """6ND (+2ND for remat recompute) transformer training FLOPs estimate."""
    mult = 8.0 if remat else 6.0
    return mult * n_params * tokens_per_step
