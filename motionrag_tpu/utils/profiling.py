"""Profiling/tracing utilities (SURVEY.md §5.1: the reference ships a
disabled PyTorchProfiler config + dataset timing telemetry; here profiling
is first-class via jax.profiler)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path

import jax

__all__ = ["trace", "StageTimer"]


@contextlib.contextmanager
def trace(log_dir: str = "runs/profile", host_tracer_level: int = 2):
    """Capture a TensorBoard-viewable device trace around the block."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Lightweight named stage timing with device sync (the analogue of the
    reference's DatasetTimer telemetry for arbitrary pipeline stages)."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if self.sync:
            jax.effects_barrier()
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def report(self) -> str:
        return ", ".join(f"{k}: {v * 1e3:.1f}ms" for k, v in self.summary().items())
