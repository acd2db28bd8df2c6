"""Minimal metric protocol (torchmetrics-equivalent semantics).

States declare a reduce op ('sum' or 'cat'); ``sync()`` reduces across
data-parallel hosts with jax collectives — the TPU-native analogue of
torchmetrics' dist_reduce_fx + Lightning sync_dist (SURVEY.md §2.9)."""

from __future__ import annotations

from typing import Any

import numpy as np

__all__ = ["Metric"]


class Metric:
    higher_is_better: bool = True

    def __init__(self):
        self._states: dict[str, tuple[Any, str]] = {}

    def add_state(self, name: str, default, reduce: str = "sum"):
        assert reduce in ("sum", "cat")
        self._states[name] = (default, reduce)
        setattr(self, name, [] if reduce == "cat" else default)

    def reset(self):
        for name, (default, reduce) in self._states.items():
            setattr(self, name, [] if reduce == "cat" else default)

    def update(self, *args, **kwargs):
        raise NotImplementedError

    def compute(self):
        raise NotImplementedError

    def sync(self, mesh=None):
        """All-reduce states across processes. Single-process runs are a
        no-op; multi-host reduction uses process-level gather via
        jax.experimental.multihost_utils when available."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        for name, (_, reduce) in self._states.items():
            value = getattr(self, name)
            if reduce == "sum":
                arr = np.asarray(value, np.float64)
                total = multihost_utils.process_allgather(arr).sum(axis=0)
                setattr(self, name, type(value)(total) if np.isscalar(value) else total)
            else:
                gathered = multihost_utils.process_allgather(np.concatenate(value))
                setattr(self, name, [gathered.reshape(-1, *gathered.shape[2:])])
