"""Orbax checkpointing with the reference's incremental semantics.

``IncrementalCheckpoint`` (reference ``src/utils/training.py:75-97``) strips
all non-trainable keys from saved checkpoints so released artifacts are small
adapter/CT files. Here: ``save_incremental`` filters the param tree by the
trainable mask before writing; ``restore_into`` merges a (possibly partial)
checkpoint into a full param tree — the analogue of
``load_state_dict(strict=False)`` (reference ``base_module.py:38``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = [
    "save_checkpoint",
    "save_incremental",
    "restore_checkpoint",
    "restore_into",
    "merge_into",
    "mask_filter",
]


def mask_filter(params, mask):
    """Replace non-trainable leaves with None (dropped by orbax)."""
    return jax.tree.map(lambda p, m: p if m else None, params, mask)


_mask_filter = mask_filter  # backward-compat alias


def save_checkpoint(path: str | Path, tree: Any) -> None:
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def save_incremental(path: str | Path, params: Any, mask: Any) -> None:
    """Save only the trainable subtree (reference IncrementalCheckpoint)."""
    save_checkpoint(path, _mask_filter(params, mask))


def restore_checkpoint(path: str | Path, template: Any | None = None) -> Any:
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(path)
        return ckptr.restore(path, template)


def merge_into(params: Any, restored: Any) -> Any:
    """strict=False merge: leaves present in the (possibly pruned)
    checkpoint tree override the given tree; missing leaves keep their
    current values. Full-train-state checkpoints (trainer.save_checkpoint:
    ``{params, opt_state, step, rng}``) contribute their params subtree."""
    if isinstance(restored, dict) and "opt_state" in restored and "params" in restored:
        restored = restored["params"]

    def merge(full, part):
        if isinstance(part, dict) and isinstance(full, dict):
            return {k: merge(full[k], part[k]) if k in part else full[k] for k in full}
        return full if part is None else part

    return merge(params, restored)


def restore_into(path: str | Path, params: Any) -> Any:
    """strict=False load from ``path`` (see :func:`merge_into`)."""
    return merge_into(params, restore_checkpoint(path))
