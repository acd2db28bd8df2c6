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
    "adapt_block_layout",
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


def _stack_layers(*xs):
    if all(x is None for x in xs):
        return None
    if any(x is None for x in xs):
        raise ValueError(
            "cannot stack DiT block params into scan layout: trainable "
            "masking differs between blocks (some layers pruned, some not)"
        )
    return np.stack([np.asarray(x) for x in xs], axis=0)


def _is_none(x):
    return x is None


def _loop_families(tree: dict) -> dict[str, list[str]]:
    """Group sibling keys ``<prefix>_{i}`` (i = 0..n-1 complete) by prefix —
    the unrolled-block naming the porting converters and loop-mode modules
    produce (``transformer_blocks_{i}`` for the DiT, ``blocks_{i}`` for the
    scanned ViT encoders)."""
    fams: dict[str, list[str]] = {}
    for k in tree:
        if "_" in k and k.rsplit("_", 1)[1].isdigit():
            fams.setdefault(k.rsplit("_", 1)[0], []).append(k)
    out = {}
    for prefix, keys in fams.items():
        keys.sort(key=lambda k: int(k.rsplit("_", 1)[1]))
        idx = [int(k.rsplit("_", 1)[1]) for k in keys]
        if idx == list(range(len(idx))) and len(idx) > 1:
            out[prefix] = keys
    return out


def adapt_block_layout(target: Any, restored: Any) -> Any:
    """Convert repeated-block params between the unrolled layout
    (``<prefix>_{i}`` sibling subtrees — what the porting converters and
    loop-mode checkpoints produce) and the scanned layout
    (``<prefix>.block`` with a leading depth axis — what ``scan_blocks=True``
    modules own) wherever the checkpoint and the target tree disagree, so
    one released artifact serves both execution modes. Handles the DiT's
    ``transformer_blocks`` and the ViT encoders' ``blocks`` families alike."""
    if not (isinstance(target, dict) and isinstance(restored, dict)):
        return restored

    out = dict(restored)
    # UNet3D scan groups: target ``<base>_blocks`` = {"block": {res/spatial/
    # temporal}} covers the member indices of ``<base>_{i}_{part}`` that the
    # target does NOT carry unrolled (groups may start at i>0, e.g. the DC
    # up-L0 run starts at 1 — membership is inferred from the key sets, not
    # from config)
    import re as _re

    for gk, gv in list(target.items()):
        if not (gk.endswith("_blocks") and isinstance(gv, dict)
                and set(gv) == {"block"} and gk not in out):
            continue
        base = gk[: -len("_blocks")]
        pat = _re.compile(_re.escape(base) + r"_(\d+)_(\w+)$")
        restored_idx = {}
        for k in out:
            m = pat.match(k)
            if m:
                restored_idx.setdefault(int(m.group(1)), {})[m.group(2)] = k
        members = sorted(i for i in restored_idx
                         if not any(pat.match(k) and int(pat.match(k).group(1)) == i
                                    for k in target))
        if len(members) < 2 or not all(
                set(restored_idx[i]) == set(restored_idx[members[0]])
                for i in members):
            continue
        block = {}
        for part in restored_idx[members[0]]:
            subs = [out.pop(restored_idx[i][part]) for i in members]
            block[part] = jax.tree.map(_stack_layers, *subs, is_leaf=_is_none)
        out[gk] = {"block": block}
    # scanned checkpoint -> unrolled target (reverse of the above)
    for gk in [k for k in out if k.endswith("_blocks")
               and isinstance(out[k], dict) and set(out[k]) == {"block"}
               and k not in target]:
        base = gk[: -len("_blocks")]
        pat = _re.compile(_re.escape(base) + r"_(\d+)_(\w+)$")
        tgt_idx = {}
        for k in target:
            m = pat.match(k)
            if m:
                tgt_idx.setdefault(int(m.group(1)), set()).add(m.group(2))
        block = out[gk]["block"]
        if not tgt_idx or not block:
            continue
        # the group's members are the indices whose parts match the stacked
        # tree's part set
        members = sorted(i for i, parts in tgt_idx.items()
                         if parts == set(block))
        lead = {leaf.shape[0] for leaf in jax.tree.leaves(block)}
        if len(lead) != 1 or len(members) != lead.pop():
            continue
        out.pop(gk)
        for pos, i in enumerate(members):
            for part, sub in block.items():
                out[f"{base}_{i}_{part}"] = jax.tree.map(
                    lambda x, pos=pos: None if x is None else x[pos],
                    sub, is_leaf=_is_none)
    # unrolled checkpoint -> scanned target
    for prefix, loop_keys in _loop_families(out).items():
        tgt = target.get(prefix)
        if (isinstance(tgt, dict) and set(tgt) == {"block"}
                and prefix not in out):
            blocks = [out.pop(k) for k in loop_keys]
            out[prefix] = {
                "block": jax.tree.map(_stack_layers, *blocks, is_leaf=_is_none)
            }
    # scanned checkpoint -> unrolled target
    for prefix, tgt_keys in _loop_families(target).items():
        sub = out.get(prefix)
        if (isinstance(sub, dict) and set(sub) == {"block"}
                and prefix not in target):
            stacked = out.pop(prefix)["block"]
            for i in range(len(tgt_keys)):
                out[f"{prefix}_{i}"] = jax.tree.map(
                    lambda x, i=i: None if x is None else x[i],
                    stacked, is_leaf=_is_none,
                )
    return {
        k: adapt_block_layout(target[k], v)
        if isinstance(v, dict) and isinstance(target.get(k), dict)
        else v
        for k, v in out.items()
    }


def merge_into(params: Any, restored: Any) -> Any:
    """strict=False merge: leaves present in the (possibly pruned)
    checkpoint tree override the given tree; missing leaves keep their
    current values. Full-train-state checkpoints (trainer.save_checkpoint:
    ``{params, opt_state, step, rng}``) contribute their params subtree.
    Unrolled-vs-scanned DiT block layouts are adapted automatically
    (:func:`adapt_block_layout`)."""
    if isinstance(restored, dict) and "opt_state" in restored and "params" in restored:
        restored = restored["params"]
    restored = adapt_block_layout(params, restored)

    def merge(full, part):
        if isinstance(part, dict) and isinstance(full, dict):
            return {k: merge(full[k], part[k]) if k in part else full[k] for k in full}
        return full if part is None else part

    return merge(params, restored)


def restore_into(path: str | Path, params: Any) -> Any:
    """strict=False load from ``path`` (see :func:`merge_into`)."""
    return merge_into(params, restore_checkpoint(path))
