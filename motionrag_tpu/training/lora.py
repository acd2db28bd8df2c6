"""LoRA as a functional param-tree transform.

The reference injects ``LoRACompatibleLinear/Conv`` modules by dotted name
(``src/utils/lora_utils.py:8-78``). The TPU-native equivalent keeps the
frozen base params untouched and trains a separate low-rank tree: for every
matching kernel W [in, out], params A [in, r] (gaussian/r-scaled) and
B [r, out] (zeros) are created, and ``merge_lora`` computes W + A@B * scale
on the fly inside the train step — XLA fuses the rank-r update into the
parameter load, and only the LoRA tree receives gradients.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp

from motionrag_tpu.training.optim import path_tokens, pattern_matches

__all__ = ["init_lora", "merge_lora"]


def _is_lora_site(path, leaf, patterns) -> bool:
    toks = path_tokens(path)
    if not toks or toks[-1] != "kernel" or leaf.ndim != 2:
        return False
    return any(pattern_matches(toks, p) for p in patterns)


def init_lora(rng, params, patterns: Iterable[str], rank: int = 64):
    """Create the LoRA tree for every matching 2D kernel. Returns a pytree
    with the same structure containing {'lora_a','lora_b'} dicts at matched
    kernels and None elsewhere."""
    patterns = list(patterns)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = jax.random.split(rng, max(len(flat), 1))

    def build(i, path, leaf):
        if not _is_lora_site(path, leaf, patterns):
            return None
        d_in, d_out = leaf.shape
        a = jax.random.normal(keys[i], (d_in, rank), jnp.float32) / rank
        b = jnp.zeros((rank, d_out), jnp.float32)
        return {"lora_a": a, "lora_b": b}

    leaves = []
    for i, (path, leaf) in enumerate(flat):
        leaves.append(build(i, path, leaf))
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def merge_lora(params, lora, scale: float = 1.0):
    """W' = W + A @ B * scale at every LoRA site (no-op elsewhere)."""
    if lora is None:
        return params

    def merge(w, lw):
        if lw is None:
            return w
        delta = (lw["lora_a"] @ lw["lora_b"]) * scale
        return w + delta.astype(w.dtype)

    return jax.tree.map(
        merge, params, lora, is_leaf=lambda x: x is None or isinstance(x, dict) and "lora_a" in x
    )
