"""LoRA as a functional param-tree transform.

The reference injects ``LoRACompatibleLinear/Conv`` modules by dotted name
(``src/utils/lora_utils.py:8-78``) and trains their ``lora_layer`` params
(``base_module.py:57-63``). The TPU-native equivalent keeps the frozen base
params untouched and trains a separate low-rank tree: for every matching
2D kernel W [in, out], params A [in, r] (gaussian/r-scaled, diffusers
LoRALinearLayer init) and B [r, out] (zeros) are created, and ``merge_lora``
computes W + A@B * scale inside the train/eval step — XLA fuses the rank-r
update into the parameter load, and only the LoRA tree receives gradients.

Storage layout: a FLAT dict keyed by the joined raw param path
(``"unet/mid_block/attn/to_q/kernel"``), which survives optax/pytree
plumbing and checkpoints as an ordinary subtree under ``params['lora']``.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp

from motionrag_tpu.training.optim import path_tokens, pattern_matches

__all__ = ["init_lora", "merge_lora", "lora_site_paths"]


def _raw_path(path) -> str:
    parts = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "idx", None)
        parts.append(str(name if name is not None else k))
    return "/".join(parts)


def lora_site_paths(params, patterns: Iterable[str]) -> list[str]:
    """Raw paths of every 2D 'kernel' leaf matching any pattern."""
    patterns = list(patterns)
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        toks = path_tokens(path)
        if not toks or toks[-1] != "kernel" or getattr(leaf, "ndim", 0) != 2:
            continue
        if any(pattern_matches(toks, p) for p in patterns):
            out.append(_raw_path(path))
    return out


def init_lora(rng, params, patterns: Iterable[str], rank: int = 64) -> dict:
    """Flat {raw_path: {'lora_a','lora_b'}} tree for every matching kernel."""
    patterns = list(patterns)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    sites = {}
    for path, leaf in flat:
        toks = path_tokens(path)
        if not toks or toks[-1] != "kernel" or getattr(leaf, "ndim", 0) != 2:
            continue
        if any(pattern_matches(toks, p) for p in patterns):
            sites[_raw_path(path)] = leaf.shape
    keys = jax.random.split(rng, max(len(sites), 1))
    lora = {}
    for key, (raw, (d_in, d_out)) in zip(keys, sorted(sites.items())):
        lora[raw] = {
            "lora_a": jax.random.normal(key, (d_in, rank), jnp.float32) / rank,
            "lora_b": jnp.zeros((rank, d_out), jnp.float32),
        }
    return lora


def merge_lora(params, lora: dict | None, scale: float = 1.0):
    """W' = W + A @ B * scale at every LoRA site (no-op elsewhere)."""
    if not lora:
        return params
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    merged = []
    seen = set()
    for path, leaf in flat:
        raw = _raw_path(path)
        lw = lora.get(raw)
        if lw is not None:
            seen.add(raw)
            delta = (lw["lora_a"] @ lw["lora_b"]) * scale
            leaf = leaf + delta.astype(leaf.dtype)
        merged.append(leaf)
    missing = set(lora) - seen
    if missing:
        raise KeyError(f"LoRA sites not found in params: {sorted(missing)[:5]}")
    return jax.tree_util.tree_unflatten(treedef, merged)
