"""Reference-embedding fusion over the K retrieved videos
(reference ``condition/utils.py:7-36``): mean / distance-weighted /
concat / top1."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["condition_fusion"]


def condition_fusion(
    condition_emb: jnp.ndarray,
    fusion_type: str = "mean",
    weight=None,
) -> jnp.ndarray:
    """condition_emb: [b, k, l, c] -> [b, l, c] (or [b, k*l, c] for concat).

    'weight' mode: per-ref retrieval distances [b, k]; weights
    (1-d)/sum(1-d) — zero-distance (identical) refs dominate, failed refs
    (sentinel distance 1.0) get zero weight.
    """
    assert condition_emb.ndim == 4
    if fusion_type == "mean":
        return jnp.mean(condition_emb, axis=1)
    if fusion_type == "weight":
        d = jnp.asarray(weight, jnp.float32)
        w = (1.0 - d) / jnp.sum(1.0 - d, axis=1, keepdims=True)
        return jnp.sum(condition_emb * w[..., None, None].astype(condition_emb.dtype), axis=1)
    if fusion_type == "concat":
        b, k, l, c = condition_emb.shape
        return condition_emb.reshape(b, k * l, c)
    if fusion_type in (None, "top1"):
        return condition_emb[:, 0]
    raise ValueError(f"unknown fusion type {fusion_type!r}")
