"""Thin named-collective helpers over the canonical mesh axes — the
TPU-native vocabulary replacing the reference's NCCL call sites
(SURVEY.md §2.9): grad psum (DDP all-reduce), batch all_gather
(ActionCLIP's contrastive gather), metric sum reduction."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["psum_mean", "all_gather_batch", "metric_sum"]

DATA_AXES = ("dp", "fsdp")


def psum_mean(tree, axis_name=DATA_AXES):
    """Mean-reduce a pytree across the data-parallel group (grad sync)."""
    n = 1
    for a in (axis_name if isinstance(axis_name, tuple) else (axis_name,)):
        n = n * jax.lax.axis_size(a)
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name) / n, tree)


def all_gather_batch(x: jnp.ndarray, axis_name=DATA_AXES) -> jnp.ndarray:
    """Gather per-device batches into one global batch along axis 0
    (reference ActionCLIP ``all_gather(sync_grads=True)`` — gradients flow
    through jax.lax.all_gather natively)."""
    g = jax.lax.all_gather(x, axis_name)
    return g.reshape((-1,) + x.shape[1:])


def metric_sum(x, axis_name=DATA_AXES):
    """Sum-reduce metric accumulators (torchmetrics dist_reduce_fx='sum')."""
    return jax.tree.map(lambda v: jax.lax.psum(v, axis_name), x)
