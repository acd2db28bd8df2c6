"""Pipeline parallelism over a ``pp`` mesh axis (GPipe schedule).

The reference has no pipeline parallelism (its only strategy is Lightning
DDP, SURVEY.md §2.9); this is a TPU-native capability addition for scaling
the deep stacked-block backbones (the CogVideoX DiT is 42 identical blocks)
across chips whose HBM cannot hold the whole model.

Design — idiomatic XLA rather than framework-managed stages:

- Block parameters are *stacked* along a leading layer axis ``[L, ...]``
  (the same layout ``jax.lax.scan``-over-layers uses), and that axis is
  sharded over the ``pp`` mesh axis: stage ``i`` physically holds layers
  ``[i*L/pp, (i+1)*L/pp)``.
- Execution runs under ``shard_map``: the batch is split into ``M``
  microbatches and a ``lax.scan`` over ``M + pp - 1`` ticks implements the
  classic pipelined schedule — on each tick every stage applies its layer
  span to its resident microbatch, then a single ``jax.lax.ppermute``
  rotates activations one stage forward. The pipeline bubble is the usual
  ``(pp-1)/(M+pp-1)`` fraction.
- Everything is differentiable (scan + ppermute + psum), so the same op
  serves training; activations for the backward pass rematerialize under
  ``jax.checkpoint`` of the block fn if memory demands it.

``pp`` is the *outermost* mesh axis (parallel/mesh.py): per-tick transfers
are one activation tensor, so the axis tolerates the slowest links (DCN
between pods), keeping tp/sp on adjacent-chip ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["stack_layer_params", "pipeline_apply"]


def stack_layer_params(param_list):
    """Stack per-layer param trees ``[p_0, ..., p_{L-1}]`` into one tree whose
    leaves carry a leading layer axis ``[L, ...]`` — the layout both
    ``lax.scan``-over-layers and ``pipeline_apply`` consume."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *param_list)


def _apply_span(fn: Callable, span_params, x):
    """Sequentially apply this stage's span of stacked layers to ``x``."""

    def body(h, p_layer):
        return fn(p_layer, h), None

    out, _ = jax.lax.scan(body, x, span_params)
    return out


def pipeline_apply(
    fn: Callable,
    stacked_params,
    x,
    mesh: Mesh,
    *,
    microbatches: int,
    axis: str = "pp",
):
    """Apply ``L`` stacked layers to ``x`` with pipeline parallelism.

    Args:
      fn: ``fn(layer_params, x) -> x`` — one layer; ``x`` is an array or a
        pytree of arrays (e.g. the DiT's ``(hidden, encoder_hidden, temb)``
        streams), and ``fn`` must preserve its structure and shapes.
        Batch-independent constants (rope caches, masks) should be closed
        over — shard_map replicates closures.
      stacked_params: tree with leading layer axis ``L`` on every leaf;
        ``L`` must be divisible by ``mesh.shape[axis]``.
      x: activation pytree; every leaf carries the batch on dim 0, and the
        batch must be divisible by ``microbatches``.
      mesh: mesh containing the ``axis`` axis. Size-1 axis degenerates to a
        plain scan over layers (single-chip path, same math).
      microbatches: number of microbatches ``M``; larger M shrinks the
        pipeline bubble ``(pp-1)/(M+pp-1)`` at the cost of smaller per-tick
        matmuls — keep microbatch size large enough to saturate the MXU.

    Returns the same value as sequentially applying all ``L`` layers.
    """
    pp = mesh.shape[axis]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    batch = jax.tree.leaves(x)[0].shape[0]
    if n_layers % pp:
        raise ValueError(f"{n_layers} layers not divisible by pp={pp}")
    if batch % microbatches:
        raise ValueError(f"batch {batch} not divisible by M={microbatches}")
    if pp == 1:
        return _apply_span(fn, stacked_params, x)

    m = microbatches
    xs = jax.tree.map(lambda a: a.reshape(m, a.shape[0] // m, *a.shape[1:]), x)

    # params: layer axis sharded over pp; input microbatches replicated along
    # pp (only stage 0 reads them; the buffer is small relative to weights).
    # Only the pp axis goes manual (axis_names) — every other mesh axis stays
    # under the GSPMD partitioner, so a dp-sharded batch or tp-sharded
    # kernels keep their sharding inside the pipeline body instead of being
    # gathered.
    p_spec = jax.tree.map(lambda _: P(axis), stacked_params)
    x_spec = jax.tree.map(lambda _: P(), xs)

    # check_vma=True is required for partial-manual shard_map (jax 0.9) and
    # holds here: outputs are psum'd over pp, hence pp-invariant.
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(p_spec, x_spec),
        out_specs=x_spec,
        axis_names={axis},
    )
    def run(span_params, xs):
        rank = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        # the carry is pp-varying from tick 1 on; mark the (zero) initial
        # carry as varying so the scan carry type is stable (vma typing)
        state = jax.tree.map(
            lambda a: jax.lax.pcast(jnp.zeros_like(a[0]), (axis,), to="varying"),
            xs,
        )
        outputs = jax.tree.map(
            lambda a: jax.lax.pcast(jnp.zeros_like(a), (axis,), to="varying"), xs
        )

        def tick(carry, t):
            state, outputs = carry
            # stage 0 injects microbatch t (clipped; ticks >= M recirculate
            # values that never reach a recorded output slot)
            mb = jnp.clip(t, 0, m - 1)
            h = jax.tree.map(
                lambda buf, s: jnp.where(
                    rank == 0,
                    jax.lax.dynamic_index_in_dim(buf, mb, 0, keepdims=False),
                    s,
                ),
                xs,
                state,
            )
            out = fn_span(span_params, h)
            # last stage records microbatch t-(pp-1) once it is valid
            slot = jnp.clip(t - (pp - 1), 0, m - 1)
            record = jnp.logical_and(rank == pp - 1, t >= pp - 1)
            outputs = jax.tree.map(
                lambda o, buf: jnp.where(
                    record,
                    jax.lax.dynamic_update_index_in_dim(
                        buf, o.astype(buf.dtype), slot, 0
                    ),
                    buf,
                ),
                out,
                outputs,
            )
            state = jax.lax.ppermute(out, axis, perm)
            return (state, outputs), None

        fn_span = partial(_apply_span, fn)
        (state, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(m + pp - 1)
        )
        # outputs are valid on the last stage only — zero elsewhere and psum
        # to hand every pp rank the replicated result
        outputs = jax.tree.map(
            lambda buf: jnp.where(rank == pp - 1, buf, jnp.zeros_like(buf)),
            outputs,
        )
        return jax.lax.psum(outputs, axis)

    out = run(stacked_params, xs)
    return jax.tree.map(lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]), out)
