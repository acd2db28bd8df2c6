"""Partition-rule application: map param paths to NamedShardings.

Rules are (regex, PartitionSpec) pairs over the canonical dotted param path
(first match wins) — e.g. ``CogVideoXTransformer3D.partition_rules()`` shards
attention/MLP kernels over the ``tp`` axis. Specs whose axis sizes don't
divide the corresponding dim fall back to replication (so the same rules
work on any mesh, including single-chip)."""

from __future__ import annotations

import re
from typing import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from motionrag_tpu.training.optim import path_tokens

__all__ = ["apply_partition_rules", "shard_params", "ambient_mesh", "maybe_shard_seq"]


def _spec_fits(spec: P, shape, mesh: Mesh) -> bool:
    for dim, axes in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axes is None:
            continue
        axes = (axes,) if isinstance(axes, str) else axes
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        if dim % size:
            return False
    return True


def apply_partition_rules(params, rules: Sequence[tuple[str, P]], mesh: Mesh):
    """Return a tree of NamedShardings matching ``params``."""

    def resolve(path, leaf):
        dotted = ".".join(path_tokens(path))
        for pattern, spec in rules:
            if re.fullmatch(pattern, dotted):
                if hasattr(leaf, "shape") and not _spec_fits(spec, leaf.shape, mesh):
                    spec = P()
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(resolve, params)


def shard_params(params, rules, mesh: Mesh):
    shardings = apply_partition_rules(params, rules, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def ambient_mesh():
    """The mesh of the enclosing ``with mesh:`` context, or None outside
    one. (jax 0.9: the legacy context sets thread_resources, not the
    abstract mesh, so introspect that — guarded for API drift.)"""
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:  # noqa: BLE001
        return None


def maybe_shard_seq(x, axis: str = "sp", dim: int = 1):
    """Constrain ``x``'s dim ``dim`` to the ``axis`` mesh axis when the
    ambient mesh has one of size > 1; no-op otherwise (single chip, tests,
    or meshes without sequence parallelism). Used by the DiT to opt its
    token axis into sp sharding (flash attention's q-seq partitioning rule
    then turns attention into all-gather-KV sequence parallelism)."""
    m = ambient_mesh()
    if m is None or axis not in m.axis_names or m.shape[axis] == 1:
        return x
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(x, P(*spec))
