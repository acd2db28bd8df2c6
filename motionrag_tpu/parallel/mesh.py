"""Device-mesh construction and sharding helpers.

The reference's only parallelism is Lightning DDP over NCCL (SURVEY.md §2.9;
reference ``configs/cogvideox/MotionRAG_open.yml:5-7``). Here the mesh is a
first-class config axis: every trainer config carries a ``MeshConfig`` with
named axes

    pp  — pipeline parallel (stacked DiT blocks; parallel/pipeline.py) —
          outermost, so per-tick activation hops tolerate the slowest links
    dp  — data parallel (batch sharding; gradient psum rides ICI)
    fsdp— optional parameter/optimizer sharding over the dp axis group
    tp  — tensor parallel (attention heads / MLP hidden of the 5B DiT)
    sp  — sequence parallel (video-token sequence of 49-frame 720p latents)

so that TP/SP for the CogVideoX DiT are available even though the reference
never had them. Axes of size 1 are always legal — a single-chip run is the
degenerate mesh — and shardings are expressed with
``jax.sharding.NamedSharding`` + ``PartitionSpec`` so XLA inserts the
collectives (psum / all_gather / reduce_scatter) over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MeshConfig", "build_mesh", "local_mesh", "with_sharding", "P"]

AXIS_ORDER = ("pp", "dp", "fsdp", "tp", "sp")


@dataclasses.dataclass
class MeshConfig:
    """Named mesh axis sizes. ``dp=-1`` means "all remaining devices"."""

    dp: int = -1
    fsdp: int = 1
    tp: int = 1
    sp: int = 1
    pp: int = 1

    def resolve(self, n_devices: int) -> dict[str, int]:
        sizes = {
            "pp": self.pp, "dp": self.dp, "fsdp": self.fsdp,
            "tp": self.tp, "sp": self.sp,
        }
        fixed = int(np.prod([v for v in sizes.values() if v != -1]))
        wildcards = [k for k, v in sizes.items() if v == -1]
        if len(wildcards) > 1:
            raise ValueError("at most one mesh axis may be -1")
        if wildcards:
            if n_devices % fixed:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes {sizes}"
                )
            sizes[wildcards[0]] = n_devices // fixed
        total = int(np.prod(list(sizes.values())))
        if total > n_devices:
            raise ValueError(f"mesh {sizes} needs {total} devices, have {n_devices}")
        return sizes


def build_mesh(
    config: MeshConfig | None = None, devices: Sequence[jax.Device] | None = None
) -> Mesh:
    """Build a Mesh over the given (default: all global) devices.

    Axis order is (pp, dp, fsdp, tp, sp) so that tp/sp — the
    latency-sensitive axes — land on the innermost (fastest, adjacent-chip)
    ICI dimension.

    Multi-host (``jax.distributed.initialize`` active, see
    ``parallel.distributed``): the mesh is laid out host-aware via
    ``mesh_utils.create_hybrid_device_mesh`` — the process count is factored
    onto the OUTERMOST axes (pp first, then dp, then fsdp), so cross-host
    DCN carries at most one gradient all-reduce (dp) or per-tick activation
    hop (pp) per step while tp/sp collectives stay on intra-host ICI.
    """
    global_build = devices is None
    devices = list(devices if devices is not None else jax.devices())
    config = config or MeshConfig()
    sizes = config.resolve(len(devices))
    total = int(np.prod([sizes[a] for a in AXIS_ORDER]))

    n_proc = jax.process_count()
    if global_build and n_proc > 1 and total == len(devices):
        # factor the host count onto the outermost axes
        dcn = {a: 1 for a in AXIS_ORDER}
        remaining = n_proc
        for a in ("pp", "dp", "fsdp", "sp", "tp"):
            import math

            g = math.gcd(sizes[a], remaining)
            dcn[a] = g
            remaining //= g
            if remaining == 1:
                break
        if remaining != 1:
            raise ValueError(
                f"cannot factor {n_proc} hosts onto mesh axes {sizes}"
            )
        from jax.experimental import mesh_utils

        ici = [sizes[a] // dcn[a] for a in AXIS_ORDER]
        # TPU pods: DCN granule = slice (slice_index); CPU/GPU clusters
        # have no slice topology — fall back to process granules
        slices = {getattr(d, "slice_index", None) for d in devices}
        by_process = None in slices or len(slices) != n_proc
        dev_array = mesh_utils.create_hybrid_device_mesh(
            ici, [dcn[a] for a in AXIS_ORDER], devices=devices,
            allow_split_physical_axes=True, process_is_granule=by_process,
        )
        return Mesh(dev_array, AXIS_ORDER)

    dev_array = np.asarray(devices[:total]).reshape([sizes[a] for a in AXIS_ORDER])
    return Mesh(dev_array, AXIS_ORDER)


def local_mesh(n: int | None = None) -> Mesh:
    """A pure-data-parallel mesh over n (default: all) local devices."""
    devices = jax.devices()[: n or len(jax.devices())]
    return build_mesh(MeshConfig(dp=len(devices)), devices)


def with_sharding(mesh: Mesh, tree, spec_tree):
    """Apply NamedShardings from a PartitionSpec tree onto an array tree."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree, spec_tree, is_leaf=lambda x: x is None)


def batch_spec() -> P:
    """Canonical sharding for a leading-batch array: batch over dp(*fsdp)."""
    return P(("dp", "fsdp"))


def replicated() -> P:
    return P()
