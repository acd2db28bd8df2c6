"""Multi-host (multi-process) bootstrap — the TPU-native replacement for the
reference's NCCL/Lightning-DDP process group (SURVEY §2.9; reference
``configs/cogvideox/MotionRAG_open.yml:5-7`` runs DDP over 8 GPUs).

On TPU pods, ``jax.distributed.initialize()`` auto-discovers coordinator and
process topology from the TPU metadata server, so ``initialize()`` with no
arguments is the production path. For explicit clusters (GPU/CPU testbeds,
the 2-process CPU-cluster test), pass coordinator/process counts via args,
CLI flags (``main.py --coordinator ...``) or the ``MRT_COORDINATOR`` /
``MRT_NUM_PROCESSES`` / ``MRT_PROCESS_ID`` environment variables.

After initialization, ``jax.devices()`` spans every host (DCN-connected) and
``parallel.mesh.build_mesh`` lays the requested axes over the global device
set, keeping the dp axis outermost across hosts so gradient all-reduces ride
DCN once per step while tp/sp collectives stay on intra-host ICI.
"""

from __future__ import annotations

import os

import jax

__all__ = ["initialize_distributed", "is_distributed", "process_index", "process_count"]

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> bool:
    """Initialize the JAX distributed runtime (idempotent).

    Returns True when a multi-process runtime is (or already was) active.
    With no arguments and no ``MRT_*`` env overrides, initializes only when
    running under a recognized cluster (TPU pod metadata, SLURM, etc.) —
    a plain single-process run stays single-process.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get("MRT_COORDINATOR")
    if num_processes is None and os.environ.get("MRT_NUM_PROCESSES"):
        num_processes = int(os.environ["MRT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("MRT_PROCESS_ID"):
        process_id = int(os.environ["MRT_PROCESS_ID"])

    explicit = coordinator_address is not None
    # JAX's own cluster conventions (multi-process TPU pods set
    # JAX_COORDINATOR_ADDRESS / SLURM exports a full topology); note
    # single-host TPU environments can export TPU_WORKER_HOSTNAMES=localhost,
    # which is NOT a cluster — so only explicit signals trigger here.
    auto_cluster = bool(os.environ.get("JAX_COORDINATOR_ADDRESS")
                        or os.environ.get("SLURM_JOB_NUM_NODES", "1") not in ("", "1"))
    if not explicit and not auto_cluster:
        return False

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except Exception as e:  # noqa: BLE001 — mis-detected cluster: stay single
        if explicit:
            raise
        import sys

        print(f"jax.distributed auto-init failed ({e}); continuing "
              "single-process", file=sys.stderr)
        return False
    _INITIALIZED = True
    return jax.process_count() > 1


def is_distributed() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()
