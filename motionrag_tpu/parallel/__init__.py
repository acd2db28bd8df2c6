from motionrag_tpu.parallel.mesh import (
    MeshConfig,
    build_mesh,
    local_mesh,
    with_sharding,
)
from motionrag_tpu.parallel.pipeline import pipeline_apply, stack_layer_params

__all__ = [
    "MeshConfig",
    "build_mesh",
    "local_mesh",
    "with_sharding",
    "pipeline_apply",
    "stack_layer_params",
]
