from motionrag_tpu.parallel.mesh import (
    MeshConfig,
    build_mesh,
    local_mesh,
    with_sharding,
)

__all__ = ["MeshConfig", "build_mesh", "local_mesh", "with_sharding"]
