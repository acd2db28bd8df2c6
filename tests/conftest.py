"""Test bootstrap: force an 8-device virtual CPU mesh BEFORE jax import.

This is the TPU-native analogue of a fake distributed backend (the reference
has none — SURVEY.md §4): every multi-device test runs on
``--xla_force_host_platform_device_count=8`` CPU devices, so sharding and
collectives are exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env ships JAX_PLATFORMS=axon (TPU tunnel plugin) which wins over the
# env var set above in some plugin load orders — force via jax.config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: trainer/sampler jits take minutes each on the
# single host core; identical HLO across runs (and across tests) hits disk.
# Kept separate from the TPU bench cache (.jax_cache).
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from motionrag_tpu.parallel import MeshConfig, build_mesh

    return build_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=2))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
