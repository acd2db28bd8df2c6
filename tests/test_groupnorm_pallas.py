"""Pallas fused GroupNorm kernel vs the XLA reference implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from motionrag_tpu.ops.groupnorm_pallas import group_norm_fused
from motionrag_tpu.ops.norms import group_norm


@pytest.mark.parametrize("act", [None, "silu"])
@pytest.mark.parametrize("s,block_s", [(512, 256), (700, 256)])
def test_group_norm_fused_matches_xla(rng, act, s, block_s):
    b, c, groups = 2, 64, 8
    x = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32)

    out = group_norm_fused(
        x, scale, bias, groups=groups, act=act, block_s=block_s, interpret=True
    )
    ref = group_norm(x, groups, scale, bias, act=act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_group_norm_fused_spmd_batch_partitioned(rng):
    """Fused GroupNorm partitions over batch under SPMD (same
    custom_partitioning scheme as the flash kernels); scale/bias replicate;
    no collectives in the compiled module."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 2:
        import pytest

        pytest.skip("needs multiple devices")
    mesh = Mesh(np.array(devs[:2]), ("dp",))

    b, s, c = 4, 96, 32
    x = jnp.asarray(rng.standard_normal((b, s, c), dtype=np.float32))
    scale = jnp.asarray(rng.standard_normal(c, dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal(c, dtype=np.float32))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))

    f = jax.jit(lambda x, sc, bi: group_norm_fused(
        x, sc, bi, groups=8, block_s=32, interpret=True))
    out = f(xs, scale, bias)
    ref = group_norm_fused(x, scale, bias, groups=8, block_s=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
    assert out.sharding.spec[0] == "dp"
    txt = f.lower(xs, scale, bias).compile().as_text()
    for coll in ("all-gather", "all-reduce", "collective-permute"):
        assert coll not in txt
