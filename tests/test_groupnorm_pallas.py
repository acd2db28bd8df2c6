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
