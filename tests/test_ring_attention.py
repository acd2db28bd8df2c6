"""Sequence-parallel ring attention (ops/ring_attention.py) on the virtual
CPU mesh — numerics vs dense attention, sharding preserved, and the
expected collective (ppermute ring) present."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from motionrag_tpu.ops.attention import dot_product_attention
from motionrag_tpu.ops.ring_attention import sequence_parallel_attention


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("sp",))


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)])
def test_ring_matches_dense(rng, dtype, tol):
    mesh = _mesh(4)
    b, h, s, d = 2, 3, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32), dtype)
    k = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32), dtype)
    v = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32), dtype)

    out = sequence_parallel_attention(q, k, v, mesh)
    # dense reference: ops.attention BSHD layout -> transpose to BHSD
    ref = dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=tol, rtol=tol)
    assert out.sharding.spec == (None, None, "sp", None)


def test_ring_uses_ppermute_not_allgather(rng):
    """The whole point: K/V move shard-by-shard around the ring — the
    compiled module must contain collective-permute and must NOT gather the
    full K/V onto any device."""
    from jax.experimental.shard_map import shard_map

    from motionrag_tpu.ops.ring_attention import ring_attention

    mesh = _mesh(4)
    b, h, s, d = 1, 2, 512, 32
    spec = P(None, None, "sp", None)
    f = jax.jit(shard_map(
        lambda q, k, v: ring_attention(q, k, v, "sp"),
        mesh=mesh, in_specs=(spec,) * 3, out_specs=spec, check_rep=False))
    x = jnp.zeros((b, h, s, d))
    txt = f.lower(x, x, x).compile().as_text()
    assert "collective-permute" in txt
    assert "all-gather" not in txt


def test_ring_scale_override(rng):
    mesh = _mesh(2)
    b, h, s, d = 1, 1, 128, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
    out = sequence_parallel_attention(q, k, v, mesh, scale=0.5)
    ref = dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), scale=0.5).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
