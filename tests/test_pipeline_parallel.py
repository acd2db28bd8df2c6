"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over a ``pp``
mesh axis must be bit-for-bit equivalent to the sequential layer stack — in
forward, on the real CogVideoX DiT block, and through gradients.

(The reference has no pipeline parallelism — SURVEY.md §2.9 DDP only — this
is a TPU-native capability addition.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionrag_tpu.parallel import MeshConfig, build_mesh
from motionrag_tpu.parallel.pipeline import (
    _apply_span,
    pipeline_apply,
    stack_layer_params,
)


@pytest.fixture(scope="module")
def pp_mesh():
    return build_mesh(MeshConfig(pp=4, dp=2))


def _stacked_mlp(rng, n_layers, dim):
    ws = [
        jnp.asarray(rng.standard_normal((dim, dim)) / np.sqrt(dim), jnp.float32)
        for _ in range(n_layers)
    ]
    bs = [jnp.asarray(rng.standard_normal((dim,)) * 0.1, jnp.float32) for _ in range(n_layers)]
    return stack_layer_params([{"w": w, "b": b} for w, b in zip(ws, bs)])


def _mlp_layer(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def test_pipeline_matches_sequential(pp_mesh, rng):
    params = _stacked_mlp(rng, n_layers=8, dim=16)
    x = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)

    ref = _apply_span(_mlp_layer, params, x)
    for m in (1, 2, 4, 8):
        out = pipeline_apply(_mlp_layer, params, x, pp_mesh, microbatches=m)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_pipeline_pp1_degenerates_to_scan(rng):
    mesh = build_mesh(MeshConfig(pp=1, dp=2))
    params = _stacked_mlp(rng, n_layers=4, dim=8)
    x = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    out = pipeline_apply(_mlp_layer, params, x, mesh, microbatches=2)
    ref = _apply_span(_mlp_layer, params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_pipeline_gradients_match(pp_mesh, rng):
    params = _stacked_mlp(rng, n_layers=4, dim=8)
    x = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)

    def loss_seq(p):
        return jnp.mean((_apply_span(_mlp_layer, p, x) - tgt) ** 2)

    def loss_pp(p):
        return jnp.mean(
            (pipeline_apply(_mlp_layer, p, x, pp_mesh, microbatches=2) - tgt) ** 2
        )

    l_ref, g_ref = jax.value_and_grad(loss_seq)(params)
    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pp))(params)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g_pp,
        g_ref,
    )


def test_pipeline_composes_with_dp_sharded_batch(pp_mesh, rng):
    """Only the pp axis goes manual inside pipeline_apply (auto= for the
    rest): a dp-sharded batch keeps its sharding through the pipeline under
    jit, and the result still matches the sequential stack."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    params = _stacked_mlp(rng, n_layers=4, dim=16)
    x = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    ref = _apply_span(_mlp_layer, params, x)

    xs = jax.device_put(x, NamedSharding(pp_mesh, P("dp")))
    ps = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(pp_mesh, P())), params
    )

    @jax.jit
    def run(p, x):
        return pipeline_apply(_mlp_layer, p, x, pp_mesh, microbatches=2)

    out = run(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_pipeline_dit_block(pp_mesh, rng):
    """Pipeline the real CogVideoX joint-attention block: activations are the
    (hidden, encoder_hidden, temb) stream pytree; rope cache closed over."""
    from motionrag_tpu.models.cogvideox.dit import CogVideoXBlock
    from motionrag_tpu.ops.posemb import rope_3d_cache

    depth, b, sv, st, dim = 4, 4, 12, 5, 32
    block = CogVideoXBlock(dim=dim, heads=2, head_dim=16, time_embed_dim=24)
    hidden = jnp.asarray(rng.standard_normal((b, sv, dim)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((b, st, dim)), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((b, 24)), jnp.float32)
    rope = rope_3d_cache(16, 3, 2, 2)

    keys = jax.random.split(jax.random.key(0), depth)
    layer_params = [block.init(k, hidden, enc, temb, rope) for k in keys]
    stacked = stack_layer_params(layer_params)

    def layer_fn(p, x):
        h, e, t = x
        h2, e2 = block.apply(p, h, e, t, rope)
        return (h2, e2, t)

    ref = _apply_span(layer_fn, stacked, (hidden, enc, temb))
    out = pipeline_apply(layer_fn, stacked, (hidden, enc, temb), pp_mesh, microbatches=2)
    for o, r in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=2e-5, atol=2e-5)
