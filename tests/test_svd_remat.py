"""SVD UNet gradient checkpointing must not change numerics.

remat=True wraps the spatio-temporal transformers AND the resblocks
(round 5: transformers-only remat left the full-res spatial+temporal
resnet intermediates live and the b=1 16f 576x1024 adapter train step
OOMed at 13.9 GB of HLO temps — bench_results/train_svd_r5). Remat is a
pure recompute schedule: loss and grads must match the non-remat module
exactly up to float association.
"""

import jax
import jax.numpy as jnp
import numpy as np

from motionrag_tpu.models.svd.unet import UNetSpatioTemporal


def _tiny(remat):
    return UNetSpatioTemporal(
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=1,
        cross_attention_dim=48,
        num_attention_heads=(1, 2, 2, 2),
        adapter_sites=(
            "mid_block.attentions.0.transformer_blocks.0.attn2.processor",),
        remat=remat,
        dtype=jnp.float32,
    )


def test_svd_remat_matches_exact_loss_and_grads():
    f = 2
    x = jnp.linspace(-1, 1, f * 16 * 16 * 8).reshape(1, f, 16, 16, 8)
    ts = jnp.full((1,), 0.5)
    ctx = jnp.linspace(-1, 1, 48).reshape(1, 1, 48)
    ids = jnp.asarray([[6.0, 127.0, 0.02]])
    action = jnp.linspace(0, 1, 4 * 48).reshape(1, 4, 48)

    plain = _tiny(remat=False)
    remat = _tiny(remat=True)
    params = plain.init(jax.random.key(0), x, ts, ctx, ids, action_emb=action)
    params_r = remat.init(jax.random.key(0), x, ts, ctx, ids, action_emb=action)
    # identical param tree: remat wrapping must not change names/shapes,
    # or ported checkpoints would not round-trip between the two modes
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_r))

    def loss(unet):
        return lambda p: jnp.mean(
            unet.apply(p, x, ts, ctx, ids, action_emb=action).astype(
                jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(loss(plain))(params)
    l1, g1 = jax.value_and_grad(loss(remat))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)
