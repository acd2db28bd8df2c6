"""UNet3D gradient checkpointing must not change numerics.

remat=True wraps the spatial/temporal transformers AND the resblocks
(round 4: leaving the resblocks out kept the 4-stage TemporalConvBlock's
fp32 full-res intermediates live and the stage-1 adapter train step OOMed
at a measured 29.5/15.75 GB — .bench_logs/train_dc_r4b.err). Remat is a
pure recompute schedule: loss and grads must match the non-remat module
exactly up to float association.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D


@pytest.fixture(scope="module")
def tiny_kwargs():
    return dict(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
        num_head_channels=16, context_dim=24, temporal_conv=True,
        action_cross_attention=True, dtype=jnp.float32,
    )


def _loss_fn(unet):
    t = 2
    x = jnp.linspace(-1, 1, 1 * t * 8 * 8 * 4).reshape(1, t, 8, 8, 4)
    ts = jnp.zeros((1,), jnp.int32)
    ctx = {
        "prompt": jnp.linspace(-1, 1, 77 * 24).reshape(1, 77, 24),
        "image": jnp.linspace(0, 1, t * 16 * 24).reshape(1, t * 16, 24),
        "action": jnp.linspace(0, 1, 25 * 24).reshape(1, 25, 24),
    }
    fs = jnp.zeros((1,), jnp.int32)

    def loss(params):
        out = unet.apply(params, x, ts, ctx, fs)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    return loss, (x, ts, ctx, fs)


def test_remat_matches_exact_loss_and_grads(tiny_kwargs):
    plain = UNet3D(remat=False, **tiny_kwargs)
    remat = UNet3D(remat=True, **tiny_kwargs)

    loss_p, (x, ts, ctx, fs) = _loss_fn(plain)
    loss_r, _ = _loss_fn(remat)
    params = plain.init(jax.random.key(0), x, ts, ctx, fs)
    # identical param tree: remat wrapping must not change names/shapes,
    # or checkpoints would not round-trip between the two modes
    params_r = remat.init(jax.random.key(0), x, ts, ctx, fs)
    chex = jax.tree_util.tree_structure
    assert chex(params) == chex(params_r)

    l0, g0 = jax.value_and_grad(loss_p)(params)
    l1, g1 = jax.value_and_grad(loss_r)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_remat_scan_combination_matches(tiny_kwargs):
    """remat + scan_blocks (the training configuration) against plain."""
    kw = dict(tiny_kwargs, num_res_blocks=2)  # scan groups need runs >= 2
    plain = UNet3D(remat=False, scan_blocks=False, **kw)
    both = UNet3D(remat=True, scan_blocks=True, **kw)

    loss_p, (x, ts, ctx, fs) = _loss_fn(plain)
    loss_b, _ = _loss_fn(both)
    params = plain.init(jax.random.key(1), x, ts, ctx, fs)

    from motionrag_tpu.training.checkpoints import adapt_block_layout

    p_scan = both.init(jax.random.key(1), x, ts, ctx, fs)
    params_b = adapt_block_layout(p_scan, jax.tree.map(np.asarray, params))
    l0 = float(loss_p(params))
    l1 = float(loss_b(params_b))
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
