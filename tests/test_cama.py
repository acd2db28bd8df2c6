"""CAMA stack tests: Resampler vs torch reference implementation,
ActionTransformer forward/batch_forward/predict shapes and causality."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionrag_tpu.models.cama import (
    ActionTransformer,
    CTLoss,
    SinusoidPositionalEmbeddings,
    smooth_l1_loss,
)
from motionrag_tpu.models.layers import TransformerEncoder
from motionrag_tpu.models.resampler import ActionProjModel, Resampler, adaptive_avg_pool_axis


class VideoStubEncoder(nn.Module):
    """Test stand-in for VideoMAE: [(bk), t, c, h, w] -> [(bk), L, D]."""

    dim: int = 32
    tokens: int = 6

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = x.reshape(b, self.tokens, -1)
        return nn.Dense(self.dim)(x)


class ImageStubEncoder(nn.Module):
    """Test stand-in for DINOv2: [(bk), c, h, w] -> [(bk), L, D]."""

    dim: int = 32
    tokens: int = 4

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = x.reshape(b, self.tokens, -1)
        return nn.Dense(self.dim)(x)


def make_at(num_queries=5, output_dim=64):
    return ActionTransformer(
        vision_model=VideoStubEncoder(),
        vision_proj=Resampler(
            dim=64, depth=1, dim_head=16, heads=4, num_queries=num_queries,
            embedding_dim=32, output_dim=output_dim,
        ),
        condition_model=ImageStubEncoder(),
        condition_proj=Resampler(
            dim=64, depth=1, dim_head=16, heads=4, num_queries=num_queries,
            embedding_dim=32, output_dim=output_dim,
        ),
        transformer=TransformerEncoder(num_layers=2, d_model=64, nhead=4, dim_feedforward=128),
        vision_pe=SinusoidPositionalEmbeddings(output_dim, 256),
        condition_pe=SinusoidPositionalEmbeddings(output_dim, 256),
    )


@pytest.fixture(scope="module")
def at_setup():
    model = make_at()
    b, k, t, c, h, w = 2, 3, 4, 3, 8, 8
    rng = np.random.default_rng(0)
    batch = {
        "ref_videos": jnp.asarray(rng.standard_normal((b, k, t, c, h, w)), jnp.float32),
        "video": jnp.asarray(rng.standard_normal((b, t, c, h, w)), jnp.float32),
    }
    videos = jnp.concatenate([batch["ref_videos"], batch["video"][:, None]], axis=1)
    params = model.init(jax.random.key(0), videos, videos[:, :, 0])
    return model, params, batch


def test_action_transformer_loss(at_setup):
    model, params, batch = at_setup
    loss = model.apply(params, batch, method="batch_forward")
    assert isinstance(loss, CTLoss)
    assert np.isfinite(float(loss.main))
    assert float(loss.mse) == float(loss.main)


def test_action_transformer_predict_shapes(at_setup):
    model, params, batch = at_setup
    emb = model.apply(params, batch, method="predict")
    assert emb.shape == (2, 5, 64)
    emb_cfg = model.apply(params, batch, do_classifier_free_guidance=True, method="predict")
    assert emb_cfg.shape == (4, 5, 64)
    # uncond half equals encoding of a zeros video
    np.testing.assert_allclose(np.asarray(emb_cfg[2:]), np.asarray(emb_cfg[2:]))


def test_action_transformer_causality(at_setup):
    """Prediction at the last position must not depend on the target video's
    own motion tokens beyond its first frame — but the block-causal layout
    means position t sees videos < t only. Perturbing the LAST ref video must
    change the target prediction; perturbing the TARGET video must not change
    predictions for earlier positions."""
    model, params, batch = at_setup
    videos = jnp.concatenate([jnp.flip(batch["ref_videos"], 1), batch["video"][:, None]], axis=1)
    conds = videos[:, :, 0]
    pred = model.apply(params, videos, conds, return_loss=False)

    # perturb target video (input position -1) -> predictions at earlier
    # positions unchanged (mask blocks future); its own prediction changes
    # only through the condition (first frame) which we keep fixed
    videos2 = videos.at[:, -1, 1:].add(1.0)  # keep first frame => same condition
    pred2 = model.apply(params, videos2, videos2[:, :, 0], return_loss=False)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred2), atol=1e-5)

    # perturb first (least-similar) ref video -> changes downstream preds
    videos3 = videos.at[:, 0].add(1.0)
    pred3 = model.apply(params, videos3, videos3[:, :, 0], return_loss=False)
    assert not np.allclose(np.asarray(pred[:, -1]), np.asarray(pred3[:, -1]), atol=1e-5)


def make_ct(cls=None, **kw):
    from motionrag_tpu.models.cama import ConditionTransformer
    from motionrag_tpu.models.layers import TransformerDecoder

    cls = cls or ConditionTransformer
    return cls(
        vision_model=ImageStubEncoder(),
        vision_proj=Resampler(
            dim=64, depth=1, dim_head=16, heads=4, num_queries=3,
            embedding_dim=32, output_dim=64,
        ),
        condition_model=ImageStubEncoder(),
        condition_proj=Resampler(
            dim=64, depth=1, dim_head=16, heads=4, num_queries=3,
            embedding_dim=32, output_dim=64,
        ),
        transformer=TransformerDecoder(num_layers=1, d_model=64, nhead=4,
                                       dim_feedforward=128),
        vision_pe=SinusoidPositionalEmbeddings(64, 256),
        **kw,
    )


def test_condition_transformer_forward_and_autoregressive():
    """ConditionTransformer (reference ``condition/module.py:88-198``):
    next-frame loss, and the autoregressive rollout — for t=2 one rollout
    step must equal the teacher-forced forward (same single-frame prefix)."""
    model = make_ct()
    b, t = 2, 4
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.standard_normal((b, t, 3, 8, 8)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, 3, 8, 8)), jnp.float32)
    params = model.init(jax.random.key(0), images, cond)

    loss = model.apply(params, images, cond, True)
    assert np.isfinite(float(loss))
    pred = model.apply(params, images, cond, False)
    assert pred.shape == (b, t, 3, 64)

    roll = model.apply(params, images, cond, method="autoregressive")
    assert roll.shape == (b, t, 3, 64)
    # frame 0 is the encoded gt frame in both
    np.testing.assert_allclose(np.asarray(roll[:, 0]), np.asarray(pred[:, 0]), rtol=1e-5)

    two = model.apply(params, images[:, :2], cond, method="autoregressive")
    tf_two = model.apply(params, images[:, :2], cond, False)
    np.testing.assert_allclose(np.asarray(two), np.asarray(tf_two), rtol=1e-4, atol=1e-5)


def test_skill_transformer_context_weighted_loss():
    """SkillTransformer (reference ``condition/module.py:201-245``):
    per-step condition flattening + optional context-weighted loss term."""
    from motionrag_tpu.models.cama import SkillTransformer

    b, t, steps = 2, 3, 2
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.standard_normal((b, t, 3, 8, 8)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, steps, 3, 8, 8)), jnp.float32)

    plain = make_ct(cls=SkillTransformer)
    weighted = make_ct(cls=SkillTransformer, context_weight=0.5)
    params = plain.init(jax.random.key(0), images, cond)

    emb = plain.apply(params, cond, method="encode_condition")
    assert emb.shape == (b, steps * 3, 64)  # steps flattened into tokens

    l0 = float(plain.apply(params, images, cond, True))
    l1 = float(weighted.apply(params, images, cond, True))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 > l0  # extra context term is non-negative and generically > 0


def test_resampler_matches_torch_reference(rng):
    """Golden test: our Resampler vs an independent torch implementation of
    the same math (perceiver attention with concat kv)."""
    import torch

    dim, depth, heads, dim_head, nq, ed, od = 16, 2, 2, 8, 3, 12, 20
    model = Resampler(
        dim=dim, depth=depth, dim_head=dim_head, heads=heads, num_queries=nq,
        embedding_dim=ed, output_dim=od,
    )
    x = rng.standard_normal((2, 7, ed), dtype=np.float32)
    params = model.init(jax.random.key(1), jnp.asarray(x))
    out = model.apply(params, jnp.asarray(x))
    assert out.shape == (2, nq, od)

    # torch recompute using the same parameters
    p = jax.tree.map(np.asarray, params["params"])
    tx = torch.from_numpy(x)
    latents = torch.from_numpy(p["latents"]).repeat(2, 1, 1)
    h = tx @ torch.from_numpy(p["proj_in"]["kernel"]) + torch.from_numpy(p["proj_in"]["bias"])
    inner = dim_head * heads
    for i in range(depth):
        a = p[f"layers_{i}_attn"]
        xin = torch.nn.functional.layer_norm(
            h, (dim,), torch.from_numpy(a["norm1"]["scale"]), torch.from_numpy(a["norm1"]["bias"])
        )
        lat = torch.nn.functional.layer_norm(
            latents, (dim,), torch.from_numpy(a["norm2"]["scale"]), torch.from_numpy(a["norm2"]["bias"])
        )
        q = lat @ torch.from_numpy(a["to_q"]["kernel"])
        kv = torch.cat([xin, lat], dim=-2) @ torch.from_numpy(a["to_kv"]["kernel"])
        k, v = kv.chunk(2, dim=-1)
        qh = q.view(2, -1, heads, dim_head).transpose(1, 2)
        kh = k.view(2, -1, heads, dim_head).transpose(1, 2)
        vh = v.view(2, -1, heads, dim_head).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(qh, kh, vh)
        o = o.transpose(1, 2).reshape(2, -1, inner)
        latents = o @ torch.from_numpy(a["to_out"]["kernel"]) + latents
        f = p[f"layers_{i}_ff"]
        ffx = torch.nn.functional.layer_norm(
            latents, (dim,), torch.from_numpy(f["norm"]["scale"]), torch.from_numpy(f["norm"]["bias"])
        )
        ffx = ffx @ torch.from_numpy(f["fc1"]["kernel"])
        ffx = torch.nn.functional.gelu(ffx)
        latents = ffx @ torch.from_numpy(f["fc2"]["kernel"]) + latents
    latents = latents @ torch.from_numpy(p["proj_out"]["kernel"]) + torch.from_numpy(p["proj_out"]["bias"])
    ref = torch.nn.functional.layer_norm(
        latents, (od,), torch.from_numpy(p["norm_out"]["scale"]), torch.from_numpy(p["norm_out"]["bias"])
    ).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_adaptive_avg_pool_matches_torch(rng):
    import torch

    x = rng.standard_normal((1, 8, 14, 14, 4), dtype=np.float32)
    out = jnp.asarray(x)
    for axis, o in zip((1, 2, 3), (2, 4, 4)):
        out = adaptive_avg_pool_axis(out, axis, o)
    ref = torch.nn.functional.adaptive_avg_pool3d(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3), (2, 4, 4)
    ).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_smooth_l1_matches_torch(rng):
    import torch

    a = rng.standard_normal((4, 5), dtype=np.float32)
    b = rng.standard_normal((4, 5), dtype=np.float32)
    ours = float(smooth_l1_loss(jnp.asarray(a), jnp.asarray(b)))
    ref = float(torch.nn.functional.smooth_l1_loss(torch.from_numpy(a), torch.from_numpy(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
