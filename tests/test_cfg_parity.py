"""CFG dropout / unconditional-branch parity (reference semantics):

- correlated 5/5/5 dropout bands from one uniform draw
  (reference ddpm3d.py:1112-1123)
- text dropout / inference uncond = ENCODED null prompt ""
  (ddpm3d.py:1124, inference.py:242-245)
- image dropout / inference uncond = zeroed image through CLIP
  (ddpm3d.py:1125-1135, inference.py:247-248)
- action uncond = zeros video through the action path, identical between
  training dropout and inference (ddpm3d.py:1314, 1352-1355;
  inference.py:249-258)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionrag_tpu.models.dynamicrafter.module import (
    DynamiCrafterActionModule,
    DynamiCrafterCTModule,
    DynamiCrafterModule,
    cfg_dropout_bands,
)
from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D
from motionrag_tpu.models.dynamicrafter.vae import AutoencoderKL2D
from motionrag_tpu.models.encoders.clip_text import CLIPTextEncoder
from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder, VideoMAEEmbedder
from motionrag_tpu.models.resampler import Resampler


def test_dropout_bands_are_correlated():
    p, b = 0.1, 8192
    key = jax.random.key(0)
    drop_text, drop_img = cfg_dropout_bands(key, b, p)
    u = jax.random.uniform(key, (b,))
    np.testing.assert_array_equal(np.asarray(drop_text), np.asarray(u < 2 * p))
    np.testing.assert_array_equal(
        np.asarray(drop_img), np.asarray((u >= p) & (u < 3 * p))
    )
    both = np.asarray(drop_text & drop_img)
    only_text = np.asarray(drop_text & ~drop_img)
    only_img = np.asarray(drop_img & ~drop_text)
    # each band is one uncond_prob wide
    for frac in (both.mean(), only_text.mean(), only_img.mean()):
        assert abs(frac - p) < 0.02
    # bands partition [0, 3p): both <=> u in [p, 2p)
    np.testing.assert_array_equal(both, np.asarray((u >= p) & (u < 2 * p)))


def _tiny_module(cls=DynamiCrafterModule, **extra):
    kw = dict(
        unet=UNet3D(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                    attention_resolutions=(1, 2), num_head_channels=16,
                    context_dim=32, dtype=jnp.float32,
                    action_cross_attention=cls is not DynamiCrafterModule),
        vae=AutoencoderKL2D(block_out_channels=(32, 32, 32, 32), dtype=jnp.float32),
        text_encoder=CLIPTextEncoder(vocab_size=100, max_length=77, dim=32, depth=2,
                                     heads=2, dtype=jnp.float32),
        image_encoder=CLIPImageEmbedder(image_size=28, patch_size=14, dim=32, depth=1,
                                        heads=2, pooled=False, dtype=jnp.float32),
        image_proj=Resampler(dim=32, depth=1, dim_head=8, heads=4, num_queries=3,
                             embedding_dim=32, output_dim=32, video_length=4,
                             dtype=jnp.float32),
        null_prompt_ids=[49, 50],
        dtype=jnp.float32,
    )
    kw.update(extra)
    return cls(**kw)


@pytest.fixture(scope="module")
def dc_batch():
    rng = np.random.default_rng(0)
    return {
        "video": jnp.asarray(rng.uniform(-1, 1, (1, 4, 3, 32, 32)), jnp.float32),
        "prompt_ids": jnp.asarray(rng.integers(0, 100, (1, 77)), jnp.int32),
        "ref_videos": jnp.asarray(rng.uniform(-1, 1, (1, 2, 4, 3, 32, 32)), jnp.float32),
    }


def test_dc_uncond_context_matches_training_substitutes(dc_batch):
    """The inference uncond prompt/image context must equal exactly what the
    training dropout substitutes (encoded "" / CLIP(zero image))."""
    module = _tiny_module()
    params = module.init_params(jax.random.key(0), dc_batch)

    c_concat, prompt, uncond_prompt, image_ctx, uncond_image_ctx = (
        module.pipe._conditioning(
            params, dc_batch["video"], dc_batch["prompt_ids"], None, 4
        )
    )
    b = dc_batch["video"].shape[0]
    # text: encoded null prompt (NOT a zeros embedding)
    train_null = module.text_encoder.apply(
        params["text_encoder"], module.null_ids(b, 77)
    )
    np.testing.assert_allclose(
        np.asarray(uncond_prompt), np.asarray(train_null), rtol=1e-3, atol=1e-5
    )
    assert np.abs(np.asarray(uncond_prompt)).sum() > 0  # it's an encoding
    # image: zeroed image through CLIP+proj (NOT a zeroed embedding)
    train_img_uncond = module.image_context(
        params, jnp.zeros_like(dc_batch["video"][:, 0])
    )
    np.testing.assert_allclose(
        np.asarray(uncond_image_ctx), np.asarray(train_img_uncond), rtol=1e-3, atol=1e-5
    )
    assert np.abs(np.asarray(uncond_image_ctx)).sum() > 0


def _action_modules():
    vm = VideoMAEEmbedder(num_frames=4, image_size=32, dim=32, depth=1, heads=2,
                          dtype=jnp.float32)
    proj = Resampler(dim=32, depth=1, dim_head=8, heads=4, num_queries=4,
                     embedding_dim=32, output_dim=32, dtype=jnp.float32)
    action = _tiny_module(
        DynamiCrafterActionModule, action_embedder=vm, action_proj=proj,
        ref_fusion_type="mean", action_uncond_prob=1.0,
    )
    from motionrag_tpu.models.cama import ActionTransformer, SinusoidPositionalEmbeddings
    from motionrag_tpu.models.encoders.condition import DINOImageEmbedder
    from motionrag_tpu.models.layers import TransformerEncoder

    ct = ActionTransformer(
        vision_model=VideoMAEEmbedder(num_frames=4, image_size=32, dim=32, depth=1,
                                      heads=2, dtype=jnp.float32),
        vision_proj=Resampler(dim=32, depth=1, dim_head=8, heads=4, num_queries=4,
                              embedding_dim=32, output_dim=32, dtype=jnp.float32),
        condition_model=DINOImageEmbedder(image_size=28, dim=32, depth=1, heads=2,
                                          dtype=jnp.float32),
        condition_proj=Resampler(dim=32, depth=1, dim_head=8, heads=4, num_queries=4,
                                 embedding_dim=32, output_dim=32, dtype=jnp.float32),
        transformer=TransformerEncoder(num_layers=1, d_model=32, nhead=4,
                                       dim_feedforward=64),
        vision_pe=SinusoidPositionalEmbeddings(32, 256),
        condition_pe=SinusoidPositionalEmbeddings(32, 256),
    )
    ct_module = _tiny_module(
        DynamiCrafterCTModule, condition_transformer=ct, action_uncond_prob=1.0,
    )
    return action, ct_module


def test_dc_action_uncond_matches_training_dropout_branch(dc_batch):
    """With dropout probability forced to 1, the training action branch must
    equal the inference uncond_action_context for both Action and CT."""
    action_mod, ct_mod = _action_modules()
    for module in (action_mod, ct_mod):
        params = module.init_params(jax.random.key(0), dc_batch)
        trained = module.action_context(params, dc_batch, jax.random.key(1), train=True)
        uncond = module.uncond_action_context(params, dc_batch)
        np.testing.assert_allclose(
            np.asarray(trained), np.asarray(uncond), rtol=2e-4, atol=1e-5,
            err_msg=type(module).__name__,
        )


def test_cogvideox_negative_prompt_is_encoded_null():
    """The CogVideoX pipeline's default negative prompt is T5("") encoded,
    not a zeros embedding (diffusers encodes negative_prompt="")."""
    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D
    from motionrag_tpu.models.cogvideox.pipeline import CogVideoXImageToVideoPipeline
    from motionrag_tpu.models.cogvideox.vae3d import CogVideoXVAE
    from motionrag_tpu.models.encoders.t5 import T5Encoder

    t5 = T5Encoder(vocab_size=64, dim=32, depth=1, heads=2, dtype=jnp.float32)
    pipe = CogVideoXImageToVideoPipeline(
        CogVideoXTransformer3D(depth=1, dim=32, heads=2, text_embed_dim=32,
                               dtype=jnp.float32),
        CogVideoXVAE(block_out_channels=(8, 8, 8, 8), dtype=jnp.float32),
        t5, dtype=jnp.float32,
    )
    ids = jnp.asarray(np.random.default_rng(0).integers(2, 64, (1, 8)), jnp.int32)
    params = {"text_encoder": t5.init(jax.random.key(0), ids)}
    prompt_embeds = pipe.encode_prompt(params, ids)
    null_ids = jnp.pad(pipe.null_prompt_ids, (0, 8 - pipe.null_prompt_ids.shape[0]))
    expect = pipe.encode_prompt(params, jnp.broadcast_to(null_ids[None], (1, 8)))
    # reproduce the default-negative-ids construction from __call__
    got_ids = pipe.null_prompt_ids[: prompt_embeds.shape[1]]
    got_ids = jnp.pad(got_ids, (0, prompt_embeds.shape[1] - got_ids.shape[0]))
    got = pipe.encode_prompt(params, jnp.broadcast_to(got_ids[None], (1, 8)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-6)
    assert np.abs(np.asarray(got)).sum() > 0
