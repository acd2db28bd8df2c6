"""Shape/semantics smoke tests for the auxiliary condition encoders
(reference ``condition/encoders/condition.py:465-598`` SDXL/Kolors variants,
lvdm ``condition.py:383-398`` FrozenCLIPT5Encoder) at tiny configs."""

import jax
import jax.numpy as jnp

from motionrag_tpu.models.encoders.condition import (
    CLIPImageEmbedder,
    FrozenCLIPT5Encoder,
    KolorsImageEmbedder,
    SDXLImageEmbedder,
)


def _tiny(cls, **kw):
    return cls(image_size=28, patch_size=14, dim=16, depth=2, heads=2,
               projection_dim=8, **kw)


def test_sdxl_kolors_embedders_token_output():
    """Both IP-Adapter towers return penultimate *tokens* (reference
    ``forward`` -> hidden_states[-2]), not the pooled projection."""
    img = jnp.zeros((2, 3, 40, 64))
    for cls in (SDXLImageEmbedder, KolorsImageEmbedder):
        m = _tiny(cls)
        assert m.pooled is False and m.resize_mode == "crop"
        params = m.init(jax.random.key(0), img)
        out = m.apply(params, img)
        assert out.shape == (2, (28 // 14) ** 2 + 1, 16)


def test_kolors_defaults_vit_l_336():
    m = KolorsImageEmbedder()
    assert (m.image_size, m.dim, m.depth, m.heads) == (336, 1024, 24, 16)


def test_clip_image_uncond_matches_zero_pixvalues():
    """uncond=True reproduces the reference's get_uncond_emb: all-zero
    pixel_values through the tower — independent of the input image."""
    m = _tiny(CLIPImageEmbedder, pooled=False, resize_mode="crop")
    img = jax.random.uniform(jax.random.key(1), (1, 3, 32, 32), minval=-1, maxval=1)
    params = m.init(jax.random.key(0), img)
    a = m.apply(params, img, uncond=True)
    b = m.apply(params, -jnp.ones_like(img), uncond=True)
    assert jnp.allclose(a, b)
    assert not jnp.allclose(a, m.apply(params, img))


def test_frozen_clip_t5_encoder_pair():
    m = FrozenCLIPT5Encoder(
        clip_kwargs=dict(vocab_size=64, dim=16, depth=2, heads=2, projection_dim=8),
        t5_kwargs=dict(vocab_size=64, dim=16, depth=1, heads=2, head_dim=8, ff_dim=32),
    )
    clip_ids = jnp.zeros((2, 7), jnp.int32)
    t5_ids = jnp.zeros((2, 9), jnp.int32)
    params = m.init(jax.random.key(0), clip_ids, t5_ids)
    clip_z, t5_z = m.apply(params, clip_ids, t5_ids)
    assert clip_z.shape == (2, 7, 16)
    assert t5_z.shape == (2, 9, 16)
