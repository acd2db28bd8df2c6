"""Golden forward-parity tests: our Flax encoders vs randomly-initialized
HF transformers models (tiny configs, no downloads) through the weight
porters. These pin down architecture + converter correctness so the real
pretrained checkpoints port with known fidelity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from motionrag_tpu.models.encoders.clip_text import CLIPTextEncoder
from motionrag_tpu.models.encoders.t5 import T5Encoder
from motionrag_tpu.models.encoders.vit import VisionTransformer
from motionrag_tpu.utils import porting

TOL = dict(atol=2e-4, rtol=2e-3)


def test_videomae_parity(rng):
    from transformers import VideoMAEConfig, VideoMAEModel

    cfg = VideoMAEConfig(
        image_size=32, patch_size=8, num_channels=3, num_frames=4, tubelet_size=2,
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, use_mean_pooling=False,
    )
    torch.manual_seed(0)
    hf = VideoMAEModel(cfg).eval()
    ours = VisionTransformer(
        variant="videomae", image_size=32, patch_size=8, num_frames=4,
        tubelet_size=2, dim=32, depth=2, heads=2, mlp_ratio=2.0,
    )
    params = porting.port_videomae(hf.state_dict(), depth=2)

    x = rng.standard_normal((1, 4, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(x)).last_hidden_state.numpy()
    out = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, **TOL)


def test_dinov2_parity(rng):
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        image_size=28, patch_size=14, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, mlp_ratio=4, layerscale_value=1.0,
    )
    torch.manual_seed(0)
    hf = Dinov2Model(cfg).eval()
    ours = VisionTransformer(
        variant="dino", image_size=28, patch_size=14, dim=32, depth=2, heads=2,
        layerscale_init=1.0,
    )
    params = porting.port_dinov2(hf.state_dict(), depth=2)

    x = rng.standard_normal((1, 3, 28, 28), dtype=np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(x)).last_hidden_state.numpy()
    out = np.asarray(ours.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, **TOL)


def test_clip_vision_parity(rng):
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(
        image_size=28, patch_size=14, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, projection_dim=16,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(cfg).eval()
    ours = VisionTransformer(
        variant="clip", image_size=28, patch_size=14, dim=32, depth=2, heads=2,
        projection_dim=16, mlp_ratio=2.0,
    )
    params = porting.port_clip_vision(hf.state_dict(), depth=2)

    x = rng.standard_normal((1, 3, 28, 28), dtype=np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(x)).image_embeds.numpy()
    out = np.asarray(ours.apply(params, jnp.asarray(x), return_pooled=True))
    np.testing.assert_allclose(out, ref, **TOL)


def test_clip_text_parity(rng):
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=64, max_position_embeddings=16,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(cfg).eval()
    ours = CLIPTextEncoder(
        vocab_size=100, max_length=16, dim=32, depth=3, heads=2, mlp_ratio=2.0,
    )
    params = porting.port_clip_text(hf.state_dict(), depth=3)

    ids = rng.integers(1, 99, (2, 16))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    out = np.asarray(ours.apply(params, jnp.asarray(ids), penultimate=False))
    np.testing.assert_allclose(out, ref, **TOL)


def test_t5_parity(rng):
    from transformers import T5Config, T5EncoderModel

    cfg = T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8, relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(cfg).eval()
    ours = T5Encoder(
        vocab_size=100, dim=32, depth=2, heads=4, head_dim=8, ff_dim=64,
        num_buckets=8, max_distance=16,
    )
    params = porting.port_t5_encoder(hf.state_dict(), depth=2)

    ids = rng.integers(1, 99, (2, 10))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    out = np.asarray(ours.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(out, ref, **TOL)
