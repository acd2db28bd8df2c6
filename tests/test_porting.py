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


def test_torch_transformer_encoder_parity(rng):
    from motionrag_tpu.models.layers import TransformerEncoder
    from motionrag_tpu.ops.attention import block_causal_mask

    d, h, ff, depth = 32, 4, 64, 2
    torch.manual_seed(0)
    layer = torch.nn.TransformerEncoderLayer(
        d, h, ff, dropout=0.0, activation="gelu", batch_first=True, norm_first=False
    )
    hf = torch.nn.TransformerEncoder(layer, depth).eval()
    ours = TransformerEncoder(num_layers=depth, d_model=d, nhead=h, dim_feedforward=ff)
    params = porting.port_torch_transformer_encoder(hf.state_dict(), depth=depth)

    x = rng.standard_normal((2, 12, d), dtype=np.float32)
    # block-causal mask: torch uses True=blocked float('-inf') convention
    ours_mask = block_causal_mask(4, 3)
    torch_mask = ~torch.from_numpy(np.asarray(ours_mask))
    with torch.no_grad():
        ref = hf(torch.from_numpy(x), mask=torch_mask).numpy()
    out = np.asarray(ours.apply(params, jnp.asarray(x), mask=ours_mask))
    np.testing.assert_allclose(out, ref, **TOL)


def test_resampler_porter_roundtrip(rng):
    """Build a torch-like state dict with the reference Resampler naming and
    check the ported params drive our Resampler (shape-compatible with its
    init tree)."""
    from motionrag_tpu.models.resampler import Resampler

    dim, depth, heads, dh, nq, ed, od = 16, 2, 2, 8, 3, 12, 20
    inner = heads * dh
    g = torch.Generator().manual_seed(0)
    t = lambda *s: torch.randn(*s, generator=g)
    sd = {"latents": t(1, nq, dim),
          "proj_in.weight": t(dim, ed), "proj_in.bias": t(dim),
          "proj_out.weight": t(od, dim), "proj_out.bias": t(od),
          "norm_out.weight": t(od), "norm_out.bias": t(od)}
    for i in range(depth):
        sd.update({
            f"layers.{i}.0.norm1.weight": t(dim), f"layers.{i}.0.norm1.bias": t(dim),
            f"layers.{i}.0.norm2.weight": t(dim), f"layers.{i}.0.norm2.bias": t(dim),
            f"layers.{i}.0.to_q.weight": t(inner, dim),
            f"layers.{i}.0.to_kv.weight": t(2 * inner, dim),
            f"layers.{i}.0.to_out.weight": t(dim, inner),
            f"layers.{i}.1.0.weight": t(dim), f"layers.{i}.1.0.bias": t(dim),
            f"layers.{i}.1.1.weight": t(4 * dim, dim),
            f"layers.{i}.1.3.weight": t(dim, 4 * dim),
        })
    params = porting.port_resampler(sd, depth=depth)
    model = Resampler(dim=dim, depth=depth, dim_head=dh, heads=heads,
                      num_queries=nq, embedding_dim=ed, output_dim=od)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 5, ed)))
    ref_shapes = jax.tree.map(lambda l: l.shape, ref)
    new_shapes = jax.tree.map(lambda l: l.shape, params)
    assert ref_shapes == new_shapes
    out = model.apply(params, jnp.asarray(rng.standard_normal((2, 5, ed), dtype=np.float32)))
    assert out.shape == (2, nq, od)
