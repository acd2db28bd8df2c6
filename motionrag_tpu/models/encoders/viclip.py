"""ViCLIP video encoder (InternVideo / OpenGVLab 'ViCLIP-L-14-hf') in Flax.

The reference scores ViClip-t2v/v2v with the trust_remote_code ViCLIP model
(reference ``src/metrics/viclip.py:12-54``). Architecture (InternVideo
viclip_vision.py, ViT-L/14 joint space-time attention):

  - Conv3d patch embed (1, 14, 14), no bias, width 1024
  - cls token prepended; SPATIAL positional embedding (257 x width) tiled
    over the T frames for patch tokens (cls uses row 0)
  - TEMPORAL positional embedding (num_frames x width) added per frame
  - ln_pre -> 24 CLIP ResidualAttentionBlocks (ln_1/attn/ln_2/MLP-gelu,
    packed in_proj qkv) over all 1 + T*L tokens -> ln_post on cls
  - projection to 768-d video feature

Weights port via ``utils/porting_metrics-style`` conventions in
``port_viclip_vision``. Built offline from the published topology; the
converter is golden-tested against a same-topology torch mirror
(tests/test_porting_metrics.py) — drop-in checkpoint loading is wired, and
any naming drift in the released file surfaces as unconsumed keys.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from motionrag_tpu.ops.attention import dot_product_attention

__all__ = ["ViCLIPVision", "port_viclip_vision"]


class _CLIPBlock(nn.Module):
    """CLIP ResidualAttentionBlock: ln_1 -> MHA (packed qkv, bias) -> ln_2 ->
    MLP (c_fc -> gelu -> c_proj). QuickGELU in original CLIP; ViCLIP uses
    standard gelu (InternVideo drops QuickGELU)."""

    dim: int
    heads: int
    quick_gelu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.heads
        attn = dot_product_attention(
            q.reshape(b, s, self.heads, hd),
            k.reshape(b, s, self.heads, hd),
            v.reshape(b, s, self.heads, hd),
        ).reshape(b, s, c)
        x = x + nn.Dense(c, dtype=self.dtype, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="c_fc")(h)
        if self.quick_gelu:
            h = h * nn.sigmoid(1.702 * h)
        else:
            h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(c, dtype=self.dtype, name="c_proj")(h)
        return x


class ViCLIPVision(nn.Module):
    image_size: int = 224
    patch_size: int = 14
    num_frames: int = 8
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    output_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        """[b, t, c, h, w] (ImageNet-normalized) -> [b, output_dim]."""
        b, t = video.shape[:2]
        x = video.transpose(0, 1, 3, 4, 2)  # [b, t, h, w, c]
        x = nn.Conv(
            self.dim, (1, self.patch_size, self.patch_size),
            strides=(1, self.patch_size, self.patch_size),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        l = x.shape[2] * x.shape[3]
        x = x.reshape(b, t * l, self.dim)

        cls = self.param("class_embedding", nn.initializers.normal(0.02), (self.dim,))
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02), (l + 1, self.dim)
        )
        tpos = self.param(
            "temporal_positional_embedding", nn.initializers.zeros,
            (1, self.num_frames, self.dim),
        )
        # patch tokens: spatial pos tiled over frames + per-frame temporal pos
        x = x + jnp.tile(pos[1:], (t, 1)).astype(x.dtype)
        x = x + jnp.repeat(tpos[0, :t], l, axis=0).astype(x.dtype)
        cls_tok = (cls + pos[0]).astype(x.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (b, 1, self.dim)), x], axis=1
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.depth):
            x = _CLIPBlock(self.dim, self.heads, dtype=self.dtype, name=f"resblocks_{i}")(x)
        cls_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (self.dim, self.output_dim)
        )
        return cls_out @ proj.astype(cls_out.dtype)


def port_viclip_vision(sd: dict, depth: int = 24, prefix: str = "vision_encoder.") -> dict:
    """ViCLIP vision-encoder state_dict -> ViCLIPVision params.

    Names follow the InternVideo ViCLIP module: conv1, class_embedding,
    positional_embedding, temporal_positional_embedding, ln_pre,
    transformer.resblocks.N.{ln_1, attn.in_proj_weight/bias,
    attn.out_proj, ln_2, mlp.c_fc, mlp.c_proj}, ln_post, proj."""
    sd = {k[len(prefix):] if k.startswith(prefix) else k: np.asarray(v)
          for k, v in sd.items()}

    def t(w):
        return np.asarray(w).T

    w = sd["conv1.weight"]  # [out, in, kt, kh, kw]
    p: dict = {
        "conv1": {"kernel": w.transpose(2, 3, 4, 1, 0)},
        "class_embedding": sd["class_embedding"].reshape(-1),
        "positional_embedding": sd["positional_embedding"],
        "temporal_positional_embedding": sd["temporal_positional_embedding"],
        "ln_pre": {"scale": sd["ln_pre.weight"], "bias": sd["ln_pre.bias"]},
        "ln_post": {"scale": sd["ln_post.weight"], "bias": sd["ln_post.bias"]},
        "proj": sd["proj"],
    }
    for i in range(depth):
        pre = f"transformer.resblocks.{i}"
        p[f"resblocks_{i}"] = {
            "ln_1": {"scale": sd[f"{pre}.ln_1.weight"], "bias": sd[f"{pre}.ln_1.bias"]},
            "in_proj": {"kernel": t(sd[f"{pre}.attn.in_proj_weight"]),
                        "bias": sd[f"{pre}.attn.in_proj_bias"]},
            "out_proj": {"kernel": t(sd[f"{pre}.attn.out_proj.weight"]),
                         "bias": sd[f"{pre}.attn.out_proj.bias"]},
            "ln_2": {"scale": sd[f"{pre}.ln_2.weight"], "bias": sd[f"{pre}.ln_2.bias"]},
            "c_fc": {"kernel": t(sd[f"{pre}.mlp.c_fc.weight"]),
                     "bias": sd[f"{pre}.mlp.c_fc.bias"]},
            "c_proj": {"kernel": t(sd[f"{pre}.mlp.c_proj.weight"]),
                       "bias": sd[f"{pre}.mlp.c_proj.bias"]},
        }
    return {"params": p}
