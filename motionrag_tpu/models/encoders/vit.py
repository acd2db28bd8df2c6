"""Configurable Vision Transformer covering the encoder zoo the reference
pulls from HF (SURVEY.md §2.3): CLIP-ViT (cls token, pre/post LN, pooled
projection), DINOv2 (cls token, layerscale), VideoMAE (3D tubelet patch
embed, no cls, fixed sin-cos positions). One Flax module, frozen at use
sites; weights come from the HF->JAX porter (utils/porting.py).

Reference encoder wrappers: ``condition/encoders/condition.py:360-604`` and
the vendored ViT ``condition/encoders/vit.py:310-516``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from motionrag_tpu.ops.attention import dot_product_attention

__all__ = ["VisionTransformer", "sincos_pos_embed_2d", "sincos_pos_embed_1d"]


def sincos_pos_embed_1d(dim: int, positions: np.ndarray) -> np.ndarray:
    omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("p,d->pd", positions.astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def sincos_pos_embed_2d(dim: int, grid_h: int, grid_w: int) -> np.ndarray:
    gh = np.arange(grid_h, dtype=np.float64)
    gw = np.arange(grid_w, dtype=np.float64)
    grid = np.meshgrid(gw, gh)  # w goes first (mae convention)
    grid = np.stack(grid, axis=0).reshape(2, -1)
    emb_h = sincos_pos_embed_1d(dim // 2, grid[1])
    emb_w = sincos_pos_embed_1d(dim // 2, grid[0])
    return np.concatenate([emb_w, emb_h], axis=1)


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    layerscale_init: Optional[float] = None
    ln_eps: float = 1e-6
    qkv_bias_style: str = "packed"  # 'packed' (HF) or 'beit' (VideoMAEv2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, c = x.shape
        head_dim = c // self.heads
        ln = lambda name: nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name=name)

        h = ln("norm1")(x)
        if self.qkv_bias_style == "beit":
            # VideoMAEv2 / BEiT: bias-free packed qkv plus separate q/v bias
            # params, k bias fixed at zero (reference vit.py:158-175)
            qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype, name="qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
            q = q + q_bias.astype(q.dtype)
            v = v + v_bias.astype(v.dtype)
        else:
            qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = dot_product_attention(
            q.reshape(b, s, self.heads, head_dim),
            k.reshape(b, s, self.heads, head_dim),
            v.reshape(b, s, self.heads, head_dim),
        ).reshape(b, s, c)
        attn = nn.Dense(c, dtype=self.dtype, name="proj")(attn)
        if self.layerscale_init is not None:
            g1 = self.param("ls1", nn.initializers.constant(self.layerscale_init), (c,))
            attn = attn * g1.astype(attn.dtype)
        x = x + attn

        h = ln("norm2")(x)
        h = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        if self.layerscale_init is not None:
            g2 = self.param("ls2", nn.initializers.constant(self.layerscale_init), (c,))
            h = h * g2.astype(h.dtype)
        return x + h


class _ViTScanCell(nn.Module):
    """nn.scan cell for :class:`VisionTransformer` ``scan_blocks`` mode:
    carry = (hidden, prev_hidden); wraps ``ViTBlock`` under name='block' so
    the stacked tree is ``blocks/block/...`` with a leading depth axis."""

    dim: int
    heads: int
    mlp_ratio: float
    layerscale_init: Optional[float]
    ln_eps: float
    qkv_bias_style: str
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, _):
        hidden, _prev = carry
        new = ViTBlock(
            self.dim, self.heads, self.mlp_ratio, self.layerscale_init,
            self.ln_eps, qkv_bias_style=self.qkv_bias_style,
            dtype=self.dtype, name="block",
        )(hidden)
        return (new, hidden), None


class VisionTransformer(nn.Module):
    """Generic ViT.

    variant:
      'clip'     2D patches, cls token, learned pos, ln_pre + ln_post,
                 optional pooled ``projection_dim`` output.
      'dino'     2D patches, cls token, learned pos, layerscale, final LN,
                 returns all tokens (cls first) — DINOv2 last_hidden_state.
      'videomae' 3D tubelet patches over [b, t, c, h, w], no cls, fixed
                 sin-cos pos, final LN, returns all tokens.
      'videomae2' the actual VideoMAEv2 architecture (reference
                 condition.py:403-462 + vendored vit.py:310-516): tubelet
                 patches, sin-cos pos, BEiT-style q/v bias (bias-free packed
                 qkv + separate q_bias/v_bias, k zero), LN eps 1e-6, and NO
                 final norm (forward_features returns the block output —
                 use_mean_pooling makes self.norm an Identity).
    """

    variant: str = "clip"
    image_size: int = 224
    patch_size: int = 14
    num_frames: int = 16
    tubelet_size: int = 2
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    projection_dim: Optional[int] = None
    layerscale_init: Optional[float] = None
    ln_eps: Optional[float] = None  # default per variant
    dtype: jnp.dtype = jnp.float32
    # compile the depth-N stack as ONE nn.scan'd block instead of N unrolled
    # copies (~depth-x smaller HLO; the frozen-encoder training-step graphs
    # — 24-deep DINOv2-L + VideoMAE inside one fused CAMA train step — blew
    # past the remote compile service's budget unrolled). Param layout:
    # ``blocks/block/...`` with a leading depth axis instead of
    # ``blocks_{i}/...``; checkpoints/porters convert automatically via
    # training/checkpoints.adapt_block_layout.
    scan_blocks: bool = False

    @property
    def _ln_eps(self) -> float:
        if self.ln_eps is not None:
            return self.ln_eps
        # HF defaults: VideoMAE 1e-12, DINOv2 1e-6, CLIP 1e-5; the vendored
        # VideoMAEv2 vit uses 1e-6 (vit_large factory, vit.py:485)
        return {"videomae": 1e-12, "videomae2": 1e-6, "dino": 1e-6, "clip": 1e-5}[self.variant]

    @nn.compact
    def __call__(self, x, return_pooled: bool = False, penultimate: bool = False,
                 raw_tokens: bool = False):
        if self.variant in ("videomae", "videomae2"):
            # x: [b, t, c, h, w] -> tubelet conv3d, NDHWC
            b = x.shape[0]
            x = x.transpose(0, 1, 3, 4, 2)  # [b, t, h, w, c]
            x = nn.Conv(
                self.dim,
                (self.tubelet_size, self.patch_size, self.patch_size),
                strides=(self.tubelet_size, self.patch_size, self.patch_size),
                dtype=self.dtype,
                name="patch_embed",
            )(x)
            tokens = x.reshape(b, -1, self.dim)
            # HF VideoMAE fixed table: interleaved sin/cos over the flat
            # (t/2 * h/p * w/p) token sequence
            from motionrag_tpu.ops.posemb import sinusoid_table

            pos = sinusoid_table(tokens.shape[1], self.dim)
            tokens = tokens + pos[None].astype(tokens.dtype)
        else:
            # x: [b, c, h, w] (torch layout in, converted to NHWC)
            b = x.shape[0]
            x = x.transpose(0, 2, 3, 1)
            x = nn.Conv(
                self.dim,
                (self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
                use_bias=self.variant != "clip",
                dtype=self.dtype,
                name="patch_embed",
            )(x)
            tokens = x.reshape(b, -1, self.dim)
            n_tok = tokens.shape[1] + 1
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(tokens.dtype), (b, 1, self.dim)), tokens], axis=1
            )
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02), (1, n_tok, self.dim)
            )
            tokens = tokens + pos.astype(tokens.dtype)
            if self.variant == "clip":
                tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(tokens)

        hidden = tokens
        penult = tokens  # depth<2 degenerate case: embeddings themselves
        block_kw = dict(
            dim=self.dim, heads=self.heads, mlp_ratio=self.mlp_ratio,
            layerscale_init=self.layerscale_init, ln_eps=self._ln_eps,
            qkv_bias_style="beit" if self.variant == "videomae2" else "packed",
            dtype=self.dtype,
        )
        if self.scan_blocks:
            stack = nn.scan(
                _ViTScanCell,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.depth,
            )(**block_kw, name="blocks")
            # carry = (hidden, previous hidden) so the penultimate tap (the
            # input to the last block) survives the scan without storing
            # per-step outputs
            (hidden, penult), _ = stack((hidden, hidden), None)
        else:
            for i in range(self.depth):
                hidden = ViTBlock(**block_kw, name=f"blocks_{i}")(hidden)
                if penultimate and i == self.depth - 2:
                    penult = hidden

        if penultimate:
            return penult
        if raw_tokens:
            # all blocks, NO ln_post — the OpenCLIP-V2 token contract
            # (reference condition.py:263-341 encode_with_vision_transformer
            # returns the transformer output directly)
            return hidden

        if self.variant == "videomae2":
            # forward_features returns the raw block output (reference
            # condition.py:434-450; use_mean_pooling -> norm is Identity)
            return hidden
        out = nn.LayerNorm(epsilon=self._ln_eps, dtype=self.dtype, name="ln_post")(hidden)
        if self.variant == "clip" and (return_pooled or self.projection_dim):
            pooled = out[:, 0]
            if self.projection_dim:
                pooled = nn.Dense(
                    self.projection_dim, use_bias=False, dtype=self.dtype, name="visual_projection"
                )(pooled)
            if return_pooled:
                return pooled
        return out
