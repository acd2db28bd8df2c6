"""Motion projector family: Perceiver Resampler and the simpler projection
models. Flax re-design of the reference's ``condition/encoders/resampler.py``
(IP-Adapter-lineage): learned latent queries cross-attend to input tokens.

Checkpoint-compatible parameter structure (for the HF->JAX weight porter):
  latents, proj_in, proj_out, norm_out, layers_{i}.{attn,ff}.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from motionrag_tpu.ops.attention import dot_product_attention

__all__ = [
    "PerceiverAttention",
    "Resampler",
    "ImageProjModel",
    "VideoProjModel",
    "ActionProjModel",
]


class PerceiverAttention(nn.Module):
    """Latents attend to concat(inputs, latents)
    (reference ``resampler.py:66-105``)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        inner = self.dim_head * self.heads
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        latents = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(latents)
        b, l, _ = latents.shape

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        skv = kv_input.shape[1]
        q = q.reshape(b, l, self.heads, self.dim_head)
        k = k.reshape(b, skv, self.heads, self.dim_head)
        v = v.reshape(b, skv, self.heads, self.dim_head)
        out = dot_product_attention(q, k, v).reshape(b, l, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)


class _FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.dim * self.mult, use_bias=False, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default (exact erf)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="fc2")(x)


class Resampler(nn.Module):
    """Perceiver resampler (reference ``resampler.py:108-174``).

    ``video_length`` switches to per-frame queries (num_queries per frame);
    ``with_cls_token`` prepends one extra query returned separately.
    """

    dim: int = 1024
    depth: int = 8
    dim_head: int = 64
    heads: int = 16
    num_queries: int = 8
    embedding_dim: int = 768
    output_dim: int = 1024
    ff_mult: int = 4
    video_length: Optional[int] = None
    with_cls_token: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def cross_attention_dim(self) -> int:
        return self.output_dim

    @nn.compact
    def __call__(self, x, return_cls_tokens: bool = False):
        n_q = self.num_queries * (self.video_length or 1)
        if self.with_cls_token:
            n_q += 1
        latents = self.param(
            "latents",
            lambda key: jnp.asarray(
                jnp.sqrt(1.0 / self.dim)
                * jnp.asarray(
                    nn.initializers.normal(1.0)(key, (1, n_q, self.dim)), jnp.float32
                )
            ),
        )
        latents = jnp.broadcast_to(latents, (x.shape[0],) + latents.shape[1:]).astype(self.dtype)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(x)

        for i in range(self.depth):
            latents = (
                PerceiverAttention(
                    self.dim, self.dim_head, self.heads, self.dtype, name=f"layers_{i}_attn"
                )(x, latents)
                + latents
            )
            latents = _FeedForward(self.dim, self.ff_mult, self.dtype, name=f"layers_{i}_ff")(latents) + latents

        latents = nn.Dense(self.output_dim, dtype=self.dtype, name="proj_out")(latents)
        latents = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_out")(latents)

        if return_cls_tokens:
            assert self.with_cls_token, "with_cls_token must be True"
            return latents[:, 0], latents[:, 1:]
        if self.with_cls_token:
            return latents[:, 1:]
        return latents


class ImageProjModel(nn.Module):
    """CLIP pooled image embedding -> N context tokens (reference
    ``resampler.py:10-26``)."""

    cross_attention_dim: int = 1024
    clip_embeddings_dim: int = 1024
    clip_extra_context_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds):
        n, d = self.clip_extra_context_tokens, self.cross_attention_dim
        x = nn.Dense(n * d, dtype=self.dtype, name="proj")(image_embeds)
        x = x.reshape(-1, n, d)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class VideoProjModel(nn.Module):
    """Mean-pool video tokens -> N context tokens (reference
    ``resampler.py:29-41``)."""

    cross_attention_dim: int = 1024
    action_embeddings_dim: int = 1024
    context_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, action_embeds):
        pooled = jnp.mean(action_embeds, axis=1)
        n, d = self.context_tokens, self.cross_attention_dim
        x = nn.Dense(n * d, dtype=self.dtype, name="proj")(pooled)
        x = x.reshape(-1, n, d)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


def adaptive_avg_pool_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    """Torch AdaptiveAvgPool semantics on one axis: window i spans
    [floor(i*n/out), ceil((i+1)*n/out))."""
    n = x.shape[axis]
    pieces = []
    for i in range(out_size):
        lo = (i * n) // out_size
        hi = -(-((i + 1) * n) // out_size)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(lo, hi)
        pieces.append(jnp.mean(x[tuple(sl)], axis=axis, keepdims=True))
    return jnp.concatenate(pieces, axis=axis)


class ActionProjModel(nn.Module):
    """AdaptiveAvgPool3d over the (T,H,W) token grid + MLP (reference
    ``resampler.py:177-215``)."""

    dim: int = 1024
    depth: int = 2
    embedding_shape: tuple[int, int, int] = (8, 14, 14)
    embedding_dim: int = 768
    output_shape: tuple[int, int, int] = (2, 4, 4)
    dtype: jnp.dtype = jnp.float32

    @property
    def cross_attention_dim(self) -> int:
        return self.embedding_dim

    @nn.compact
    def __call__(self, action_embeds):
        t, h, w = self.embedding_shape
        b = action_embeds.shape[0]
        x = action_embeds.reshape(b, t, h, w, -1)
        for axis, out in zip((1, 2, 3), self.output_shape):
            x = adaptive_avg_pool_axis(x, axis, out)
        x = x.reshape(b, -1, x.shape[-1])
        x = nn.Dense(self.dim, dtype=self.dtype, name="mlp_0")(x)
        for i in range(self.depth):
            x = nn.gelu(x, approximate=False)
            x = nn.Dense(self.dim, dtype=self.dtype, name=f"mlp_{i + 1}")(x)
        return x
