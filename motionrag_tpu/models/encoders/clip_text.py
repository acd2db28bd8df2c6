"""CLIP text encoder (OpenCLIP-compatible): causal transformer over BPE
token ids with penultimate-layer output option — DynamiCrafter's text
conditioning path (reference ``condition/encoders/condition.py:137-201``
FrozenOpenCLIPEmbedder with layer='penultimate').

Tokenization happens host-side (ids in, like the T5 path); the reference's
``text_cache.py`` precompute pattern is the recommended route offline.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from motionrag_tpu.ops.attention import dot_product_attention

__all__ = ["CLIPTextEncoder"]


class CLIPTextEncoder(nn.Module):
    """token ids [b, 77] -> [b, 77, dim] (penultimate or final LN) or pooled
    projected embedding."""

    vocab_size: int = 49408
    max_length: int = 77
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    projection_dim: int = 1024
    use_quick_gelu: bool = False  # OpenCLIP-H uses plain gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, penultimate: bool = True, return_pooled: bool = False):
        b, s = input_ids.shape
        table = self.param(
            "token_embedding", nn.initializers.normal(0.02), (self.vocab_size, self.dim)
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (self.max_length, self.dim)
        )
        x = jnp.take(table, input_ids, axis=0).astype(self.dtype)
        x = x + pos[:s].astype(self.dtype)

        causal = jnp.tril(jnp.ones((s, s), bool))
        penult = None
        for i in range(self.depth):
            x = _block(self, i)(x, causal)
            if i == self.depth - 2:
                penult = x
        if penultimate and not return_pooled:
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(penult)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        if return_pooled:
            eos = jnp.argmax(input_ids, axis=-1)  # highest id = eot token
            pooled = out[jnp.arange(b), eos]
            return nn.Dense(
                self.projection_dim, use_bias=False, dtype=self.dtype, name="text_projection"
            )(pooled)
        return out


def _block(parent: CLIPTextEncoder, i: int):
    class _Blk(nn.Module):
        dtype: jnp.dtype = parent.dtype

        @nn.compact
        def __call__(self, x, mask):
            b, s, c = x.shape
            heads = parent.heads
            head_dim = c // heads
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
            qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            attn = dot_product_attention(
                q.reshape(b, s, heads, head_dim),
                k.reshape(b, s, heads, head_dim),
                v.reshape(b, s, heads, head_dim),
                mask=mask,
            ).reshape(b, s, c)
            x = x + nn.Dense(c, dtype=self.dtype, name="proj")(attn)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
            h = nn.Dense(int(parent.mlp_ratio * c), dtype=self.dtype, name="fc1")(h)
            if parent.use_quick_gelu:
                h = h * nn.sigmoid(1.702 * h)
            else:
                h = nn.gelu(h, approximate=False)
            h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
            return x + h

    return _Blk(name=f"blocks_{i}")
