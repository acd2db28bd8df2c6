"""T5 encoder stack (Flax) — CogVideoX's text conditioning path
(T5-XXL, 4096-d, 226 tokens; reference drives it through
``pipe.encode_prompt``, ``cogvideox/module.py:86-90``).

Faithful T5 v1.1 encoder math: relative position bias on the first layer
shared across layers, RMSNorm (no bias, pre-norm), gated-GELU MLP, no
absolute position embeddings. Weights port from HF ``T5EncoderModel``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from motionrag_tpu.ops.attention import dot_product_attention
from motionrag_tpu.ops.norms import rms_norm

__all__ = ["T5Encoder"]


def relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """T5 bidirectional relative position bucketing (numpy, static)."""
    ret = 0
    n = -relative_position
    num_buckets //= 2
    ret += (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    ret += np.where(is_small, n, val_if_large)
    return ret


class T5Attention(nn.Module):
    dim: int
    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, mask=None):
        b, s, _ = x.shape
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        # T5 does NOT scale by sqrt(d) (folded into init)
        qh = q.reshape(b, s, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        kh = k.reshape(b, s, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        vh = v.reshape(b, s, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        scores = scores + bias
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        probs = nn.softmax(scores, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, inner)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="o")(out)


class T5Block(nn.Module):
    dim: int
    heads: int
    head_dim: int
    ff_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bias, mask=None):
        ln = lambda name: self.param(name, nn.initializers.ones, (self.dim,))
        h = rms_norm(x, ln("ln1_scale"))
        x = x + T5Attention(self.dim, self.heads, self.head_dim, self.dtype, name="attn")(
            h, bias, mask
        )
        h = rms_norm(x, ln("ln2_scale"))
        wi0 = nn.Dense(self.ff_dim, use_bias=False, dtype=self.dtype, name="wi_0")(h)
        wi1 = nn.Dense(self.ff_dim, use_bias=False, dtype=self.dtype, name="wi_1")(h)
        h = nn.gelu(wi0, approximate=True) * wi1
        return x + nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="wo")(h)


class T5Encoder(nn.Module):
    """token ids [b, s] -> hidden states [b, s, dim]."""

    vocab_size: int = 32128
    dim: int = 4096
    depth: int = 24
    heads: int = 64
    head_dim: int = 64
    ff_dim: int = 10240
    num_buckets: int = 32
    max_distance: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        b, s = input_ids.shape
        emb_table = self.param(
            "token_embedding", nn.initializers.normal(1.0), (self.vocab_size, self.dim)
        )
        x = jnp.take(emb_table, input_ids, axis=0).astype(self.dtype)

        pos = np.arange(s)
        rel = pos[None, :] - pos[:, None]
        buckets = relative_position_bucket(rel, self.num_buckets, self.max_distance)
        bias_table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (self.num_buckets, self.heads),
        )
        bias = jnp.take(bias_table, jnp.asarray(buckets), axis=0)  # [s, s, h]
        bias = bias.transpose(2, 0, 1)[None].astype(jnp.float32)  # [1, h, s, s]

        for i in range(self.depth):
            x = T5Block(
                self.dim, self.heads, self.head_dim, self.ff_dim, self.dtype,
                name=f"blocks_{i}",
            )(x, bias, attention_mask)
        return rms_norm(x, self.param("final_ln_scale", nn.initializers.ones, (self.dim,)))
