"""GTE-v1.5 text encoder (Alibaba-NLP/gte-base-en-v1.5) in Flax.

The reference's entire RAG retrieval quality rests on this model: it embeds
every caption at database build time and every query at retrieval time
(reference ``tools/build_rag_database.py:17-33``,
``src/data/datamodule.py:296-304`` via sentence-transformers).

Architecture = the HF ``NewModel`` custom code the checkpoint ships with
(trust_remote_code): a post-LN BERT body with
  * RoPE (rotate-half, non-interleaved) on q/k instead of absolute position
    embeddings — ``rope_theta`` from the checkpoint config,
  * packed ``qkv_proj``,
  * gated-GELU MLP: ``up_gate_proj`` -> split(up, gate) -> gelu(gate) * up
    -> ``down_proj``,
  * LayerNorm eps 1e-12,
and the sentence-transformers head: CLS pooling + L2 normalization.

Weight porting: ``utils.porting.port_gte``; golden-tested against a
HF-keyed torch mirror in ``tests/test_gte.py`` (the real checkpoint cannot
be downloaded in this environment — the mirror pins every contract above so
a released state dict drops in unchanged).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["GTEEncoder"]


def _rope(x: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotate-half RoPE over [b, s, h, d] (positions 0..s-1)."""
    b, s, h, d = x.shape
    half = d // 2
    freq = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = jnp.arange(s, dtype=jnp.float32)[:, None] * freq[None, :]  # [s, half]
    cos = jnp.cos(ang)[None, :, None, :]
    sin = jnp.sin(ang)[None, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


class _GTELayer(nn.Module):
    dim: int
    heads: int
    intermediate: int
    rope_theta: float
    eps: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, mask_bias):
        b, s, _ = x.shape
        hd = self.dim // self.heads

        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rope(q.reshape(b, s, self.heads, hd), self.rope_theta)
        k = _rope(k.reshape(b, s, self.heads, hd), self.rope_theta)
        v = v.reshape(b, s, self.heads, hd)
        # fp32 softmax island
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits * (hd ** -0.5) + mask_bias
        probs = nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, self.dim)
        attn = nn.Dense(self.dim, dtype=self.dtype, name="o_proj")(attn)
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="attn_ln")(x + attn)

        up_gate = nn.Dense(2 * self.intermediate, use_bias=False,
                           dtype=self.dtype, name="up_gate_proj")(x)
        up, gate = jnp.split(up_gate, 2, axis=-1)
        h = nn.gelu(gate, approximate=False) * up
        h = nn.Dense(self.dim, dtype=self.dtype, name="down_proj")(h)
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="mlp_ln")(x + h)


class GTEEncoder(nn.Module):
    vocab_size: int = 30528
    dim: int = 768
    depth: int = 12
    heads: int = 12
    intermediate: int = 3072
    type_vocab_size: int = 2
    rope_theta: float = 160000.0
    eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, pooled: bool = True):
        """ids [b, s] (+ 0/1 mask) -> CLS-pooled L2-normalized embedding
        [b, dim] (``pooled=False`` returns the last hidden states)."""
        b, s = input_ids.shape
        word = self.param("word_embeddings", nn.initializers.normal(0.02),
                          (self.vocab_size, self.dim))
        ttype = self.param("token_type_embeddings", nn.initializers.normal(0.02),
                           (self.type_vocab_size, self.dim))
        x = jnp.take(word, input_ids, axis=0) + ttype[0]
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="emb_ln")(
            x.astype(self.dtype))

        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9
                         ).astype(jnp.float32)

        for i in range(self.depth):
            x = _GTELayer(self.dim, self.heads, self.intermediate,
                          self.rope_theta, self.eps, self.dtype,
                          name=f"layer_{i}")(x, bias)
        if not pooled:
            return x
        cls = x[:, 0].astype(jnp.float32)
        return cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-12)
