"""Shared Flax building blocks: attention layers, transformer encoder /
decoder stacks (torch ``nn.TransformerEncoder``-compatible semantics for the
CAMA transformer), MLPs.

The CAMA transformer is configured in the reference as a *post-norm* torch
TransformerEncoder (``configs/motion_transformer/...yml:130-144``: 4 layers,
d=1024, 16 heads, ff=4096, gelu, batch_first, norm_first=false). We keep the
same math so ported checkpoints and golden tests line up.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from motionrag_tpu.ops.attention import dot_product_attention
from motionrag_tpu.ops.norms import layer_norm

__all__ = [
    "MultiHeadAttention",
    "TransformerEncoderLayer",
    "TransformerEncoder",
    "TransformerDecoderLayer",
    "TransformerDecoder",
    "Mlp",
]

Dtype = jnp.dtype


class MultiHeadAttention(nn.Module):
    """Torch ``nn.MultiheadAttention``-equivalent (qkv + out projections with
    bias), supporting self- and cross-attention with a boolean attend-mask."""

    dim: int
    num_heads: int
    kdim: Optional[int] = None
    bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, kv=None, mask=None):
        kv = q if kv is None else kv
        head_dim = self.dim // self.num_heads
        dense = lambda feat, name: nn.Dense(
            feat, use_bias=self.bias, dtype=self.dtype, name=name
        )
        qp = dense(self.dim, "q_proj")(q)
        kp = dense(self.dim, "k_proj")(kv)
        vp = dense(self.dim, "v_proj")(kv)
        b, sq = qp.shape[0], qp.shape[1]
        skv = kp.shape[1]
        qh = qp.reshape(b, sq, self.num_heads, head_dim)
        kh = kp.reshape(b, skv, self.num_heads, head_dim)
        vh = vp.reshape(b, skv, self.num_heads, head_dim)
        out = dot_product_attention(qh, kh, vh, mask=mask)
        out = out.reshape(b, sq, self.dim)
        return dense(self.dim, "out_proj")(out)


def _activation(name: str) -> Callable:
    # torch 'gelu' activation string means exact erf GELU
    return {
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "gelu_tanh": lambda x: nn.gelu(x, approximate=True),
        "relu": nn.relu,
        "silu": nn.silu,
    }[name]


class TransformerEncoderLayer(nn.Module):
    """Post-norm (norm_first=False) torch-compatible encoder layer:
    ``x = LN1(x + SelfAttn(x)); x = LN2(x + FF(x))``."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    activation: str = "gelu"
    norm_first: bool = False
    bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        attn = MultiHeadAttention(
            self.d_model, self.nhead, bias=self.bias, dtype=self.dtype, name="self_attn"
        )
        act = _activation(self.activation)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, use_bias=self.bias, name=name)
        ff = lambda h: nn.Dense(
            self.dim_feedforward, use_bias=self.bias, dtype=self.dtype, name="linear1"
        )(h)

        def feedforward(h):
            h = act(ff(h))
            return nn.Dense(self.d_model, use_bias=self.bias, dtype=self.dtype, name="linear2")(h)

        if self.norm_first:
            x = x + attn(ln("norm1")(x), mask=mask)
            x = x + feedforward(ln("norm2")(x))
        else:
            x = ln("norm1")(x + attn(x, mask=mask))
            x = ln("norm2")(x + feedforward(x))
        return x


class TransformerEncoder(nn.Module):
    """Stack of encoder layers; mirrors ``torch.nn.TransformerEncoder``'s
    config surface (``encoder_layer`` spec + num_layers)."""

    num_layers: int
    d_model: int = 1024
    nhead: int = 16
    dim_feedforward: int = 4096
    activation: str = "gelu"
    norm_first: bool = False
    bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.activation,
                self.norm_first,
                self.bias,
                self.dtype,
                name=f"layers_{i}",
            )(x, mask=mask)
        return x


class TransformerDecoderLayer(nn.Module):
    """Post-norm decoder layer: self-attn (masked) + cross-attn + FF."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    activation: str = "gelu"
    bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, tgt_mask=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, use_bias=self.bias, name=name)
        x = ln("norm1")(
            x
            + MultiHeadAttention(
                self.d_model, self.nhead, bias=self.bias, dtype=self.dtype, name="self_attn"
            )(x, mask=tgt_mask)
        )
        x = ln("norm2")(
            x
            + MultiHeadAttention(
                self.d_model, self.nhead, bias=self.bias, dtype=self.dtype, name="multihead_attn"
            )(x, kv=memory)
        )
        h = nn.Dense(self.dim_feedforward, use_bias=self.bias, dtype=self.dtype, name="linear1")(x)
        h = _activation(self.activation)(h)
        h = nn.Dense(self.d_model, use_bias=self.bias, dtype=self.dtype, name="linear2")(h)
        return ln("norm3")(x + h)


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int = 1024
    nhead: int = 16
    dim_feedforward: int = 4096
    activation: str = "gelu"
    bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, tgt_mask=None):
        for i in range(self.num_layers):
            x = TransformerDecoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.activation,
                self.bias,
                self.dtype,
                name=f"layers_{i}",
            )(x, memory, tgt_mask=tgt_mask)
        return x


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    activation: str = "gelu"
    bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, use_bias=self.bias, dtype=self.dtype, name="fc1")(x)
        x = _activation(self.activation)(x)
        return nn.Dense(self.out_dim, use_bias=self.bias, dtype=self.dtype, name="fc2")(x)
