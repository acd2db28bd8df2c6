"""Shared diffusion-backbone building blocks (Flax, NHWC layouts).

Covers the block vocabulary of the SVD UNet-spatio-temporal and the
DynamiCrafter UNet3D: 2D/temporal ResNet blocks, spatial/temporal
transformer blocks with GEGLU feed-forward, the Motion-Adapter ("APAdapter")
extra attention branch (reference ``condition/attn_processor.py:10-141``:
``to_q_ip`` reads the *post-attention, pre-out-projection* hidden states,
``to_k_ip``/``to_v_ip`` read the adapted motion tokens, and the result is
added with a scale before the output projection), timestep embeddings, and
the learned spatial/temporal AlphaBlender mix.

TPU notes: convs run in NHWC / NDHWC (XLA's preferred TPU layout); attention
uses the ops.attention dispatch (Pallas flash kernel for the big spatial
sequences); normalization statistics are fp32.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionrag_tpu.ops.attention import dot_product_attention
from motionrag_tpu.ops.norms import group_norm
from motionrag_tpu.ops.posemb import timestep_embedding

__all__ = [
    "nearest_upsample_2x",
    "Timesteps",
    "TimestepEmbedding",
    "GEGLUFeedForward",
    "CrossAttention",
    "BasicTransformerBlock",
    "TemporalBasicTransformerBlock",
    "ResnetBlock2D",
    "TemporalResnetBlock",
    "AlphaBlender",
    "SpatioTemporalResBlock",
    "Downsample2D",
    "Upsample2D",
]


def nearest_upsample_2x(x):
    """Fast nearest 2x spatial upsample: broadcast+reshape instead of
    jax.image.resize (which lowers to slow gathers on TPU)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Timesteps(nn.Module):
    """Sinusoidal timestep projection (diffusers ``Timesteps`` semantics).

    flip_sin_to_cos=True gives [cos, sin] ordering; False gives [sin, cos].
    """

    dim: int
    flip_sin_to_cos: bool = True
    downscale_freq_shift: float = 0.0

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        exponent = -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
        exponent = exponent / (half - self.downscale_freq_shift)
        freqs = jnp.exp(exponent)
        args = t.astype(jnp.float32)[..., None] * freqs
        sin, cos = jnp.sin(args), jnp.cos(args)
        emb = jnp.concatenate([cos, sin] if self.flip_sin_to_cos else [sin, cos], axis=-1)
        if self.dim % 2:
            emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
        return emb


class TimestepEmbedding(nn.Module):
    """Linear -> SiLU -> Linear timestep MLP.

    ``inner_dim`` defaults to ``dim`` (lvdm time_embed/fps_embedding style);
    diffusers' TransformerSpatioTemporal.time_pos_embed uses inner 4x
    (TimestepEmbedding(in_channels, in_channels * 4, out_dim=in_channels))."""

    dim: int
    inner_dim: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.inner_dim or self.dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(emb)


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward (reference lvdm ``attention.py:448-455`` /
    diffusers FeedForward with geglu)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class CrossAttention(nn.Module):
    """Projection + attention dispatch; optional Motion-Adapter branch.

    When ``with_adapter`` and ``action_emb`` is passed, computes the extra
    branch exactly as the reference processor: q from the post-attention
    hidden states, kv from action tokens (batch-broadcast over CFG/frame
    repeats), added with ``adapter_scale`` before the out projection.
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    with_adapter: bool = False
    adapter_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, action_emb=None, mask=None, causal=False):
        inner = self.heads * self.dim_head
        context = x if context is None else context
        b, sq = x.shape[0], x.shape[1]

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        skv = context.shape[1]
        out = dot_product_attention(
            q.reshape(b, sq, self.heads, self.dim_head),
            k.reshape(b, skv, self.heads, self.dim_head),
            v.reshape(b, skv, self.heads, self.dim_head),
            mask=mask,
            causal=causal,
        ).reshape(b, sq, inner)

        if self.with_adapter and action_emb is not None:
            ip_q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q_ip")(out)
            ip_k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_ip")(action_emb)
            ip_v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v_ip")(action_emb)
            r = b // action_emb.shape[0]
            if r > 1:
                # (b k) broadcast, matching repeat(ip_key, 'b ... -> (b r) ...')
                ip_k = jnp.repeat(ip_k, r, axis=0)
                ip_v = jnp.repeat(ip_v, r, axis=0)
            sa = action_emb.shape[1]
            ip_out = dot_product_attention(
                ip_q.reshape(b, sq, self.heads, self.dim_head),
                ip_k.reshape(b, sa, self.heads, self.dim_head),
                ip_v.reshape(b, sa, self.heads, self.dim_head),
            ).reshape(b, sq, inner)
            out = out + self.adapter_scale * ip_out

        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn (optional adapter), LN->GEGLU FF,
    all residual (diffusers BasicTransformerBlock / lvdm ``attention.py:226``)."""

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    with_adapter: bool = False
    adapter_scale: float = 1.0
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, action_emb=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        x = x + CrossAttention(
            self.dim, None, self.heads, self.dim_head, dtype=self.dtype, name="attn1"
        )(ln("norm1")(x))
        x = x + CrossAttention(
            self.dim,
            self.context_dim,
            self.heads,
            self.dim_head,
            with_adapter=self.with_adapter,
            adapter_scale=self.adapter_scale,
            dtype=self.dtype,
            name="attn2",
        )(ln("norm2")(x), context=context, action_emb=action_emb)
        x = x + GEGLUFeedForward(self.dim, self.ff_mult, dtype=self.dtype, name="ff")(
            ln("norm3")(x)
        )
        return x


class TemporalBasicTransformerBlock(nn.Module):
    """SVD temporal mixing block: per-pixel sequence over frames.

    norm_in+ff_in residual, self-attn over time, optional cross-attn to a
    time context, GEGLU FF (diffusers TemporalBasicTransformerBlock).
    """

    dim: int
    time_mix_inner_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int, context=None):
        # x: [(b hw), f, c]
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        residual = x
        x = ln("norm_in")(x)
        x = GEGLUFeedForward(self.time_mix_inner_dim, dtype=self.dtype, name="ff_in")(x)
        if self.dim == self.time_mix_inner_dim:
            x = x + residual

        x = x + CrossAttention(
            self.time_mix_inner_dim, None, self.heads, self.dim_head, dtype=self.dtype, name="attn1"
        )(ln("norm1")(x))
        if self.context_dim is not None and context is not None:
            x = x + CrossAttention(
                self.time_mix_inner_dim, self.context_dim, self.heads, self.dim_head,
                dtype=self.dtype, name="attn2",
            )(ln("norm2")(x), context=context)
        x = x + GEGLUFeedForward(self.time_mix_inner_dim, dtype=self.dtype, name="ff")(
            ln("norm3")(x)
        )
        return x


class TemporalConv3(nn.Module):
    """(3,1,1) temporal conv over [b, t, h, w, c] as three shifted GEMMs.

    Drop-in for ``nn.Conv(features, (3, 1, 1), padding=((1, 1), (0, 0),
    (0, 0)))``: identical param tree (kernel [3,1,1,cin,cout] + bias) and
    identical zero-padded math, but XLA lowers the 3D conv with two unit
    spatial dims far below MXU rate on TPU (per-block attribution put the
    DC L0 resblocks at 22% MFU, tools/analyze_dc_blocks.py) while three
    [b*t*h*w, cin] x [cin, cout] GEMMs run at matmul rate. Taps accumulate
    in fp32 before the single cast, matching conv accumulation semantics.
    """

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        kernel = self.param("kernel", self.kernel_init, (3, 1, 1, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype).reshape(3, c, self.features)
        xf = x.astype(self.dtype).reshape(b, t, h * w, c)
        xp = jnp.pad(xf, ((0, 0), (1, 1), (0, 0), (0, 0)))
        y = sum(
            jax.lax.dot_general(
                xp[:, i:i + t], k[i],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for i in range(3)
        )
        y = (y + bias.astype(jnp.float32)).astype(self.dtype)
        return y.reshape(b, t, h, w, self.features)


class ResnetBlock2D(nn.Module):
    """GN-SiLU-Conv x2 with timestep injection (NHWC)."""

    out_channels: int
    temb_dim: Optional[int] = None
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        residual = x
        in_ch = x.shape[-1]
        scale1 = self.param("norm1_scale", nn.initializers.ones, (in_ch,))
        bias1 = self.param("norm1_bias", nn.initializers.zeros, (in_ch,))
        h = group_norm(x, self.groups, scale1, bias1, eps=self.eps, act="silu")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if temb is not None and self.temb_dim is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        scale2 = self.param("norm2_scale", nn.initializers.ones, (self.out_channels,))
        bias2 = self.param("norm2_bias", nn.initializers.zeros, (self.out_channels,))
        h = group_norm(h, self.groups, scale2, bias2, eps=self.eps, act="silu")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(residual)
        return h + residual


class TemporalResnetBlock(nn.Module):
    """ResNet block with (3,1,1) temporal convs over [b, f, h, w, c]."""

    out_channels: int
    temb_dim: Optional[int] = None
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        # x: [b, f, h, w, c]
        residual = x
        in_ch = x.shape[-1]
        scale1 = self.param("norm1_scale", nn.initializers.ones, (in_ch,))
        bias1 = self.param("norm1_bias", nn.initializers.zeros, (in_ch,))
        h = group_norm(x, self.groups, scale1, bias1, eps=self.eps, act="silu")
        h = TemporalConv3(self.out_channels, dtype=self.dtype, name="conv1")(h)
        if temb is not None and self.temb_dim is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            # temb: [b*f? -> reshape at call site to [b, f, c]]
            h = h + t[:, :, None, None, :]
        scale2 = self.param("norm2_scale", nn.initializers.ones, (self.out_channels,))
        bias2 = self.param("norm2_bias", nn.initializers.zeros, (self.out_channels,))
        h = group_norm(h, self.groups, scale2, bias2, eps=self.eps, act="silu")
        h = TemporalConv3(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype, name="conv_shortcut")(residual)
        return h + residual


class AlphaBlender(nn.Module):
    """Learned spatial/temporal mix: out = a*spatial + (1-a)*temporal,
    a = sigmoid(mix_factor) (diffusers AlphaBlender, learned_with_images
    collapses to `learned` for pure-video batches)."""

    @nn.compact
    def __call__(self, spatial, temporal):
        mix = self.param("mix_factor", nn.initializers.constant(0.5), (1,))
        alpha = jax.nn.sigmoid(mix.astype(jnp.float32)).astype(spatial.dtype)
        return alpha * spatial + (1.0 - alpha) * temporal


class SpatioTemporalResBlock(nn.Module):
    """Spatial ResNet (per-frame) + temporal ResNet, alpha-blended.

    ``temporal_eps``: diffusers' TemporalDecoder builds these with spatial
    eps 1e-6 but temporal eps 1e-5; None means "same as eps" (the UNet)."""

    out_channels: int
    temb_dim: Optional[int] = None
    eps: float = 1e-5
    temporal_eps: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, num_frames: int):
        # x: [(b f), h, w, c]; temb: [(b f), temb_dim]
        h = ResnetBlock2D(
            self.out_channels, self.temb_dim, eps=self.eps, dtype=self.dtype,
            name="spatial_res_block",
        )(x, temb)
        bf, hh, ww, c = h.shape
        b = bf // num_frames
        h_t = h.reshape(b, num_frames, hh, ww, c)
        temb_t = temb.reshape(b, num_frames, -1) if temb is not None else None
        t_out = TemporalResnetBlock(
            self.out_channels, self.temb_dim,
            eps=self.temporal_eps if self.temporal_eps is not None else self.eps,
            dtype=self.dtype,
            name="temporal_res_block",
        )(h_t, temb_t)
        out = AlphaBlender(name="time_mixer")(h_t, t_out)
        return out.reshape(bf, hh, ww, c)


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv downsample. Two diffusers padding conventions:
    VAE encoder blocks build Downsample2D with padding=0 and pad (0,1,0,1)
    asymmetrically; UNet down blocks build it with padding=1 (symmetric).
    Both shapes agree for even inputs but the values differ at the edges —
    pick the one matching the checkpoint family."""

    channels: int
    asymmetric: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.asymmetric:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            padding = "VALID"
        else:
            padding = ((1, 1), (1, 1))
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=padding, dtype=self.dtype, name="conv"
        )(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
