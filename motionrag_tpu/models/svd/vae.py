"""KL VAE with temporal decoder (SVD's AutoencoderKLTemporalDecoder).

Encoder is the standard SD 2D KL encoder applied per frame; the decoder adds
temporal ResNet mixing and a final (3,1,1) temporal conv so decoded frames
are temporally consistent (reference uses diffusers'
AutoencoderKLTemporalDecoder via ``svd/module.py:41``; chunked decode
semantics follow ``base_pipeline.py:115-140``).

All convs NHWC. Latent scaling factor 0.18215.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionrag_tpu.models.diffusion_blocks import (
    Downsample2D,
    ResnetBlock2D,
    SpatioTemporalResBlock,
)
from motionrag_tpu.ops.attention import dot_product_attention
from motionrag_tpu.ops.norms import group_norm

__all__ = ["VAEEncoder", "TemporalVAEDecoder", "AutoencoderKLTemporalDecoder"]


class AttnBlock2D(nn.Module):
    """Single-head self-attention over pixels (SD VAE mid-block attention)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        scale = self.param("norm_scale", nn.initializers.ones, (c,))
        bias = self.param("norm_bias", nn.initializers.zeros, (c,))
        hidden = group_norm(x, 32, scale, bias, eps=1e-6).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(hidden)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(hidden)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(hidden)
        out = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(b, h, w, c)


class VAEEncoder(nn.Module):
    """SD KL encoder: [b, h, w, 3] -> moments [b, h/8, w/8, 2*latent]."""

    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        n = len(self.block_out_channels)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                x = ResnetBlock2D(ch, eps=1e-6, dtype=self.dtype, name=f"down_{i}_res_{j}")(x)
            if i < n - 1:
                x = Downsample2D(ch, dtype=self.dtype, name=f"down_{i}_downsample")(x)
        ch = self.block_out_channels[-1]
        x = ResnetBlock2D(ch, eps=1e-6, dtype=self.dtype, name="mid_res_0")(x)
        x = AttnBlock2D(ch, dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock2D(ch, eps=1e-6, dtype=self.dtype, name="mid_res_1")(x)
        scale = self.param("norm_out_scale", nn.initializers.ones, (ch,))
        bias = self.param("norm_out_bias", nn.initializers.zeros, (ch,))
        x = group_norm(x, 32, scale, bias, eps=1e-6, act="silu")
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv")(x)


class TemporalVAEDecoder(nn.Module):
    """Temporal KL decoder: latents [(b f), h, w, 4] -> frames, with
    spatio-temporal res blocks and a final (3,1,1) temporal conv."""

    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, num_frames: int):
        ch = self.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)

        x = SpatioTemporalResBlock(ch, None, eps=1e-6, temporal_eps=1e-5, dtype=self.dtype, name="mid_res_0")(
            x, None, num_frames
        )
        x = AttnBlock2D(ch, dtype=self.dtype, name="mid_attn")(x)
        x = SpatioTemporalResBlock(ch, None, eps=1e-6, temporal_eps=1e-5, dtype=self.dtype, name="mid_res_1")(
            x, None, num_frames
        )

        rev = list(reversed(self.block_out_channels))
        for i, out_ch in enumerate(rev):
            for j in range(self.layers_per_block):
                x = SpatioTemporalResBlock(
                    out_ch, None, eps=1e-6, temporal_eps=1e-5, dtype=self.dtype,
                    name=f"up_{i}_res_{j}"
                )(x, None, num_frames)
            if i < len(rev) - 1:
                from motionrag_tpu.models.diffusion_blocks import nearest_upsample_2x

                x = nearest_upsample_2x(x)
                x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name=f"up_{i}_upsample")(x)

        ch0 = self.block_out_channels[0]
        scale = self.param("norm_out_scale", nn.initializers.ones, (ch0,))
        bias = self.param("norm_out_bias", nn.initializers.zeros, (ch0,))
        x = group_norm(x, 32, scale, bias, eps=1e-6, act="silu")
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        # temporal smoothing conv over frames
        bf, h, w, c = x.shape
        b = bf // num_frames
        xt = x.reshape(b, num_frames, h, w, c)
        xt = nn.Conv(
            self.out_channels, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
            dtype=self.dtype, name="time_conv_out",
        )(xt)
        return xt.reshape(bf, h, w, c)


class AutoencoderKLTemporalDecoder(nn.Module):
    latent_channels: int = 4
    scaling_factor: float = 0.18215
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = VAEEncoder(
            self.latent_channels, self.block_out_channels, dtype=self.dtype
        )
        self.decoder = TemporalVAEDecoder(
            3, self.block_out_channels, dtype=self.dtype
        )

    def encode_moments(self, images: jnp.ndarray) -> jnp.ndarray:
        """[(b f), h, w, 3] -> [(b f), h/8, w/8, 2*latent] (mean ++ logvar)."""
        return self.encoder(images)

    def encode(self, images: jnp.ndarray, rng=None) -> jnp.ndarray:
        """Posterior mode (rng=None) or sample; scaled by scaling_factor."""
        moments = self.encoder(images)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar.astype(jnp.float32))
            mean = mean + std.astype(mean.dtype) * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean * self.scaling_factor

    def decode(self, latents: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        """[(b f), h/8, w/8, latent] (scaled) -> frames [(b f), h, w, 3]."""
        return self.decoder(latents / self.scaling_factor, num_frames)

    def __call__(self, images: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        return self.decode(self.encode(images), num_frames)
