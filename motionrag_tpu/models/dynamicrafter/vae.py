"""2D KL autoencoder for DynamiCrafter (SD VAE, per-frame encode/decode).

Reference: lvdm ``models/autoencoder.py:13-219`` + ``ae_modules.py`` —
standard SD first stage with ch_mult (1,2,4,4), z=4, applied per frame
(``perframe_ae: true`` in the shipped config, ``ddpm3d.py:655-661``).
Encoder is shared with the SVD VAE implementation; the decoder here is the
plain 2D SD decoder.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionrag_tpu.models.diffusion_blocks import ResnetBlock2D
from motionrag_tpu.models.svd.vae import AttnBlock2D, VAEEncoder
from motionrag_tpu.ops.norms import group_norm

__all__ = ["VAEDecoder2D", "AutoencoderKL2D"]


class VAEDecoder2D(nn.Module):
    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch = self.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = ResnetBlock2D(ch, eps=1e-6, dtype=self.dtype, name="mid_res_0")(x)
        x = AttnBlock2D(ch, dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock2D(ch, eps=1e-6, dtype=self.dtype, name="mid_res_1")(x)
        rev = list(reversed(self.block_out_channels))
        for i, out_ch in enumerate(rev):
            for j in range(self.layers_per_block):
                x = ResnetBlock2D(out_ch, eps=1e-6, dtype=self.dtype, name=f"up_{i}_res_{j}")(x)
            if i < len(rev) - 1:
                from motionrag_tpu.models.diffusion_blocks import nearest_upsample_2x

                x = nearest_upsample_2x(x)
                x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name=f"up_{i}_upsample")(x)
        ch0 = self.block_out_channels[0]
        s = self.param("norm_out_scale", nn.initializers.ones, (ch0,))
        b_ = self.param("norm_out_bias", nn.initializers.zeros, (ch0,))
        x = group_norm(x, 32, s, b_, eps=1e-6, act="silu")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL2D(nn.Module):
    """Per-frame SD KL VAE; ``scale_factor`` 0.18215 applied by the LDM
    wrapper (not here), matching lvdm semantics."""

    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = VAEEncoder(
            self.latent_channels, self.block_out_channels, dtype=self.dtype
        )
        self.decoder = VAEDecoder2D(3, self.block_out_channels, dtype=self.dtype)
        self.post_quant_conv = nn.Conv(
            self.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def encode(self, images: jnp.ndarray, rng=None) -> jnp.ndarray:
        """[(b f), h, w, 3] -> latent mode/sample [(b f), h/8, w/8, z]
        (unscaled; the LDM applies scale_factor)."""
        moments = self.encoder(images)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar.astype(jnp.float32))
            mean = mean + std.astype(mean.dtype) * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        # lvdm AutoencoderKL.decode: z = post_quant_conv(z) before the
        # decoder (autoencoder.py; CompVis convention)
        z = self.post_quant_conv(latents)
        return self.decoder(z)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(images))
