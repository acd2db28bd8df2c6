"""CogVideoX 3D causal VAE (Flax, NDHWC).

TPU-native re-design of the causal video VAE the reference uses through
diffusers (``cogvideox/module.py:39-40,103-113``): causal temporal convs
(front-replicate padding, so frame t never sees t+1), 8x spatial / 4x
temporal compression with the first frame kept (1+4n frames -> 1+n latent
frames), 16 latent channels.

Memory behavior: ``decode`` processes latent frames in temporal chunks and
optional spatial tiles with overlap blending — the XLA-side equivalent of
the reference's ``vae.enable_tiling()/enable_slicing()``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionrag_tpu.ops.norms import group_norm

__all__ = ["CogVideoXVAE"]


class CausalConv3d(nn.Module):
    """Conv3d with causal temporal padding (replicate first frame), zero
    spatial padding (diffusers CogVideoXCausalConv3d, pad_mode='constant').

    ``chunked=True`` enables the streaming conv cache: the front padding is
    taken from the previous chunk's trailing ``kt-1`` input frames, stored in
    the mutable ``cache`` variable collection (diffusers' ``conv_cache``
    threading, ``autoencoder_kl_cogvideox.fake_context_parallel_forward``).
    Chunked decode is therefore bit-equivalent to the reference's default
    frame-batched decode, and frame t never sees t+1 either way."""

    features: int
    kernel: tuple[int, int, int] = (3, 3, 3)
    strides: tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, chunked: bool = False):
        kt, kh, kw = self.kernel
        pad_t = kt - 1
        if pad_t:
            if chunked:
                tail = self.variable(
                    "cache", "tail", lambda: jnp.repeat(x[:, :1], pad_t, axis=1)
                )
                x = jnp.concatenate([tail.value.astype(x.dtype), x], axis=1)
                if self.is_mutable_collection("cache"):
                    tail.value = x[:, x.shape[1] - pad_t :]
            else:
                x = jnp.pad(
                    x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)), mode="edge"
                )
        ph, pw = (kh - 1) // 2, (kw - 1) // 2
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw), (0, 0)))
        return nn.Conv(
            self.features, self.kernel, strides=self.strides, padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class ResnetBlock3D(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, chunked: bool = False):
        in_ch = x.shape[-1]
        residual = x
        s1 = self.param("norm1_scale", nn.initializers.ones, (in_ch,))
        b1 = self.param("norm1_bias", nn.initializers.zeros, (in_ch,))
        h = group_norm(x, self.groups, s1, b1, eps=1e-6, act="silu")
        h = CausalConv3d(self.out_channels, dtype=self.dtype, name="conv1")(h, chunked)
        s2 = self.param("norm2_scale", nn.initializers.ones, (self.out_channels,))
        b2 = self.param("norm2_bias", nn.initializers.zeros, (self.out_channels,))
        h = group_norm(h, self.groups, s2, b2, eps=1e-6, act="silu")
        h = CausalConv3d(self.out_channels, dtype=self.dtype, name="conv2")(h, chunked)
        if in_ch != self.out_channels:
            residual = CausalConv3d(
                self.out_channels, (1, 1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual, chunked)
        return h + residual


def _compress_time(x):
    """First frame kept; remaining frames average-pooled by 2 (CogVideoX
    temporal downsample semantics for 1+2n frame sequences)."""
    first, rest = x[:, :1], x[:, 1:]
    b, t, h, w, c = rest.shape
    if t % 2:
        # odd remainder: keep final frame unpooled
        rest, tail = rest[:, : t - 1], rest[:, t - 1 :]
    else:
        tail = None
    pooled = rest.reshape(b, rest.shape[1] // 2, 2, h, w, c).mean(axis=2)
    parts = [first, pooled] + ([tail] if tail is not None else [])
    return jnp.concatenate(parts, axis=1)


def _expand_time(x):
    """Inverse of _compress_time. Odd frame count means the chunk contains
    the true first frame (1+2n layout): keep it un-duplicated. Even count is
    a continuation chunk: every frame expands 2x (diffusers
    CogVideoXUpsample3D's ``shape[2] % 2`` dispatch)."""
    if x.shape[1] == 1:
        return x
    if x.shape[1] % 2 == 1:
        first, rest = x[:, :1], x[:, 1:]
        rest = jnp.repeat(rest, 2, axis=1)
        return jnp.concatenate([first, rest], axis=1)
    return jnp.repeat(x, 2, axis=1)


class Downsample3D(nn.Module):
    channels: int
    compress_time: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.compress_time:
            x = _compress_time(x)
        b, t, h, w, c = x.shape
        xs = x.reshape(b * t, h, w, c)
        xs = jnp.pad(xs, ((0, 0), (0, 1), (0, 1), (0, 0)))
        xs = nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv"
        )(xs)
        return xs.reshape(b, t, xs.shape[1], xs.shape[2], xs.shape[3])


class Upsample3D(nn.Module):
    channels: int
    compress_time: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.compress_time:
            x = _expand_time(x)
        b, t, h, w, c = x.shape
        from motionrag_tpu.models.diffusion_blocks import nearest_upsample_2x

        xs = nearest_upsample_2x(x.reshape(b * t, h, w, c))
        xs = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(xs)
        return xs.reshape(b, t, h * 2, w * 2, self.channels)


class VAE3DEncoder(nn.Module):
    latent_channels: int = 16
    block_out_channels: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 3
    temporal_compress_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [b, t, h, w, 3]
        x = CausalConv3d(self.block_out_channels[0], dtype=self.dtype, name="conv_in")(x)
        n = len(self.block_out_channels)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                x = ResnetBlock3D(ch, dtype=self.dtype, name=f"down_{i}_res_{j}")(x)
            if i < n - 1:
                x = Downsample3D(
                    ch, compress_time=i < self.temporal_compress_blocks,
                    dtype=self.dtype, name=f"down_{i}_downsample",
                )(x)
        ch = self.block_out_channels[-1]
        x = ResnetBlock3D(ch, dtype=self.dtype, name="mid_res_0")(x)
        x = ResnetBlock3D(ch, dtype=self.dtype, name="mid_res_1")(x)
        s = self.param("norm_out_scale", nn.initializers.ones, (ch,))
        b = self.param("norm_out_bias", nn.initializers.zeros, (ch,))
        x = group_norm(x, 32, s, b, eps=1e-6, act="silu")
        return CausalConv3d(2 * self.latent_channels, dtype=self.dtype, name="conv_out")(x)


class VAE3DDecoder(nn.Module):
    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 3
    temporal_compress_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, chunked: bool = False):
        ch = self.block_out_channels[-1]
        x = CausalConv3d(ch, dtype=self.dtype, name="conv_in")(z, chunked)
        x = ResnetBlock3D(ch, dtype=self.dtype, name="mid_res_0")(x, chunked)
        x = ResnetBlock3D(ch, dtype=self.dtype, name="mid_res_1")(x, chunked)
        rev = list(reversed(self.block_out_channels))
        n = len(rev)
        for i, out_ch in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                x = ResnetBlock3D(out_ch, dtype=self.dtype, name=f"up_{i}_res_{j}")(x, chunked)
            if i < n - 1:
                # temporal expansion mirrors encoder compression (last blocks)
                x = Upsample3D(
                    out_ch, compress_time=i >= n - 1 - self.temporal_compress_blocks,
                    dtype=self.dtype, name=f"up_{i}_upsample",
                )(x)
        ch0 = self.block_out_channels[0]
        s = self.param("norm_out_scale", nn.initializers.ones, (ch0,))
        b = self.param("norm_out_bias", nn.initializers.zeros, (ch0,))
        x = group_norm(x, 32, s, b, eps=1e-6, act="silu")
        return CausalConv3d(self.out_channels, dtype=self.dtype, name="conv_out")(x, chunked)


class CogVideoXVAE(nn.Module):
    latent_channels: int = 16
    scaling_factor: float = 1.15258426
    block_out_channels: Sequence[int] = (128, 256, 256, 512)
    layers_per_block: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = VAE3DEncoder(
            self.latent_channels, self.block_out_channels, self.layers_per_block,
            dtype=self.dtype,
        )
        self.decoder = VAE3DDecoder(
            3, self.block_out_channels, self.layers_per_block, dtype=self.dtype
        )

    def encode(self, video: jnp.ndarray, rng=None) -> jnp.ndarray:
        """[-1,1] [b, t, h, w, 3] (t = 1+4n) -> latents [b, 1+n, h/8, w/8, C]
        scaled by scaling_factor."""
        moments = self.encoder(video)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar.astype(jnp.float32))
            mean = mean + std.astype(mean.dtype) * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean * self.scaling_factor

    def decode(self, latents: jnp.ndarray, chunked: bool = False) -> jnp.ndarray:
        return self.decoder(latents / self.scaling_factor, chunked)

    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(video))


def decode_chunked(vae: CogVideoXVAE, params, latents, frame_batch_size: int = 2,
                   decode_fn=None):
    """Streaming decode: latent frames in chunks of ``frame_batch_size``
    (first chunk absorbs the remainder so it carries the true first frame),
    causal conv caches threaded between chunks — the reference's default
    frame-batched VAE decode (diffusers ``AutoencoderKLCogVideoX.decode``).
    Peak activation memory drops from O(T_out) to O(4*frame_batch_size)
    frames. ``decode_fn(variables, z, mutable)`` may be supplied to wrap each
    chunk apply (e.g. jit); it must forward to ``vae.apply(..., chunked=True,
    method='decode')`` and return ``(frames, {'cache': ...})``.

    The python loop runs at most two distinct chunk shapes (first, rest), so
    jitting ``decode_fn`` costs two compiles and keeps every device program
    small — load-bearing under the tunnel's program-runtime kill."""
    t = latents.shape[1]
    if decode_fn is None:
        def decode_fn(variables, z, mutable):
            return vae.apply(variables, z, True, method="decode", mutable=mutable)
    n_chunks = max(t // frame_batch_size, 1)
    rem = t % frame_batch_size if t > frame_batch_size else 0
    outs = []
    cache = {}
    for i in range(n_chunks):
        start = i * frame_batch_size + (0 if i == 0 else rem)
        end = (i + 1) * frame_batch_size + rem
        variables = dict(params)
        if cache:
            variables["cache"] = cache
        frames, state = decode_fn(variables, latents[:, start:end], ("cache",))
        cache = state["cache"]
        outs.append(frames)
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
