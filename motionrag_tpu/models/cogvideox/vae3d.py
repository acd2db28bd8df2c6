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


def _nearest_resize_to(zq, t, h, w):
    """Nearest-neighbor upscale of [b, tz, hz, wz, c] to (t, h, w). Decoder
    factors are always integer, so torch's F.interpolate(nearest) index map
    floor(i*in/out) reduces to jnp.repeat — broadcast+reshape, NOT a gather
    (gather-based nearest resize is a 10x VAE slowdown on TPU)."""
    b, tz, hz, wz, c = zq.shape
    assert t % tz == 0 and h % hz == 0 and w % wz == 0, (zq.shape, (t, h, w))
    if t != tz:
        zq = jnp.repeat(zq, t // tz, axis=1)
    if h != hz:
        zq = jnp.repeat(zq, h // hz, axis=2)
    if w != wz:
        zq = jnp.repeat(zq, w // wz, axis=3)
    return zq


class SpatialNorm3D(nn.Module):
    """CogVideoXSpatialNorm3D (MOVQ-style, diffusers
    autoencoder_kl_cogvideox): GroupNorm(f) modulated by 1x1x1 causal convs
    of the (unscaled) latent zq, nearest-resized to f's resolution with the
    first-frame split for odd frame counts."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f, zq):
        t, h, w = f.shape[1:4]
        if t > 1 and t % 2 == 1:
            zq = jnp.concatenate(
                [
                    _nearest_resize_to(zq[:, :1], 1, h, w),
                    _nearest_resize_to(zq[:, 1:], t - 1, h, w),
                ],
                axis=1,
            )
        else:
            zq = _nearest_resize_to(zq, t, h, w)
        conv_y = CausalConv3d(self.channels, (1, 1, 1), dtype=self.dtype, name="conv_y")(zq)
        conv_b = CausalConv3d(self.channels, (1, 1, 1), dtype=self.dtype, name="conv_b")(zq)
        s = self.param("norm_layer_scale", nn.initializers.ones, (f.shape[-1],))
        b = self.param("norm_layer_bias", nn.initializers.zeros, (f.shape[-1],))
        normed = group_norm(f, self.groups, s, b, eps=1e-6)
        return normed * conv_y + conv_b


class ResnetBlock3D(nn.Module):
    """``spatial_norm=True`` (the decoder) replaces the plain GroupNorms with
    zq-conditioned :class:`SpatialNorm3D` — real AutoencoderKLCogVideoX
    decoder checkpoints carry norm{1,2}.norm_layer/conv_y/conv_b weights."""

    out_channels: int
    groups: int = 32
    spatial_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, chunked: bool = False, zq=None):
        in_ch = x.shape[-1]
        residual = x

        def norm(name, h, ch):
            if self.spatial_norm:
                h = SpatialNorm3D(h.shape[-1], self.groups, dtype=self.dtype, name=name)(h, zq)
                return nn.silu(h)
            s = self.param(f"{name}_scale", nn.initializers.ones, (ch,))
            b = self.param(f"{name}_bias", nn.initializers.zeros, (ch,))
            return group_norm(h, self.groups, s, b, eps=1e-6, act="silu")

        h = norm("norm1", x, in_ch)
        h = CausalConv3d(self.out_channels, dtype=self.dtype, name="conv1")(h, chunked)
        h = norm("norm2", h, self.out_channels)
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
        # the (unscaled) latent conditions every decoder norm (MOVQ-style
        # CogVideoXSpatialNorm3D — diffusers autoencoder_kl_cogvideox)
        zq = z
        ch = self.block_out_channels[-1]
        x = CausalConv3d(ch, dtype=self.dtype, name="conv_in")(z, chunked)
        x = ResnetBlock3D(ch, spatial_norm=True, dtype=self.dtype,
                          name="mid_res_0")(x, chunked, zq)
        x = ResnetBlock3D(ch, spatial_norm=True, dtype=self.dtype,
                          name="mid_res_1")(x, chunked, zq)
        rev = list(reversed(self.block_out_channels))
        n = len(rev)
        for i, out_ch in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                x = ResnetBlock3D(out_ch, spatial_norm=True, dtype=self.dtype,
                                  name=f"up_{i}_res_{j}")(x, chunked, zq)
            if i < n - 1:
                # temporal expansion mirrors encoder compression (last blocks)
                x = Upsample3D(
                    out_ch, compress_time=i >= n - 1 - self.temporal_compress_blocks,
                    dtype=self.dtype, name=f"up_{i}_upsample",
                )(x)
        x = SpatialNorm3D(x.shape[-1], dtype=self.dtype, name="norm_out")(x, zq)
        x = nn.silu(x)
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
                   decode_fn=None, schedule=None):
    """Streaming decode: latent frames in chunks of ``frame_batch_size``
    (first chunk absorbs the remainder so it carries the true first frame),
    causal conv caches threaded between chunks — the reference's default
    frame-batched VAE decode (diffusers ``AutoencoderKLCogVideoX.decode``).
    Peak activation memory drops from O(T_out) to O(4*frame_batch_size)
    frames. ``decode_fn(variables, z, mutable)`` may be supplied to wrap each
    chunk apply (e.g. jit); it must forward to ``vae.apply(..., chunked=True,
    method='decode')`` and return ``(frames, {'cache': ...})``.

    ``schedule`` (chunk sizes summing to the latent frame count) overrides
    the fixed batch size. SERVING-ONLY: chunk layout is NOT numerics-free —
    the decoder's GroupNorm statistics span the chunk's time axis (exactly
    diffusers' GroupNorm over (T, H, W)), so different layouts produce
    different frames (measured ~1.0 max abs at random init, every frame).
    The reference eval protocol is the diffusers default layout — fixed
    ``frame_batch_size=2`` with the remainder-absorbing first chunk — which
    is what ``schedule=None`` reproduces; protocol benches must not pass a
    schedule. The causal conv caches do make every layout causal (frame t
    never sees t+1).

    The python loop runs at most a few distinct chunk shapes, so jitting
    ``decode_fn`` costs one compile per distinct size and keeps every device
    program small — load-bearing under the tunnel's program-runtime kill."""
    t = latents.shape[1]
    if decode_fn is None:
        def decode_fn(variables, z, mutable):
            return vae.apply(variables, z, True, method="decode", mutable=mutable)
    if schedule is None:
        n_chunks = max(t // frame_batch_size, 1)
        rem = t % frame_batch_size if t > frame_batch_size else 0
        bounds = [(i * frame_batch_size + (0 if i == 0 else rem),
                   (i + 1) * frame_batch_size + rem) for i in range(n_chunks)]
    else:
        assert sum(schedule) == t, f"schedule {schedule} != {t} latent frames"
        bounds, pos = [], 0
        for size in schedule:
            bounds.append((pos, pos + size))
            pos += size
    outs = []
    cache = {}
    for start, end in bounds:
        variables = dict(params)
        if cache:
            variables["cache"] = cache
        frames, state = decode_fn(variables, latents[:, start:end], ("cache",))
        cache = state["cache"]
        outs.append(frames)
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
