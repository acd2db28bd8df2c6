"""Frozen condition encoders: VideoMAE (motion), DINOv2 (image), CLIP image.

Flax wrappers with the preprocessing the reference applies inside its HF
wrappers (reference ``condition/encoders/condition.py:360-604``): inputs are
[-1,1] video/image tensors; we uniform-sample frames (VideoMAE), resize the
short side to the encoder resolution with antialiasing, center-crop, and
normalize with the encoder's mean/std — all on device so the whole CAMA path
jits end to end.

These modules are always frozen (reference freezes them via config); the
trainer masks their params out of the optimizer.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from motionrag_tpu.models.encoders.vit import VisionTransformer
from motionrag_tpu.utils.pipeline import resize_with_antialiasing

__all__ = [
    "VideoMAEEmbedder",
    "VideoMAE2Embedder",
    "DINOImageEmbedder",
    "CLIPImageEmbedder",
    "SDXLImageEmbedder",
    "KolorsImageEmbedder",
    "FrozenCLIPT5Encoder",
    "IdentityEncoder",
    "ClassEmbedder",
    "preprocess_frames",
]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_frames(
    x: jnp.ndarray,
    size: int,
    mean: Sequence[float],
    std: Sequence[float],
) -> jnp.ndarray:
    """[-1,1] [..., c, h, w] -> normalized [..., c, size, size]."""
    x = (x.astype(jnp.float32) + 1.0) / 2.0
    h, w = x.shape[-2], x.shape[-1]
    scale = size / min(h, w)
    nh, nw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
    x = resize_with_antialiasing(x, (nh, nw))
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[..., top : top + size, left : left + size]
    mean = jnp.asarray(mean, jnp.float32)[:, None, None]
    std = jnp.asarray(std, jnp.float32)[:, None, None]
    return (x - mean) / std


def uniform_sample_frames(x: jnp.ndarray, num_frames: int, axis: int = 1) -> jnp.ndarray:
    """Uniformly sample ``num_frames`` along ``axis`` (reference
    ``condition.py:396`` linspace-index sampling)."""
    t = x.shape[axis]
    idx = np.linspace(0, t - 1, num_frames).round().astype(np.int32)
    return jnp.take(x, jnp.asarray(idx), axis=axis)


class VideoMAEEmbedder(nn.Module):
    """Frozen VideoMAE-base (ssv2 finetune) motion encoder: [b, t, c, h, w]
    [-1,1] video -> [b, 1568, 768] tokens (reference ``condition.py:360-400``)."""

    num_frames: int = 16
    image_size: int = 224
    dim: int = 768
    depth: int = 12
    heads: int = 12
    freeze: bool = True
    dtype: jnp.dtype = jnp.float32
    # one nn.scan'd block instead of depth unrolled copies (vit.py) — param
    # layout converts automatically (checkpoints.adapt_block_layout)
    scan_blocks: bool = False

    def setup(self):
        self.model = VisionTransformer(
            variant="videomae",
            image_size=self.image_size,
            patch_size=16,
            num_frames=self.num_frames,
            tubelet_size=2,
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dtype=self.dtype,
            scan_blocks=self.scan_blocks,
        )

    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        video = uniform_sample_frames(video, self.num_frames, axis=1)
        video = preprocess_frames(video, self.image_size, IMAGENET_MEAN, IMAGENET_STD)
        return self.model(video.astype(self.dtype))


class VideoMAE2Embedder(VideoMAEEmbedder):
    """VideoMAEv2-Large (reference ``condition.py:403-462``): the actual
    VideoMAEv2 architecture — BEiT-style q/v bias, LN eps 1e-6, and NO final
    norm (the reference's manual ``forward_features`` returns the block
    output; ``use_mean_pooling`` makes the trailing norm an Identity)."""

    dim: int = 1024
    depth: int = 24
    heads: int = 16

    def setup(self):
        self.model = VisionTransformer(
            variant="videomae2",
            image_size=self.image_size,
            patch_size=16,
            num_frames=self.num_frames,
            tubelet_size=2,
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dtype=self.dtype,
            scan_blocks=self.scan_blocks,
        )


class FrozenCLIPT5Encoder(nn.Module):
    """Dual text conditioning (reference lvdm ``condition.py:383-398``):
    CLIP-L final hidden + T5-v1.1-XL hidden, returned as a [clip_z, t5_z]
    pair. Both tokenizations happen host-side; ids in (CLIP BPE, T5
    sentencepiece)."""

    clip_kwargs: dict | None = None
    t5_kwargs: dict | None = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from motionrag_tpu.models.encoders.clip_text import CLIPTextEncoder
        from motionrag_tpu.models.encoders.t5 import T5Encoder

        # reference defaults: openai/clip-vit-large-patch14 (dim 768,
        # depth 12, quick-gelu, final LN) + google/t5-v1_1-xl (dim 2048)
        ck = dict(dim=768, depth=12, heads=12, projection_dim=768,
                  use_quick_gelu=True, dtype=self.dtype)
        ck.update(self.clip_kwargs or {})
        tk = dict(dim=2048, depth=24, heads=32, head_dim=64, ff_dim=5120,
                  dtype=self.dtype)
        tk.update(self.t5_kwargs or {})
        self.clip_encoder = CLIPTextEncoder(**ck)
        self.t5_encoder = T5Encoder(**tk)

    def __call__(self, clip_ids: jnp.ndarray, t5_ids: jnp.ndarray):
        clip_z = self.clip_encoder(clip_ids, penultimate=False)
        t5_z = self.t5_encoder(t5_ids)
        return [clip_z, t5_z]


class IdentityEncoder(nn.Module):
    """Pass-through conditioning (reference ``condition.py`` IdentityEncoder)."""

    def __call__(self, x):
        return x


class ClassEmbedder(nn.Module):
    """Class-label embedding table (reference ``condition.py`` ClassEmbedder)."""

    embed_dim: int
    n_classes: int = 1000

    @nn.compact
    def __call__(self, labels):
        table = self.param(
            "embedding", nn.initializers.normal(0.02), (self.n_classes, self.embed_dim)
        )
        return jnp.take(table, labels, axis=0)


class DINOImageEmbedder(nn.Module):
    """Frozen DINOv2-large condition encoder: [b, c, h, w] [-1,1] image ->
    [b, 257, 1024] tokens (reference ``condition.py:561-604``)."""

    model: str = "facebook/dinov2-large"
    image_size: int = 224
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    freeze: bool = True
    dtype: jnp.dtype = jnp.float32
    # one nn.scan'd block instead of depth unrolled copies (vit.py) — param
    # layout converts automatically (checkpoints.adapt_block_layout)
    scan_blocks: bool = False

    def setup(self):
        self.encoder = VisionTransformer(
            variant="dino",
            image_size=self.image_size,
            patch_size=14,
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            layerscale_init=1e-5,
            dtype=self.dtype,
            scan_blocks=self.scan_blocks,
        )

    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        image = preprocess_frames(image, self.image_size, IMAGENET_MEAN, IMAGENET_STD)
        return self.encoder(image.astype(self.dtype))


class CLIPImageEmbedder(nn.Module):
    """Frozen CLIP-ViT image encoder. ``pooled=True`` returns the projected
    image embedding [b, projection_dim] (SVD conditioning,
    reference ``svd/module.py:74-80``); otherwise penultimate tokens."""

    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    depth: int = 32
    heads: int = 16
    projection_dim: int = 1024
    pooled: bool = True
    freeze: bool = True
    # 'square': direct antialiased resize to (size, size) — SVD conditioning
    # path (reference ``svd/module.py:76``); 'crop': short-side + center crop.
    resize_mode: str = "square"
    # token output contract when pooled=False: False -> penultimate hidden
    # (HF IP-Adapter convention, hidden_states[-2]); True -> ALL blocks with
    # no ln_post (OpenCLIP FrozenOpenCLIPImageEmbedderV2, the DynamiCrafter
    # image-conditioning path — reference condition.py:263-341)
    final_tokens: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = VisionTransformer(
            variant="clip",
            image_size=self.image_size,
            patch_size=self.patch_size,
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            projection_dim=self.projection_dim,
            dtype=self.dtype,
        )

    def __call__(self, image: jnp.ndarray, uncond: bool = False) -> jnp.ndarray:
        if self.resize_mode == "square":
            x = (image.astype(jnp.float32) + 1.0) / 2.0
            x = resize_with_antialiasing(x, (self.image_size, self.image_size))
            mean = jnp.asarray(CLIP_MEAN, jnp.float32)[:, None, None]
            std = jnp.asarray(CLIP_STD, jnp.float32)[:, None, None]
            image = (x - mean) / std
        else:
            image = preprocess_frames(image, self.image_size, CLIP_MEAN, CLIP_STD)
        if uncond:
            # reference get_uncond_emb (condition.py:554-556): all-zero
            # *pixel_values* (not a normalized black image) through the tower
            image = jnp.zeros_like(image)
        if self.pooled:
            return self.encoder(image.astype(self.dtype), return_pooled=True)[:, None, :]
        if self.final_tokens:
            return self.encoder(image.astype(self.dtype), raw_tokens=True)
        return self.encoder(image.astype(self.dtype), penultimate=True)


class SDXLImageEmbedder(CLIPImageEmbedder):
    """SDXL IP-Adapter image tower (reference ``condition.py:565-580``):
    the laion OpenCLIP ViT-H/14 from ``h94/IP-Adapter models/image_encoder``,
    penultimate hidden tokens [b, 257, 1280]. Same tower geometry as the SVD
    conditioning CLIP but crop preprocessing + token (not pooled) output."""

    pooled: bool = False
    resize_mode: str = "crop"


class KolorsImageEmbedder(CLIPImageEmbedder):
    """Kolors IP-Adapter-Plus image tower (reference ``condition.py:583-598``):
    CLIP ViT-L/14@336 (``Kwai-Kolors/Kolors-IP-Adapter-Plus image_encoder``),
    penultimate hidden tokens [b, 577, 1024]."""

    image_size: int = 336
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    projection_dim: int = 768
    pooled: bool = False
    resize_mode: str = "crop"
