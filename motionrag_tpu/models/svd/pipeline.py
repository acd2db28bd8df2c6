"""SVD image-to-video pipelines (plain, Motion-Adapter, CAMA-CT variants).

TPU-native re-design of the reference's diffusers pipeline subclasses
(reference ``svd/pipelines/pipeline.py``): instead of smuggling
(image_emb, action_emb) through a TupleTensor into monkey-patched attention
processors, the action embedding is an explicit UNet input. The entire
denoise loop (CFG batch-2, per-frame guidance ramp, Euler steps) is one
jitted function; VAE decode is chunked over frames
(reference ``base_pipeline.py:115-140`` semantics).

Output contract: [-1, 1] float video [b, f, c, h, w] — the module layer
denormalizes to the uint8 host contract (reference ``base_module.py:150``).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from motionrag_tpu.models.fusion import condition_fusion
from motionrag_tpu.models.svd.sampler import euler_sample_loop, karras_sigmas
from motionrag_tpu.utils.pipeline import resize_with_antialiasing
from motionrag_tpu.ops.norms import pallas_norms

__all__ = ["SVDPipeline", "SVDActionPipeline", "SVDCTPipeline", "get_add_time_ids"]


def get_add_time_ids(fps, motion_bucket_id, noise_aug_strength, batch: int) -> jnp.ndarray:
    ids = jnp.stack(
        [
            jnp.full((batch,), fps, jnp.float32),
            jnp.full((batch,), motion_bucket_id, jnp.float32),
            jnp.broadcast_to(jnp.asarray(noise_aug_strength, jnp.float32), (batch,)),
        ],
        axis=1,
    )
    return ids


class SVDPipeline:
    """Baseline SVD I2V sampling. Holds module definitions; parameters are
    passed per call (pure-functional, trainer-owned)."""

    def __init__(self, unet, vae, image_encoder, dtype=jnp.bfloat16,
                 cfg_mode: str = "sequential", cache_threshold: float = 0.0,
                 quantize: str | None = None):
        self.unet = unet
        self.vae = vae
        self.image_encoder = image_encoder
        self.dtype = dtype
        # 'batched' = reference-style 2x batch per step; 'sequential' halves
        # the activation peak (16GB-HBM chips) at identical FLOPs
        self.cfg_mode = cfg_mode
        # opt-in adaptive output caching (models/sampler_cache.py); 0 = exact
        self.cache_threshold = float(cache_threshold)
        # opt-in int8 W8A8 UNet serving (ops/quant.py): expects params["unet"]
        # pre-transformed by quantize_dense_tree
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.quantize = quantize

    def _unet_apply(self, variables, *args, **kwargs):
        if self.quantize:
            from motionrag_tpu.ops.quant import quantized_calls

            with quantized_calls():
                return self.unet.apply(variables, *args, **kwargs)
        return self.unet.apply(variables, *args, **kwargs)

    # -- conditioning ------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self",))
    def encode_image_clip(self, params, image: jnp.ndarray) -> jnp.ndarray:
        """[-1,1] [b, c, h, w] -> [b, 1, 1024] CLIP image embedding
        (reference ``svd/module.py:74-80``)."""
        return self.image_encoder.apply(params["image_encoder"], image)

    @functools.partial(jax.jit, static_argnames=("self",))
    def encode_image_vae(self, params, image, rng, noise_aug_strength) -> jnp.ndarray:
        """Noise-augmented condition latent, unscaled
        (reference ``svd/module.py:280-296``)."""
        noise = jax.random.normal(rng, image.shape, jnp.float32)
        cond = image + noise * noise_aug_strength
        nhwc = cond.transpose(0, 2, 3, 1).astype(self.dtype)
        latent = self.vae.apply(params["vae"], nhwc, method="encode")
        return latent / self.vae.scaling_factor

    def prepare_action_embeddings(self, params, ref_videos, metadata, rng=None, image=None):
        return None  # baseline: no action conditioning

    # -- sampling ----------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self", "num_steps", "num_frames"))
    def _sample(
        self,
        params,
        noise,
        image_latents,
        image_emb,
        added_time_ids,
        action_emb,
        guidance_scale,
        num_steps: int,
        num_frames: int,
    ):
        sigmas = jnp.asarray(karras_sigmas(num_steps))
        latents = noise * jnp.sqrt(sigmas[0] ** 2 + 1.0).astype(noise.dtype)

        # CFG batch-2: uncond first (zeros image emb + zeros cond latents)
        uncond_emb = jnp.zeros_like(image_emb)
        emb2 = jnp.concatenate([uncond_emb, image_emb], axis=0)
        img_lat2 = jnp.concatenate([jnp.zeros_like(image_latents), image_latents], axis=0)
        ids2 = jnp.concatenate([added_time_ids, added_time_ids], axis=0)

        def unet_call(x_scaled, c_noise, img_lat, emb, ids, action):
            b = x_scaled.shape[0]
            cond = jnp.broadcast_to(
                img_lat[:, None], (b, num_frames) + img_lat.shape[1:]
            )
            unet_in = jnp.concatenate([x_scaled, cond.astype(x_scaled.dtype)], axis=-1)
            return self._unet_apply(
                params["unet"], unet_in, c_noise, emb, ids, action_emb=action
            )

        def denoise_fn(x_scaled, c_noise, sigma):
            b = x_scaled.shape[0]
            if self.cfg_mode == "batched":
                x2 = jnp.concatenate([x_scaled, x_scaled], axis=0)
                pred = unet_call(x2, c_noise, img_lat2, emb2, ids2, action_emb)
                return pred[:b], pred[b:]
            # sequential CFG: two half-batch calls, half the activation peak
            a_un, a_c = None, None
            if action_emb is not None:
                a_un, a_c = jnp.split(action_emb, 2, axis=0)
            pred_u = unet_call(
                x_scaled, c_noise, jnp.zeros_like(image_latents),
                jnp.zeros_like(image_emb), added_time_ids, a_un,
            )
            pred_c = unet_call(
                x_scaled, c_noise, image_latents, image_emb, added_time_ids, a_c,
            )
            return pred_u, pred_c

        denoised = euler_sample_loop(denoise_fn, latents, sigmas, guidance_scale,
                                     cache_threshold=self.cache_threshold)
        return denoised

    @functools.partial(jax.jit, static_argnames=("self", "n"))
    def _decode_chunk(self, params, chunk, n: int):
        return self.vae.apply(params["vae"], chunk.astype(self.dtype), n, method="decode")

    def _decode(self, params, latents, decode_chunk_size: int):
        b, f, h, w, c = latents.shape
        flat = latents.reshape(b * f, h, w, c)
        chunks = []
        for start in range(0, b * f, decode_chunk_size):
            chunk = flat[start : start + decode_chunk_size]
            chunks.append(self._decode_chunk(params, chunk, chunk.shape[0]))
        frames = jnp.concatenate(chunks, axis=0)
        fh, fw = frames.shape[1], frames.shape[2]
        return frames.reshape(b, f, fh, fw, 3).transpose(0, 1, 4, 2, 3)

    def __call__(
        self,
        params,
        image: jnp.ndarray,
        rng: jax.Array,
        ref_videos: Optional[jnp.ndarray] = None,
        metadata: Optional[list] = None,
        num_frames: int = 25,
        height: int = 576,
        width: int = 1024,
        num_inference_steps: int = 25,
        min_guidance_scale: float = 1.0,
        max_guidance_scale: float = 3.0,
        fps: int = 7,
        motion_bucket_id: int = 127,
        noise_aug_strength: float = 0.02,
        decode_chunk_size: int = 8,
        latents=None,
        **unused: Any,
    ) -> jnp.ndarray:
        """image: [-1,1] [b, c, h, w] -> video [-1,1] [b, f, c, h, w].

        ``latents`` optionally injects the initial noise (diffusers-style;
        used by the whole-pipeline parity test to share x_T with the torch
        mirror chain)."""
        b = image.shape[0]
        if image.shape[-2:] != (height, width):
            image = resize_with_antialiasing(image, (height, width))
        rng_noise, rng_aug, rng_action = jax.random.split(rng, 3)

        image_emb = self.encode_image_clip(params, image)
        image_latents = self.encode_image_vae(params, image, rng_aug, noise_aug_strength)
        added_time_ids = get_add_time_ids(fps - 1, motion_bucket_id, noise_aug_strength, b)
        action_emb = self.prepare_action_embeddings(
            params, ref_videos, metadata, rng_action, image=image
        )

        if latents is not None:
            noise = jnp.asarray(latents).astype(self.dtype)
        else:
            noise = jax.random.normal(
                rng_noise, (b, num_frames, height // 8, width // 8, 4), jnp.float32
            ).astype(self.dtype)
        guidance = jnp.linspace(min_guidance_scale, max_guidance_scale, num_frames)

        # inference traces use the fused Pallas GroupNorm
        with pallas_norms():
            latents = self._sample(
                params, noise, image_latents, image_emb, added_time_ids,
                action_emb, guidance, num_inference_steps, num_frames,
            )
            return self._decode(params, latents, decode_chunk_size)


class SVDActionPipeline(SVDPipeline):
    """Motion-Adapter variant: fused VideoMAE features of the retrieved
    videos, projected, with an uncond zeros-video branch for CFG
    (reference ``svd/pipelines/pipeline.py:60-119``)."""

    def __init__(self, unet, vae, image_encoder, action_embedder, action_proj_model,
                 ref_fusion_type: str = "mean", dtype=jnp.bfloat16, **kwargs):
        super().__init__(unet, vae, image_encoder, dtype, **kwargs)
        self.action_embedder = action_embedder
        self.action_proj_model = action_proj_model
        self.ref_fusion_type = ref_fusion_type

    def prepare_action_embeddings(self, params, ref_videos, metadata, rng=None, image=None):
        b, k = ref_videos.shape[:2]
        flat = ref_videos.reshape((b * k,) + ref_videos.shape[2:])
        emb = self.action_embedder.apply(params["action_embedder"], flat)
        emb = emb.reshape(b, k, emb.shape[-2], emb.shape[-1])
        weight = [m.get("ref_video_distance") for m in metadata] if metadata else None
        emb = condition_fusion(emb, self.ref_fusion_type, weight=weight)
        uncond = self.action_embedder.apply(
            params["action_embedder"], jnp.zeros_like(ref_videos[:, 0])
        )
        both = jnp.concatenate([uncond, emb], axis=0)
        return self.action_proj_model.apply(params["action_proj_model"], both)


class SVDCTPipeline(SVDPipeline):
    """CAMA variant: the Motion Context Transformer adapts the retrieved
    motions in-context; uncond branch from a zeros video
    (reference ``svd/pipelines/pipeline.py:122-160``)."""

    def __init__(self, unet, vae, image_encoder, condition_transformer, dtype=jnp.bfloat16,
                 **kwargs):
        super().__init__(unet, vae, image_encoder, dtype, **kwargs)
        self.condition_transformer = condition_transformer

    def prepare_action_embeddings(self, params, ref_videos, metadata, rng=None, image=None):
        batch = {"ref_videos": ref_videos, "video": ref_videos[:, 0]}
        if image is not None:
            # pseudo target video: repeat the conditioning image
            f = ref_videos.shape[2]
            batch["video"] = jnp.repeat(image[:, None], f, axis=1)
        return self.condition_transformer.apply(
            params["condition_transformer"], batch,
            do_classifier_free_guidance=True, method="predict",
        )
