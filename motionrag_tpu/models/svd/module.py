"""SVD training/eval modules (baseline, Motion-Adapter, CAMA-CT).

Pure-functional re-design of the reference LightningModules
(``src/projects/svd/module.py``): each module owns its Flax net definitions
and exposes
  - ``init_params(rng, batch_template)``
  - ``loss(params, batch, rng) -> (scalar, metrics dict)``   [jit/pjit-able]
  - ``eval_pipeline(params, batch, rng, **kwargs) -> [-1,1] video``
  - ``trainable_patterns`` — dotted-path prefixes for the optax mask,
    mirroring the reference's ``full_trainable_modules`` config semantics.

Training math (reference ``svd/module.py:82-127``): EDM preconditioning with
log-normal sigma; noise-augmented first-frame condition latent concatenated
on channels; CLIP image embedding conditioning; (1+sigma^2)/sigma^2 -weighted
denoised-MSE loss.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder, VideoMAEEmbedder
from motionrag_tpu.models.fusion import condition_fusion
from motionrag_tpu.models.svd.pipeline import (
    SVDActionPipeline,
    SVDCTPipeline,
    SVDPipeline,
    get_add_time_ids,
)
from motionrag_tpu.models.svd.unet import SVD_ADAPTER_SITES, UNetSpatioTemporal
from motionrag_tpu.models.svd.vae import AutoencoderKLTemporalDecoder

__all__ = ["SVDModule", "SVDActionModule", "SVDCTModule", "svd_quant_patterns"]


def svd_quant_patterns():
    """(include, exclude) dotted patterns for int8 serving of the SVD UNet
    (``ops/quant.py``): attention/GEGLU/proj Dense kernels quantize;
    timestep/added-time embedding MLPs (``TimestepEmbedding`` linear_1/2),
    per-ResBlock modulation, and the trainable Motion-Adapter branch stay
    bf16. Convs never quantize (only 2-D kernels transform)."""
    return (
        ("*",),
        (
            "*.linear_1", "*.linear_2",
            "*.time_emb_proj",
            "*.processor",
        ),
    )


def log_normal(rng, shape, mean, std):
    return jnp.exp(mean + std * jax.random.normal(rng, shape, jnp.float32))


class SVDModule:
    def __init__(
        self,
        unet: Optional[UNetSpatioTemporal] = None,
        vae: Optional[AutoencoderKLTemporalDecoder] = None,
        image_encoder: Optional[CLIPImageEmbedder] = None,
        condition_noise_config: dict | None = None,
        latents_noise_config: dict | None = None,
        eval_pipeline_call_kwargs: dict | None = None,
        freeze_modules=("image_encoder", "vae", "unet"),
        cache_threshold: float = 0.0,
        quantize: str | None = None,
        full_trainable_modules=(),
        lora_trainable_modules=(),
        lora_rank: int = 64,
        dtype=jnp.bfloat16,
    ):
        self.unet = unet or UNetSpatioTemporal(dtype=dtype)
        self.vae = vae or AutoencoderKLTemporalDecoder(dtype=dtype)
        self.image_encoder = image_encoder or CLIPImageEmbedder(dtype=dtype)
        self.condition_noise_config = condition_noise_config or {"mean": -3.0, "std": 0.5}
        self.latents_noise_config = latents_noise_config or {"mean": 0.7, "std": 1.6}
        self.eval_pipeline_call_kwargs = eval_pipeline_call_kwargs or {}
        self.freeze_modules = tuple(freeze_modules)
        self.full_trainable_modules = tuple(full_trainable_modules)
        self.lora_trainable_modules = tuple(lora_trainable_modules)
        self.lora_rank = lora_rank
        self.dtype = dtype
        self.cache_threshold = float(cache_threshold)
        # opt-in int8 W8A8 UNet serving (ops/quant.py): eval-only, quantized
        # once per param tree and cached
        self.quantize = quantize
        self._quant_cache = None
        self.pipe = self.build_pipeline()

    # -- construction ------------------------------------------------------

    def build_pipeline(self) -> SVDPipeline:
        return SVDPipeline(self.unet, self.vae, self.image_encoder, self.dtype,
                           cache_threshold=self.cache_threshold,
                           quantize=self.quantize)

    def extra_param_inits(self, rng, batch) -> dict:
        return {}

    def init_params(self, rng, batch: dict) -> dict:
        """Initialize every net from a template batch
        (batch['video']: [-1,1] [b, f, c, h, w])."""
        video = jnp.asarray(batch["video"], jnp.float32)
        b, f, c, h, w = video.shape
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        frames_nhwc = video[:, 0].transpose(0, 2, 3, 1).astype(self.dtype)
        vae_params = self.vae.init(r1, frames_nhwc, 1)
        clip_params = self.image_encoder.init(r2, video[:, 0])
        sample = jnp.zeros((b, f, h // 8, w // 8, 8), self.dtype)
        ctx = jnp.zeros((b, 1, self.unet.cross_attention_dim), self.dtype)
        ids = get_add_time_ids(6, 127, 0.02, b)
        action = self.template_action_emb(b)
        unet_params = self.unet.init(r3, sample, jnp.zeros((b,)), ctx, ids, action_emb=action)
        params = {"unet": unet_params, "vae": vae_params, "image_encoder": clip_params}
        params.update(self.extra_param_inits(r4, batch))
        return params

    def template_action_emb(self, b):
        return None

    # -- training ----------------------------------------------------------

    def encode_hidden_states(self, params, batch, rng):
        image_emb = self.image_encoder.apply(params["image_encoder"], batch["video"][:, 0])
        return image_emb, None

    def loss(self, params, batch: dict, rng: jax.Array):
        video = jnp.asarray(batch["video"])
        b, f, c, h, w = video.shape
        rngs = jax.random.split(rng, 5)

        # VAE encode all frames (mode). Frozen first-stage: constants
        # w.r.t. trainables — fused Pallas GroupNorm (no-VJP kernel,
        # guarded by the stop_gradient) avoids the XLA GroupNorm's fp32
        # materializations inside the train step.
        from motionrag_tpu.ops.norms import pallas_norms

        frames = video.reshape(b * f, c, h, w).transpose(0, 2, 3, 1).astype(self.dtype)
        with pallas_norms():
            latents = self.vae.apply(params["vae"], frames, method="encode")
        latents = jax.lax.stop_gradient(
            latents.reshape(b, f, h // 8, w // 8, -1).astype(jnp.float32))

        # noise-augmented condition latent from the first frame
        naug = log_normal(rngs[0], (b, 1, 1, 1), **self.condition_noise_config)
        cond_img = video[:, 0] + jax.random.normal(rngs[1], video[:, 0].shape) * naug
        cond_nhwc = cond_img.transpose(0, 2, 3, 1).astype(self.dtype)
        with pallas_norms():
            cond_latent = self.vae.apply(
                params["vae"], cond_nhwc, method="encode")
        cond_latent = jax.lax.stop_gradient(
            (cond_latent / self.vae.scaling_factor).astype(jnp.float32))
        cond_latent = jnp.broadcast_to(cond_latent[:, None], latents.shape)

        # EDM: log-normal sigma, preconditioning
        sigmas = log_normal(rngs[2], (b, 1, 1, 1, 1), **self.latents_noise_config)
        c_skip = 1.0 / (sigmas ** 2 + 1.0)
        c_out = -sigmas / jnp.sqrt(sigmas ** 2 + 1.0)
        c_in = 1.0 / jnp.sqrt(sigmas ** 2 + 1.0)
        c_noise = 0.25 * jnp.log(sigmas)

        noise = jax.random.normal(rngs[3], latents.shape, jnp.float32)
        noisy = latents + noise * sigmas
        unet_in = jnp.concatenate([(noisy * c_in).astype(self.dtype), cond_latent.astype(self.dtype)], axis=-1)

        image_emb, action_emb = self.encode_hidden_states(params, batch, rngs[4])
        added_time_ids = get_add_time_ids(6, 127, naug[:, 0, 0, 0], b)

        pred = self.unet.apply(
            params["unet"], unet_in, c_noise[:, 0, 0, 0, 0], image_emb,
            added_time_ids, action_emb=action_emb,
        ).astype(jnp.float32)

        denoised = c_skip * noisy + c_out * pred
        weight = (1.0 + sigmas ** 2) / sigmas ** 2
        loss = jnp.mean(weight * jnp.square(denoised - latents))
        return loss, {"train/main_loss": loss}

    # -- evaluation --------------------------------------------------------

    def _quantized_unet_params(self, tree):
        """int8 copy of the UNet params, cached by leaf identity (see
        ``CogVideoX5B._quantized_transformer_params`` for the HBM caveat)."""
        from motionrag_tpu.ops.quant import QuantizedTreeCache

        if self._quant_cache is None:
            self._quant_cache = QuantizedTreeCache()
        include, exclude = svd_quant_patterns()
        return self._quant_cache.get(tree, include, exclude)

    def eval_pipeline(self, params, batch: dict, rng: jax.Array, **kwargs) -> jnp.ndarray:
        call_kwargs = dict(self.eval_pipeline_call_kwargs)
        call_kwargs.update(kwargs)
        if self.quantize:
            params = {**params, "unet": self._quantized_unet_params(params["unet"])}
        image = jnp.asarray(batch["video"])[:, 0]
        frames = self.pipe(
            params, image, rng,
            ref_videos=batch.get("ref_videos"),
            metadata=batch.get("metadata"),
            **call_kwargs,
        )
        return frames[:, :16]

    @property
    def trainable_patterns(self):
        return tuple(self.full_trainable_modules)


class SVDActionModule(SVDModule):
    def __init__(
        self,
        *args,
        adapter_modules=SVD_ADAPTER_SITES,
        action_proj_model=None,
        action_embedder=None,
        ref_fusion_type: str = "mean",
        drop_prob: float = 0.0,
        **kwargs,
    ):
        self.adapter_modules = tuple(adapter_modules)
        self.action_embedder = action_embedder or VideoMAEEmbedder()
        self.action_proj_model = action_proj_model
        self.ref_fusion_type = ref_fusion_type
        self.drop_prob = drop_prob
        kwargs.setdefault("unet", None)
        if kwargs["unet"] is None:
            kwargs["unet"] = UNetSpatioTemporal(
                adapter_sites=self.adapter_modules, dtype=kwargs.get("dtype", jnp.bfloat16)
            )
        super().__init__(*args, **kwargs)

    def build_pipeline(self):
        return SVDActionPipeline(
            self.unet, self.vae, self.image_encoder,
            self.action_embedder, self.action_proj_model, self.ref_fusion_type, self.dtype,
            cache_threshold=self.cache_threshold, quantize=self.quantize,
        )

    def template_action_emb(self, b):
        d = self.action_proj_model.cross_attention_dim
        # token count depends on the projector; one token suffices for init
        n = getattr(self.action_proj_model, "num_queries", None) or getattr(
            self.action_proj_model, "context_tokens", 4
        )
        return jnp.zeros((b, n, d), self.dtype)

    def extra_param_inits(self, rng, batch) -> dict:
        r1, r2 = jax.random.split(rng)
        ref = jnp.asarray(batch["ref_videos"])  # [b, k, f, c, h, w]
        flat = ref.reshape((-1,) + ref.shape[2:])
        emb_params = self.action_embedder.init(r1, flat)
        tokens = self.action_embedder.apply(emb_params, flat[:1])
        proj_params = self.action_proj_model.init(r2, tokens)
        return {"action_embedder": emb_params, "action_proj_model": proj_params}

    def encode_hidden_states(self, params, batch, rng):
        image_emb = self.image_encoder.apply(params["image_encoder"], batch["video"][:, 0])
        ref = jnp.asarray(batch["ref_videos"])
        b, k = ref.shape[:2]
        flat = ref.reshape((b * k,) + ref.shape[2:])
        emb = self.action_embedder.apply(params["action_embedder"], flat)
        emb = emb.reshape(b, k, emb.shape[-2], emb.shape[-1])
        weight = batch.get("ref_video_distance")
        emb = condition_fusion(emb, self.ref_fusion_type, weight=weight)
        action = self.action_proj_model.apply(params["action_proj_model"], emb)
        if self.drop_prob > 0.0:
            # dropout1d over tokens (reference svd/module.py:223)
            keep = jax.random.bernoulli(rng, 1.0 - self.drop_prob, action.shape[:2])
            action = action * keep[..., None] / (1.0 - self.drop_prob)
        return image_emb, action


class SVDCTModule(SVDActionModule):
    def __init__(self, *args, condition_transformer=None, load_model_kwargs=None, **kwargs):
        self.condition_transformer = condition_transformer
        self.load_model_kwargs = load_model_kwargs or {}
        super().__init__(*args, **kwargs)

    def build_pipeline(self):
        return SVDCTPipeline(
            self.unet, self.vae, self.image_encoder, self.condition_transformer, self.dtype,
            cache_threshold=self.cache_threshold, quantize=self.quantize,
        )

    def template_action_emb(self, b):
        proj = self.condition_transformer.vision_proj
        return jnp.zeros((b, proj.num_queries, proj.output_dim), self.dtype)

    def extra_param_inits(self, rng, batch) -> dict:
        ref = jnp.asarray(batch["ref_videos"])
        videos = jnp.concatenate([ref, batch["video"][:, None]], axis=1)
        ct_params = self.condition_transformer.init(rng, videos, videos[:, :, 0])
        return {"condition_transformer": ct_params}

    def encode_hidden_states(self, params, batch, rng):
        image_emb = self.image_encoder.apply(params["image_encoder"], batch["video"][:, 0])
        action = self.condition_transformer.apply(
            params["condition_transformer"], batch, return_loss=False, method="batch_forward"
        )[:, -1]
        return image_emb, action
