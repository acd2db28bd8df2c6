"""CogVideoX training/eval modules (baseline / Motion-Adapter / CAMA-CT).

Training math follows the reference (``cogvideox/module.py:82-143``):
v-prediction target via ``get_velocity``, random integer timesteps,
noise-augmented first-frame image latent occupying only latent-frame 0,
channel-concat conditioning, 1/(1-alpha_cumprod) loss weighting.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D
from motionrag_tpu.models.cogvideox.pipeline import (
    CogVideoXImageToVideoActionPipeline,
    CogVideoXImageToVideoCTPipeline,
    CogVideoXImageToVideoPipeline,
)
from motionrag_tpu.models.cogvideox.scheduler import CogVideoXSchedule
from motionrag_tpu.models.cogvideox.vae3d import CogVideoXVAE
from motionrag_tpu.models.encoders.t5 import T5Encoder
from motionrag_tpu.models.fusion import condition_fusion

__all__ = [
    "CogVideoX5B",
    "CogVideoX5BAction",
    "CogVideoX5BActionTransformer",
    "cogvideox_quant_patterns",
]


def cogvideox_quant_patterns():
    """(include, exclude) dotted patterns for int8 serving of the DiT
    (``ops/quant.py``): every block attention/MLP projection quantizes;
    adaLN modulation projections and the Motion-Adapter branch stay bf16
    (quality-critical, negligible FLOPs)."""
    return (
        ("transformer_blocks",),
        (
            "transformer_blocks.*.norm1_linear",
            "transformer_blocks.*.norm2_linear",
            "transformer_blocks.*.processor",
        ),
    )


class CogVideoX5B:
    def __init__(
        self,
        transformer: Optional[CogVideoXTransformer3D] = None,
        vae: Optional[CogVideoXVAE] = None,
        text_encoder: Optional[T5Encoder] = None,
        eval_pipeline_call_kwargs: dict | None = None,
        freeze_modules=("transformer", "vae", "text_encoder"),
        full_trainable_modules=(),
        lora_trainable_modules=(),
        lora_rank: int = 64,
        gradient_checkpointing: bool = False,
        ckpt_path: str | None = None,
        dtype=jnp.bfloat16,
        cfg_mode: str = "sequential",
        cache_threshold: float = 0.0,
        quantize: str | None = None,
    ):
        self.transformer = transformer or CogVideoXTransformer3D(
            remat=gradient_checkpointing, dtype=dtype
        )
        self.vae = vae or CogVideoXVAE(dtype=dtype)
        # text_encoder=False: no on-device T5 — batches must carry
        # precomputed ``prompt_embeds`` (the reference's text-cache idiom,
        # ``src/data/text_cache.py``; mandatory on a single 16 GB chip where
        # the 9.5 GB T5-XXL cannot co-reside with the 11 GB DiT)
        self.text_encoder = (
            None if text_encoder is False else (text_encoder or T5Encoder(dtype=dtype))
        )
        self.eval_pipeline_call_kwargs = dict(eval_pipeline_call_kwargs or {})
        self.scheduler_name = self.eval_pipeline_call_kwargs.pop("scheduler", "ddim")
        # with text_encoder=False there is no text_encoder subtree — keep the
        # default freeze list from tripping the Trainer's dead-pattern warning
        self.freeze_modules = tuple(
            m for m in freeze_modules
            if not (m == "text_encoder" and self.text_encoder is None))
        self.full_trainable_modules = tuple(full_trainable_modules)
        self.lora_trainable_modules = tuple(lora_trainable_modules)
        self.lora_rank = lora_rank
        self.ckpt_path = ckpt_path
        self.dtype = dtype
        # 'sequential' CFG halves the activation peak (the single-v5e
        # measured configuration); 'batched' is the reference 2x-batch mode.
        self.cfg_mode = cfg_mode
        self.cache_threshold = float(cache_threshold)
        # opt-in int8 W8A8 DiT serving (ops/quant.py docstring): eval-only —
        # the frozen backbone is quantized once per param tree and cached
        self.quantize = quantize
        self._quant_cache = None
        self.schedule = CogVideoXSchedule()
        self.pipe = self.build_pipeline()

    def build_pipeline(self):
        return CogVideoXImageToVideoPipeline(
            self.transformer, self.vae, self.text_encoder,
            scheduler=self.scheduler_name, cfg_mode=self.cfg_mode,
            dtype=self.dtype, cache_threshold=self.cache_threshold,
            quantize=self.quantize,
        )

    def _quantized_transformer_params(self, tree):
        """int8 copy of the DiT params, cached by leaf identity
        (``ops.quant.QuantizedTreeCache``). NOTE: the cache keeps one extra
        (int8) copy alive alongside the fp tree — fine for CPU tests/eval;
        single-chip serving at 5B scale should quantize once at load and
        drop the fp tree (tools/bench_cogvideox)."""
        from motionrag_tpu.ops.quant import QuantizedTreeCache

        if self._quant_cache is None:
            self._quant_cache = QuantizedTreeCache()
        include, exclude = cogvideox_quant_patterns()
        return self._quant_cache.get(tree, include, exclude)

    # -- init --------------------------------------------------------------

    def template_action_emb(self, b):
        return None

    def extra_param_inits(self, rng, batch) -> dict:
        return {}

    def init_params(self, rng, batch: dict) -> dict:
        video = jnp.asarray(batch["video"], jnp.float32)
        b, f, c, h, w = video.shape
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        vid_nhwc = video.transpose(0, 1, 3, 4, 2).astype(self.dtype)
        vae_params = self.vae.init(r1, vid_nhwc)
        ids = jnp.asarray(batch.get("prompt_ids", jnp.zeros((b, 16), jnp.int32)))
        t5_params = None if self.text_encoder is None else self.text_encoder.init(r2, ids)
        f_lat = (f - 1) // 4 + 1
        sample = jnp.zeros(
            (b, f_lat, h // 8, w // 8, self.transformer.in_channels), self.dtype
        )
        text = jnp.zeros((b, ids.shape[1], self.transformer.text_embed_dim), self.dtype)
        dit_params = self.transformer.init(
            r3, sample, text, jnp.zeros((b,), jnp.int32),
            action_emb=self.template_action_emb(b),
        )
        params = {"transformer": dit_params, "vae": vae_params}
        if t5_params is not None:
            params["text_encoder"] = t5_params
        params.update(self.extra_param_inits(r4, batch))
        return params

    # -- training ----------------------------------------------------------

    def action_embedding_for_training(self, params, batch, rng):
        return None

    def loss(self, params, batch: dict, rng: jax.Array):
        video = jnp.asarray(batch["video"])
        b, f, c, h, w = video.shape
        rngs = jax.random.split(rng, 7)

        if "prompt_embeds" in batch:
            # text-cache path (reference ``src/data/text_cache.py`` idiom):
            # embeddings precomputed offline/off-step, T5 never resident
            prompt_embeds = jnp.asarray(batch["prompt_embeds"])
        elif self.text_encoder is None:
            raise ValueError(
                "text_encoder=False requires precomputed 'prompt_embeds' in "
                "the batch (data.text_cache)")
        else:
            prompt_embeds = self.text_encoder.apply(
                params["text_encoder"],
                jnp.asarray(batch.get("prompt_ids", jnp.zeros((b, 16), jnp.int32))),
            )

        t = jax.random.randint(rngs[0], (b,), 0, self.schedule.num_train_timesteps)

        vid_nhwc = video.transpose(0, 1, 3, 4, 2).astype(self.dtype)
        # The frozen VAE's latents are CONSTANTS w.r.t. every trainable
        # parameter, so the encodes run under the fused Pallas GroupNorm
        # (no-VJP inference kernel, guarded by the stop_gradient below).
        # Without it the XLA GroupNorm materializes four full-res fp32
        # copies inside the train step — 9+ GB at 17f 480x720, the measured
        # OOM of stage-1 adapter training on a 16 GB chip.
        from motionrag_tpu.ops.norms import pallas_norms

        with pallas_norms():
            latents = self.vae.apply(
                params["vae"], vid_nhwc, rngs[1], method="encode")
        latents = jax.lax.stop_gradient(latents.astype(jnp.float32))

        noise = jax.random.normal(rngs[2], latents.shape, jnp.float32)
        noisy_latents = self.schedule.add_noise(latents, noise, t)

        # noise-augmented first-frame latent occupies latent-frame 0 only
        image = vid_nhwc[:, :1]
        sigma = jnp.exp(-3.0 + 0.5 * jax.random.normal(rngs[3], (1,), jnp.float32))
        noisy_image = image + jax.random.normal(rngs[4], image.shape) * sigma
        with pallas_norms():
            img_lat = self.vae.apply(
                params["vae"], noisy_image.astype(self.dtype), rngs[5],
                method="encode")
        img_lat = jax.lax.stop_gradient(img_lat.astype(jnp.float32))
        image_latents = jnp.concatenate(
            [img_lat[:, :1], jnp.zeros_like(noisy_latents[:, 1:])], axis=1
        )

        model_in = jnp.concatenate(
            [noisy_latents.astype(self.dtype), image_latents.astype(self.dtype)], axis=-1
        )
        action_emb = self.action_embedding_for_training(params, batch, rngs[6])
        v_pred = self.transformer.apply(
            params["transformer"], model_in, prompt_embeds.astype(self.dtype), t,
            action_emb=action_emb,
        ).astype(jnp.float32)

        latent_pred = self.schedule.get_velocity(v_pred, noisy_latents, t)
        a = self.schedule.alphas_cumprod[t].reshape(b, 1, 1, 1, 1)
        weights = 1.0 / (1.0 - a)
        loss = jnp.mean(weights * jnp.square(latent_pred - latents))
        return loss, {"train/main_loss": loss}

    # -- evaluation --------------------------------------------------------

    def eval_pipeline(self, params, batch: dict, rng: jax.Array, **kwargs) -> jnp.ndarray:
        call_kwargs = dict(self.eval_pipeline_call_kwargs)
        call_kwargs.update(kwargs)
        sample_method = call_kwargs.pop("sample_method", "first")
        if self.quantize:
            params = {
                **params,
                "transformer": self._quantized_transformer_params(params["transformer"]),
            }
        image = jnp.asarray(batch["video"])[:, 0]
        frames = self.pipe(
            params, image, rng,
            prompt_ids=batch.get("prompt_ids"),
            negative_prompt_ids=batch.get("negative_prompt_ids"),
            ref_videos=batch.get("ref_videos"),
            metadata=batch.get("metadata"),
            **call_kwargs,
        )
        if sample_method == "first":
            frames = frames[:, :16]
        elif sample_method == "uniform":
            import numpy as np

            idx = np.linspace(0, frames.shape[1] - 1, 16).round().astype(int)
            frames = frames[:, idx]
        return frames

    @property
    def trainable_patterns(self):
        return tuple(self.full_trainable_modules)


class CogVideoX5BAction(CogVideoX5B):
    def __init__(
        self,
        *args,
        adapter_modules=(),
        action_proj_model=None,
        action_embedder=None,
        ref_fusion_type: str = "mean",
        drop_prob: float = 0.0,
        adapter_path: str | None = None,
        **kwargs,
    ):
        self.adapter_modules = tuple(adapter_modules)
        self.action_proj_model = action_proj_model
        self.action_embedder = action_embedder
        self.ref_fusion_type = ref_fusion_type
        self.drop_prob = drop_prob
        self.adapter_path = adapter_path
        if kwargs.get("transformer") is None:
            kwargs["transformer"] = CogVideoXTransformer3D(
                adapter_sites=self.adapter_modules,
                remat=kwargs.pop("gradient_checkpointing", False),
                dtype=kwargs.get("dtype", jnp.bfloat16),
            )
        super().__init__(*args, **kwargs)

    def build_pipeline(self):
        return CogVideoXImageToVideoActionPipeline(
            self.transformer, self.vae, self.text_encoder,
            self.action_embedder, self.action_proj_model, self.ref_fusion_type,
            scheduler=self.scheduler_name, cfg_mode=self.cfg_mode,
            dtype=self.dtype, cache_threshold=self.cache_threshold,
            quantize=self.quantize,
        )

    def template_action_emb(self, b):
        d = self.action_proj_model.cross_attention_dim
        n = getattr(self.action_proj_model, "num_queries", None) or getattr(
            self.action_proj_model, "context_tokens", 4
        )
        return jnp.zeros((b, n, d), self.dtype)

    def extra_param_inits(self, rng, batch) -> dict:
        r1, r2 = jax.random.split(rng)
        ref = jnp.asarray(batch["ref_videos"])
        flat = ref.reshape((-1,) + ref.shape[2:])
        emb_params = self.action_embedder.init(r1, flat)
        tokens = self.action_embedder.apply(emb_params, flat[:1])
        proj_params = self.action_proj_model.init(r2, tokens)
        return {"action_embedder": emb_params, "action_proj_model": proj_params}

    def action_embedding_for_training(self, params, batch, rng):
        ref = jnp.asarray(batch["ref_videos"])
        b, k = ref.shape[:2]
        flat = ref.reshape((b * k,) + ref.shape[2:])
        emb = self.action_embedder.apply(params["action_embedder"], flat)
        emb = emb.reshape(b, k, emb.shape[-2], emb.shape[-1])
        emb = condition_fusion(emb, self.ref_fusion_type, weight=batch.get("ref_video_distance"))
        action = self.action_proj_model.apply(params["action_proj_model"], emb)
        if self.drop_prob > 0.0:
            keep = jax.random.bernoulli(rng, 1.0 - self.drop_prob, action.shape[:2])
            action = action * keep[..., None] / (1.0 - self.drop_prob)
        return action


class CogVideoX5BActionTransformer(CogVideoX5BAction):
    def __init__(self, *args, condition_transformer=None, **kwargs):
        self.condition_transformer = condition_transformer
        kwargs.setdefault("action_proj_model", None)
        kwargs.setdefault("action_embedder", None)
        super().__init__(*args, **kwargs)

    def build_pipeline(self):
        return CogVideoXImageToVideoCTPipeline(
            self.transformer, self.vae, self.text_encoder, self.condition_transformer,
            scheduler=self.scheduler_name, cfg_mode=self.cfg_mode,
            dtype=self.dtype, cache_threshold=self.cache_threshold,
            quantize=self.quantize,
        )

    def template_action_emb(self, b):
        proj = self.condition_transformer.vision_proj
        return jnp.zeros((b, proj.num_queries, proj.output_dim), self.dtype)

    def extra_param_inits(self, rng, batch) -> dict:
        ref = jnp.asarray(batch["ref_videos"])
        videos = jnp.concatenate([ref, batch["video"][:, None]], axis=1)
        ct_params = self.condition_transformer.init(rng, videos, videos[:, :, 0])
        return {"condition_transformer": ct_params}

    def action_embedding_for_training(self, params, batch, rng):
        # CFG-style doubled embedding during training too (reference
        # ``cogvideox/module.py:267-270``); the adapter broadcast handles it.
        action = self.pipe.prepare_action_embeddings(
            params, jnp.asarray(batch["ref_videos"]), batch.get("metadata"),
            do_classifier_free_guidance=False, image=jnp.asarray(batch["video"])[:, 0],
        )
        if self.drop_prob > 0.0:
            keep = jax.random.bernoulli(rng, 1.0 - self.drop_prob, action.shape[:2])
            action = action * keep[..., None] / (1.0 - self.drop_prob)
        return action
