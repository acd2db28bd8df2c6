"""CogVideoX image-to-video pipelines (baseline / Motion-Adapter / CAMA-CT).

Re-design of the reference's diffusers pipeline subclasses
(``src/projects/cogvideox/pipeline.py``). The reference smuggles the action
embedding through the ``image_rotary_emb`` tuple into monkey-patched
processors (``pipeline.py:46-57``); here it is an explicit transformer
argument. The denoise loop (text CFG batch-2, DDIM or DPM) is fully jitted.

Text conditioning: pass ``prompt_ids`` (+ ``negative_prompt_ids``) tokenized
host-side (tools/text tokenizer or precomputed cache — the reference's
``text_cache.py`` pattern), or precomputed ``prompt_embeds``.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from motionrag_tpu.models.cogvideox.scheduler import (
    CogVideoXSchedule,
    ddim_sample_loop,
    dpm_sample_loop,
)
from motionrag_tpu.models.fusion import condition_fusion
from motionrag_tpu.ops.norms import pallas_norms

__all__ = [
    "CogVideoXImageToVideoPipeline",
    "CogVideoXImageToVideoActionPipeline",
    "CogVideoXImageToVideoCTPipeline",
]


class CogVideoXImageToVideoPipeline:
    def __init__(self, transformer, vae, text_encoder, scheduler: str = "ddim",
                 cfg_mode: str = "batched", null_prompt_ids=None, dtype=jnp.bfloat16,
                 cache_threshold: float = 0.0, quantize: str | None = None):
        self.transformer = transformer
        self.vae = vae
        self.text_encoder = text_encoder
        # T5 tokenization of the empty negative prompt "": a single </s>
        # (id 1) followed by <pad> (id 0) — diffusers CogVideoX encodes
        # negative_prompt="" through T5 rather than using a zeros embedding
        self.null_prompt_ids = (
            jnp.asarray(null_prompt_ids, jnp.int32)
            if null_prompt_ids is not None else jnp.asarray([1], jnp.int32)
        )
        self.scheduler_name = scheduler
        # 'batched' = reference-style 2x batch; 'sequential' halves the
        # activation peak (the 5.57B DiT + batch-2 activations brush the
        # 16GB-HBM ceiling on one v5e)
        self.cfg_mode = cfg_mode
        self.schedule = CogVideoXSchedule()
        self.dtype = dtype
        # opt-in adaptive output caching (scheduler.ddim_sample_loop
        # docstring); 0.0 = exact reference protocol
        self.cache_threshold = float(cache_threshold)
        # opt-in int8 W8A8 serving of the DiT (ops/quant.py): expects the
        # transformer params pre-transformed by quantize_dense_tree
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.quantize = quantize

    def _transformer_apply(self, variables, *args, **kwargs):
        if self.quantize:
            from motionrag_tpu.ops.quant import quantized_calls

            with quantized_calls():
                return self.transformer.apply(variables, *args, **kwargs)
        return self.transformer.apply(variables, *args, **kwargs)

    # -- conditioning ------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self",))
    def encode_prompt(self, params, prompt_ids, attention_mask=None):
        return self.text_encoder.apply(params["text_encoder"], prompt_ids, attention_mask)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _encode_image_latent(self, params, img_vid):
        return self.vae.apply(params["vae"], img_vid.astype(self.dtype), method="encode")

    @functools.partial(jax.jit, static_argnames=("self",))
    def _decode_chunk(self, variables, z):
        return self.vae.apply(variables, z, True, method="decode", mutable=("cache",))

    @functools.partial(jax.jit, static_argnames=("self",))
    def _decode_whole(self, variables, z):
        return self.vae.apply(variables, z, method="decode")

    def _decode_latents(self, params, latents, frame_batch_size: int = 2,
                        schedule=None):
        """Streaming frame-batched decode (the reference's default diffusers
        decode path). Caps per-launch activation memory AND device-program
        runtime — both load-bearing at 49f where a monolithic decode OOMs.
        At most two chunk shapes compile; conv caches stay on device.

        Always traces under ``pallas_norms``: the full-res decoder stages
        brush the 16 GB HBM ceiling (measured: 15.77 used / 15.75 at 17f
        480x720 with the XLA GroupNorm's fp32 materializations — a direct
        caller that skipped the pipeline-level context OOMed by 26 MB), and
        the fused kernel removes those fp32 copies."""
        from motionrag_tpu.models.cogvideox.vae3d import decode_chunked

        with pallas_norms():
            if schedule is None and latents.shape[1] <= frame_batch_size + 1:
                return self._decode_whole(params["vae"], latents.astype(self.dtype))
            return decode_chunked(
                self.vae, params["vae"], latents.astype(self.dtype), frame_batch_size,
                decode_fn=lambda variables, z, mutable: self._decode_chunk(variables, z),
                schedule=schedule,
            )

    def prepare_action_embeddings(self, params, ref_videos, metadata, rng=None,
                                  do_classifier_free_guidance=False, image=None):
        return None

    # -- core sampling -----------------------------------------------------

    @functools.partial(
        jax.jit,
        static_argnames=(
            "self", "num_inference_steps", "use_dynamic_cfg", "scheduler", "step_range"
        ),
    )
    def _sample(
        self,
        params,
        noise,
        image_latents,
        prompt_embeds,
        negative_embeds,
        action_emb,
        guidance_scale,
        num_inference_steps: int,
        use_dynamic_cfg: bool = False,
        scheduler: str = "ddim",
        step_range: tuple | None = None,
        dpm_carry=None,
        sampler_rng=None,
    ):
        text2 = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)

        def one_call(x, t, text, action):
            b = x.shape[0]
            model_in = jnp.concatenate(
                [x.astype(self.dtype), image_latents.astype(self.dtype)], axis=-1
            )
            return self._transformer_apply(
                params["transformer"], model_in, text.astype(self.dtype),
                jnp.broadcast_to(t, (b,)), action_emb=action,
            )

        def denoise_fn(x, t):
            b = x.shape[0]
            if self.cfg_mode == "batched":
                x2 = jnp.concatenate([x, x], axis=0)
                img2 = jnp.concatenate([image_latents, image_latents], axis=0)
                model_in = jnp.concatenate(
                    [x2.astype(self.dtype), img2.astype(self.dtype)], axis=-1
                )
                v = self._transformer_apply(
                    params["transformer"], model_in, text2.astype(self.dtype),
                    jnp.broadcast_to(t, (2 * b,)), action_emb=action_emb,
                )
                return v[:b], v[b:]
            # sequential CFG as a length-2 lax.map over the stacked
            # uncond/cond conditioning: ONE DiT body in the compiled program
            # (vs two inlined copies — halves sampler HLO and cold-compile
            # time), executed twice sequentially — identical math and the
            # same half-batch activation peak as the two explicit calls
            texts = jnp.stack([negative_embeds, prompt_embeds])
            if action_emb is None:
                preds = jax.lax.map(lambda tx: one_call(x, t, tx, None), texts)
            else:
                a_un, a_c = jnp.split(action_emb, 2, axis=0)
                preds = jax.lax.map(
                    lambda c: one_call(x, t, c[0], c[1]),
                    (texts, jnp.stack([a_un, a_c])),
                )
            return preds[0], preds[1]

        if scheduler == "ddim":
            return ddim_sample_loop(
                self.schedule, denoise_fn, noise, num_inference_steps,
                guidance_scale=guidance_scale, use_dynamic_cfg=use_dynamic_cfg,
                step_range=step_range,
                cache_threshold=self.cache_threshold,
                cache_carry=dpm_carry if self.cache_threshold > 0 else None,
                return_cache=self.cache_threshold > 0 and step_range is not None,
            )
        return dpm_sample_loop(
            self.schedule, denoise_fn, noise, num_inference_steps,
            guidance_scale=guidance_scale, rng=sampler_rng,
            step_range=step_range,
            init_carry=dpm_carry, return_carry=step_range is not None,
        )

    def _sample_segmented(
        self, params, noise, image_latents, prompt_embeds, negative_embeds,
        action_emb, guidance_scale, num_inference_steps: int,
        use_dynamic_cfg: bool, scheduler: str, steps_per_launch: int,
        sampler_rng=None,
    ):
        """Split the denoise loop into several device launches. The tunneled
        v5e runtime kills single programs running past ~60 s; the 5.57B DiT
        at 50 steps x 2 CFG runs ~110 s in one program. Identical math —
        lax.fori_loop over [lo, hi) segments with the state carried."""
        x = noise
        carry = None
        for lo in range(0, num_inference_steps, steps_per_launch):
            hi = min(lo + steps_per_launch, num_inference_steps)
            out = self._sample(
                params, x, image_latents, prompt_embeds, negative_embeds,
                action_emb, guidance_scale, num_inference_steps,
                use_dynamic_cfg, scheduler, (lo, hi),
                dpm_carry=carry, sampler_rng=sampler_rng,
            )
            if scheduler == "ddim" and self.cache_threshold <= 0:
                x = out
            else:
                x, carry = out
        return x

    def __call__(
        self,
        params,
        image: jnp.ndarray,
        rng: jax.Array,
        prompt_ids: Optional[jnp.ndarray] = None,
        negative_prompt_ids: Optional[jnp.ndarray] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        ref_videos=None,
        metadata=None,
        num_frames: int = 17,
        height: int = 480,
        width: int = 720,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        steps_per_launch: int | None = 20,
        latents=None,
        **unused: Any,
    ) -> jnp.ndarray:
        """image: [-1,1] [b, c, h, w] -> video [-1,1] [b, f, c, h, w]."""
        b = image.shape[0]
        rng_lat, rng_img, rng_act, rng_smp = jax.random.split(rng, 4)

        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(params, prompt_ids)
        if negative_prompt_embeds is None:
            if negative_prompt_ids is None:
                # encoded empty prompt (T5 ""), padded to the prompt length
                ids = self.null_prompt_ids[: prompt_embeds.shape[1]]
                ids = jnp.pad(ids, (0, prompt_embeds.shape[1] - ids.shape[0]))
                negative_prompt_ids = jnp.broadcast_to(ids[None], (b, ids.shape[0]))
            negative_prompt_embeds = self.encode_prompt(
                params, jnp.asarray(negative_prompt_ids)
            )

        # image -> single-frame video latent, zero-padded over time
        img_vid = image.transpose(0, 2, 3, 1)[:, None]  # [b, 1, h, w, 3]
        img_latent = self._encode_image_latent(params, img_vid)  # [b, 1, h/8, w/8, C]
        f_lat = (num_frames - 1) // 4 + 1
        pad = jnp.zeros(
            (b, f_lat - 1) + img_latent.shape[2:], img_latent.dtype
        )
        image_latents = jnp.concatenate([img_latent, pad], axis=1)

        action_emb = self.prepare_action_embeddings(
            params, ref_videos, metadata, rng_act,
            do_classifier_free_guidance=True, image=image,
        )

        # diffusers-style ``latents=`` initial-noise injection (also how the
        # whole-pipeline parity test shares x_T with the torch mirror chain)
        if latents is not None:
            noise = jnp.asarray(latents).astype(self.dtype)
        else:
            noise = jax.random.normal(
                rng_lat,
                (b, f_lat, height // 8, width // 8, self.vae.latent_channels),
                jnp.float32,
            ).astype(self.dtype)

        with pallas_norms():
            if steps_per_launch and steps_per_launch < num_inference_steps:
                latents = self._sample_segmented(
                    params, noise, image_latents, prompt_embeds,
                    negative_prompt_embeds, action_emb, guidance_scale,
                    num_inference_steps, use_dynamic_cfg, self.scheduler_name,
                    steps_per_launch, sampler_rng=rng_smp,
                )
            else:
                latents = self._sample(
                    params, noise, image_latents, prompt_embeds, negative_prompt_embeds,
                    action_emb, guidance_scale, num_inference_steps,
                    use_dynamic_cfg, self.scheduler_name, sampler_rng=rng_smp,
                )
            frames = self._decode_latents(params, latents)
        # [b, f, h, w, 3] -> [b, f, 3, h, w]
        return frames.transpose(0, 1, 4, 2, 3)


class CogVideoXImageToVideoActionPipeline(CogVideoXImageToVideoPipeline):
    def __init__(self, transformer, vae, text_encoder, action_embedder,
                 action_proj_model, ref_fusion_type: str = "mean", scheduler="ddim",
                 dtype=jnp.bfloat16, **kwargs):
        super().__init__(transformer, vae, text_encoder, scheduler=scheduler,
                         dtype=dtype, **kwargs)
        self.action_embedder = action_embedder
        self.action_proj_model = action_proj_model
        self.ref_fusion_type = ref_fusion_type

    def prepare_action_embeddings(self, params, ref_videos, metadata, rng=None,
                                  do_classifier_free_guidance=False, image=None):
        b, k = ref_videos.shape[:2]
        flat = ref_videos.reshape((b * k,) + ref_videos.shape[2:])
        emb = self.action_embedder.apply(params["action_embedder"], flat)
        emb = emb.reshape(b, k, emb.shape[-2], emb.shape[-1])
        weight = None
        if metadata:
            weight = [m.get("ref_video_distance") for m in metadata]
        emb = condition_fusion(emb, self.ref_fusion_type, weight=weight)
        if do_classifier_free_guidance:
            uncond = self.action_embedder.apply(
                params["action_embedder"], jnp.zeros_like(ref_videos[:, 0])
            )
            emb = jnp.concatenate([uncond, emb], axis=0)
        return self.action_proj_model.apply(params["action_proj_model"], emb)


class CogVideoXImageToVideoCTPipeline(CogVideoXImageToVideoPipeline):
    def __init__(self, transformer, vae, text_encoder, condition_transformer,
                 scheduler="ddim", dtype=jnp.bfloat16, **kwargs):
        super().__init__(transformer, vae, text_encoder, scheduler=scheduler,
                         dtype=dtype, **kwargs)
        self.condition_transformer = condition_transformer

    def prepare_action_embeddings(self, params, ref_videos, metadata, rng=None,
                                  do_classifier_free_guidance=False, image=None):
        f = ref_videos.shape[2]
        if image is not None:
            video = jnp.repeat(image[:, None], f, axis=1)
        else:
            video = ref_videos[:, 0]
        batch = {"ref_videos": ref_videos, "video": video}
        return self.condition_transformer.apply(
            params["condition_transformer"], batch,
            do_classifier_free_guidance=do_classifier_free_guidance, method="predict",
        )
