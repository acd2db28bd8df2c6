"""DynamiCrafter image-guided synthesis pipeline.

Re-design of the vendored ``image_guided_synthesis`` driver (reference
``DynamiCrafter/scripts/evaluation/inference.py:174-305`` + the thin
wrappers at ``src/projects/dynamicrafter/pipelines/pipeline.py``): build the
hybrid cond/uncond dicts (text + per-frame image tokens + action branch,
channel-concat cond-frame latent), run the jitted DDIM loop with batched-2x
CFG, per-frame VAE decode (``perframe_ae``, ``ddpm3d.py:676-685``).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from motionrag_tpu.models.dynamicrafter.ddim import ddim_sample
from motionrag_tpu.ops.norms import pallas_norms

__all__ = ["DynamiCrafterPipeline", "DynamiCrafterPipelineRef"]


class DynamiCrafterPipeline:
    def __init__(self, module, cfg_mode: str = "sequential",
                 cache_threshold: float = 0.0, quantize: str | None = None):
        self.module = module
        # 'batched' = reference-style 2x batch per step (ddim.py:218-237);
        # 'sequential' = two half-batch UNet calls, identical math, half the
        # activation peak — needed for 16f 1024x576 on a 16GB-HBM chip
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
                return self.module.unet.apply(variables, *args, **kwargs)
        return self.module.unet.apply(variables, *args, **kwargs)

    @functools.partial(jax.jit, static_argnames=("self", "num_frames"))
    def _conditioning(self, params, video, prompt_ids, neg_ids, num_frames: int):
        """One jitted conditioning phase (eager op-by-op dispatch through the
        device tunnel dominated wall-clock before; see SVD pipeline note)."""
        module = self.module
        b = video.shape[0]
        image = video[:, 0]
        z_cond = module.encode_first_stage(params, image[:, None])  # [b,1,h/8,w/8,4]
        c_concat = jnp.broadcast_to(z_cond, (b, num_frames) + z_cond.shape[2:])
        prompt = module.text_encoder.apply(
            params["text_encoder"], jnp.asarray(prompt_ids)
        )
        # encoded null prompt "" (reference uncond_type='empty_seq',
        # inference.py:242-245) — same branch the training dropout substitutes
        if neg_ids is None:
            neg_ids = module.null_ids(prompt.shape[0], prompt_ids.shape[1])
        uncond_prompt = module.text_encoder.apply(params["text_encoder"], neg_ids)
        image_ctx = module.image_context(params, image)
        uncond_image_ctx = module.image_context(params, jnp.zeros_like(image))
        return c_concat, prompt, uncond_prompt, image_ctx, uncond_image_ctx

    @functools.partial(jax.jit, static_argnames=("self",))
    def _decode_frames(self, params, z):
        return self.module.vae.apply(params["vae"], z, method="decode")

    def _decode_chunked(self, params, z, chunk: int):
        """perframe_ae-style decode (reference ``ddpm3d.py:676-685`` decodes
        frame-by-frame): at 1024x576 a single 16-frame decode needs ~19 GB of
        decoder activations — chunking bounds the peak."""
        outs = [
            self._decode_frames(params, z[i : i + chunk])
            for i in range(0, z.shape[0], chunk)
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    @functools.partial(jax.jit, static_argnames=(
        "self", "num_steps", "guidance_rescale_f", "eta_f", "spacing"))
    def _sample(self, params, noise, c_concat, ctx_cond, ctx_uncond, fs,
                guidance_scale, num_steps: int, guidance_rescale_f: float = 0.0,
                eta_f: float = 0.0, spacing: str = "uniform_trailing",
                sampler_rng=None):
        module = self.module

        def unet_call(x, t, ctx):
            b = x.shape[0]
            unet_in = jnp.concatenate(
                [x.astype(module.dtype), c_concat.astype(module.dtype)], axis=-1
            )
            return self._unet_apply(
                params["unet"], unet_in, jnp.broadcast_to(t, (b,)), ctx, fs=fs
            )

        def denoise_fn(x, t):
            b = x.shape[0]
            if self.cfg_mode == "batched":
                x2 = jnp.concatenate([x, x], axis=0)
                cc2 = jnp.concatenate([c_concat, c_concat], axis=0)
                unet_in = jnp.concatenate(
                    [x2.astype(module.dtype), cc2.astype(module.dtype)], axis=-1
                )
                ctx2 = {}
                for key in ("prompt", "image", "action"):
                    c, u = ctx_cond.get(key), ctx_uncond.get(key)
                    ctx2[key] = None if c is None else jnp.concatenate([c, u], axis=0)
                fs2 = jnp.concatenate([fs, fs], axis=0)
                pred = self._unet_apply(
                    params["unet"], unet_in, jnp.broadcast_to(t, (2 * b,)), ctx2, fs=fs2
                )
                return pred[:b], pred[b:]
            # sequential CFG as a length-2 lax.map over the stacked
            # cond/uncond contexts: ONE UNet body in the compiled program
            # (vs two inlined copies — halves sampler HLO and cold-compile
            # time), executed twice sequentially — identical math and the
            # same half-batch activation peak as the two explicit calls
            names = ("prompt", "image", "action")
            both = [k for k in names
                    if ctx_cond.get(k) is not None and ctx_uncond.get(k) is not None]
            mismatch = any(
                (ctx_cond.get(k) is None) != (ctx_uncond.get(k) is None)
                for k in names
            ) or any(ctx_cond[k].shape != ctx_uncond[k].shape for k in both)
            if mismatch:
                return unet_call(x, t, ctx_cond), unet_call(x, t, ctx_uncond)
            stacked = {k: jnp.stack([ctx_cond[k], ctx_uncond[k]]) for k in both}
            preds = jax.lax.map(lambda c: unet_call(x, t, c), stacked)
            return preds[0], preds[1]

        return ddim_sample(
            module.schedule, denoise_fn, noise, num_steps,
            guidance_scale=guidance_scale, guidance_rescale=guidance_rescale_f,
            parameterization="v", timestep_spacing=spacing,
            eta=eta_f, rng=sampler_rng,
            cache_threshold=self.cache_threshold,
        )

    def __call__(
        self,
        params,
        batch: dict,
        rng: jax.Array,
        num_frames: int = 16,
        height: int = 320,
        width: int = 512,
        ddim_steps: int = 30,
        unconditional_guidance_scale: float = 7.5,
        # the reference wrapper's eval defaults (pipelines/pipeline.py:28-34):
        # ancestral DDIM eta=1.0, 'uniform' spacing, no guidance rescale —
        # these, not DynamiCrafter's own inference script settings, are what
        # the published MotionRAG protocol ran
        guidance_rescale: float = 0.0,
        ddim_eta: float = 1.0,
        timestep_spacing: str = "uniform",
        fs: float | None = None,
        decode_chunk_size: int = 4,
        latents=None,
        **unused: Any,
    ) -> jnp.ndarray:
        """batch: {'video' [-1,1] [b,f,c,h,w], 'prompt_ids', 'ref_videos'?}
        -> generated video [-1,1] [b, f, c, h, w].

        Reference config spellings are accepted as aliases so the YAMLs port
        verbatim (``num_inference_steps`` -> ddim_steps, ``frame_stride`` ->
        fs — reference ``configs/dynamicrafter/MotionRAG_open.yml:165-171``;
        unknown keys would otherwise be silently swallowed)."""
        ddim_steps = int(unused.pop("num_inference_steps", ddim_steps))
        fs = unused.pop("frame_stride", fs)
        ddim_eta = float(unused.pop("eta", ddim_eta))
        module = self.module
        video = jnp.asarray(batch["video"])
        b = video.shape[0]
        image = video[:, 0]
        rng_lat, rng_act, rng_smp = jax.random.split(rng, 3)

        neg_ids = batch.get("negative_prompt_ids")
        prompt_ids = batch.get("prompt_ids")
        if prompt_ids is None:
            prompt_ids = module.null_ids(b, 77)
        c_concat, prompt, uncond_prompt, image_ctx, uncond_image_ctx = (
            self._conditioning(
                params, video, jnp.asarray(prompt_ids),
                None if neg_ids is None else jnp.asarray(neg_ids), num_frames,
            )
        )

        action = module.action_context(params, batch, rng_act, train=False)
        uncond_action = None
        if action is not None:
            # per-backbone uncond branch identical to the training dropout
            # branch (reference inference.py:249-258)
            uncond_action = module.uncond_action_context(params, batch)

        dtype = module.dtype
        ctx_cond = {
            "prompt": prompt.astype(dtype), "image": image_ctx.astype(dtype),
            "action": None if action is None else action.astype(dtype),
        }
        ctx_uncond = {
            "prompt": uncond_prompt.astype(dtype), "image": uncond_image_ctx.astype(dtype),
            "action": None if uncond_action is None else uncond_action.astype(dtype),
        }

        # explicit initial-latent injection (diffusers-style ``latents=``;
        # also what the x_T kwarg of the reference DDIMSampler.sample allows
        # — used by the whole-pipeline parity test to share x_T with the
        # reference inference path)
        if latents is not None:
            noise = jnp.asarray(latents).astype(dtype)
        else:
            noise = jax.random.normal(
                rng_lat, (b, num_frames, height // 8, width // 8, module.vae.latent_channels),
                jnp.float32,
            ).astype(dtype)
        fs_arr = jnp.full((b,), float(fs if fs is not None else module.frame_stride))

        with pallas_norms():
            latents = self._sample(
                params, noise, c_concat, ctx_cond, ctx_uncond, fs_arr,
                unconditional_guidance_scale, ddim_steps, guidance_rescale,
                eta_f=float(ddim_eta), spacing=timestep_spacing,
                sampler_rng=rng_smp,
            )

            # per-frame VAE decode (perframe_ae)
            z = latents.astype(jnp.float32) / module.scale_factor
            bz, f, hh, ww, cz = z.shape
            frames = self._decode_chunked(
                params, z.reshape(bz * f, hh, ww, cz).astype(dtype), decode_chunk_size
            )
        frames = frames.reshape(bz, f, frames.shape[1], frames.shape[2], 3)
        return frames.transpose(0, 1, 4, 2, 3)


# the Ref variant shares __call__; the action/CT distinction lives in the
# module's action_context (reference pipeline.py:10-115 wrappers)
DynamiCrafterPipelineRef = DynamiCrafterPipeline
