"""DynamiCrafter latent-diffusion modules (baseline / Action / CAMA-CT).

Functional re-design of the vendored lvdm LightningModules
(``lvdm/models/ddpm3d.py``): hybrid conditioning — channel-concat of the
repeated conditioning-frame latent + cross-attention dict
{prompt, image, action} (``ddpm3d.py:1136-1163, 1378-1382``) — with
v-parameterization training, dynamic latent rescale, independent text/image
dropout, random conditioning frame, and fs conditioning.

Variants:
  - ``DynamiCrafterModule``       = LatentVisualDiffusion (``:1054-1276``)
  - ``DynamiCrafterActionModule`` = LatentActionDiffusion (``:1279-1340``):
    + action_embedder/action_proj, zeros-video uncond at ``uncond_prob``,
    fusion modes
  - ``DynamiCrafterCTModule``     = LatentConditionTransformers
    (``:1343-1358``): CAMA CT produces the action embedding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from motionrag_tpu.models.dynamicrafter.ddim import LVDMSchedule
from motionrag_tpu.models.dynamicrafter.pipeline import DynamiCrafterPipeline
from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D
from motionrag_tpu.models.dynamicrafter.vae import AutoencoderKL2D
from motionrag_tpu.models.encoders.clip_text import CLIPTextEncoder
from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder
from motionrag_tpu.models.fusion import condition_fusion
from motionrag_tpu.models.resampler import Resampler

__all__ = [
    "DynamiCrafterModule",
    "DynamiCrafterActionModule",
    "DynamiCrafterCTModule",
    "cfg_dropout_bands",
    "dynamicrafter_quant_patterns",
]


def dynamicrafter_quant_patterns():
    """(include, exclude) dotted patterns for int8 serving of the lvdm UNet
    (``ops/quant.py``): attention/GEGLU/proj Dense kernels quantize;
    timestep/fs modulation MLPs and the trainable action-adapter branch stay
    bf16 (quality-critical / trainable). Convs are never quantized (only 2-D
    kernels transform)."""
    return (
        ("*",),
        (
            "time_embed",
            "fps_embedding",
            "*.emb_proj",
            "*.to_q_a", "*.to_k_a", "*.to_v_a",
        ),
    )


def cfg_dropout_bands(rng, b: int, p: float):
    """Correlated CFG-dropout bands from ONE uniform draw per sample
    (reference ddpm3d.py:1112-1123): u<p -> drop text only; p<=u<2p -> drop
    both; 2p<=u<3p -> drop image only. Returns (drop_text, drop_img) bools."""
    u = jax.random.uniform(rng, (b,))
    drop_text = u < 2 * p
    drop_img = (u >= p) & (u < 3 * p)
    return drop_text, drop_img


class DynamiCrafterModule:
    def __init__(
        self,
        unet: Optional[UNet3D] = None,
        vae: Optional[AutoencoderKL2D] = None,
        text_encoder: Optional[CLIPTextEncoder] = None,
        image_encoder: Optional[CLIPImageEmbedder] = None,
        image_proj: Optional[Resampler] = None,
        scale_factor: float = 0.18215,
        rescale_betas_zero_snr: bool = True,
        use_dynamic_rescale: bool = True,
        base_scale: float = 0.3,
        rand_cond_frame: bool = True,
        uncond_prob: float = 0.05,
        null_prompt_ids=None,
        frame_stride: int = 10,
        cfg_mode: str = "sequential",
        cache_threshold: float = 0.0,
        quantize: str | None = None,
        eval_pipeline_call_kwargs: dict | None = None,
        freeze_modules=("vae", "text_encoder", "image_encoder"),
        full_trainable_modules=(),
        lora_trainable_modules=(),
        lora_rank: int = 64,
        dtype=jnp.bfloat16,
    ):
        self.unet = unet or UNet3D(dtype=dtype)
        self.vae = vae or AutoencoderKL2D(dtype=dtype)
        self.text_encoder = text_encoder or CLIPTextEncoder(dtype=dtype)
        # OpenCLIP-V2 token contract: all blocks, no ln_post (reference
        # FrozenOpenCLIPImageEmbedderV2, condition.py:263-341)
        self.image_encoder = image_encoder or CLIPImageEmbedder(
            pooled=False, final_tokens=True, dtype=dtype
        )
        self.image_proj = image_proj or Resampler(
            dim=1024, depth=4, dim_head=64, heads=12, num_queries=16,
            embedding_dim=1280, output_dim=1024, video_length=16, dtype=dtype,
        )
        self.scale_factor = scale_factor
        self.schedule = LVDMSchedule(
            rescale_betas_zero_snr=rescale_betas_zero_snr,
            use_dynamic_rescale=use_dynamic_rescale,
            base_scale=base_scale,
        )
        self.cfg_mode = cfg_mode
        self.cache_threshold = float(cache_threshold)
        # opt-in int8 W8A8 UNet serving (ops/quant.py): eval-only, the frozen
        # backbone is quantized once per param tree and cached
        self.quantize = quantize
        self._quant_cache = None
        self.rand_cond_frame = rand_cond_frame
        self.uncond_prob = uncond_prob
        # token ids of the tokenized empty prompt "" (BOS/EOS + padding for a
        # real CLIP tokenizer). The reference's uncond_type='empty_seq'
        # encodes "" for both training dropout and inference uncond
        # (ddpm3d.py:1124, inference.py:242-245); zeros is the tokenizer-less
        # fallback.
        self.null_prompt_ids = (
            None if null_prompt_ids is None
            else jnp.asarray(null_prompt_ids, jnp.int32)
        )
        self.frame_stride = frame_stride
        self.eval_pipeline_call_kwargs = dict(eval_pipeline_call_kwargs or {})
        self.freeze_modules = tuple(freeze_modules)
        self.full_trainable_modules = tuple(full_trainable_modules)
        self.lora_trainable_modules = tuple(lora_trainable_modules)
        self.lora_rank = lora_rank
        self.dtype = dtype
        self.pipe = self.build_pipeline()

    def build_pipeline(self):
        return DynamiCrafterPipeline(self, cfg_mode=self.cfg_mode,
                                     cache_threshold=self.cache_threshold,
                                     quantize=self.quantize)

    # -- init --------------------------------------------------------------

    def template_action_emb(self, b):
        return None

    def extra_param_inits(self, rng, batch) -> dict:
        return {}

    def init_params(self, rng, batch: dict) -> dict:
        video = jnp.asarray(batch["video"], jnp.float32)
        b, f, c, h, w = video.shape
        rngs = jax.random.split(rng, 5)
        frames = video.reshape(b * f, c, h, w).transpose(0, 2, 3, 1).astype(self.dtype)
        vae_params = self.vae.init(rngs[0], frames[:1])
        ids = jnp.asarray(batch.get("prompt_ids", jnp.zeros((b, 77), jnp.int32)))
        text_params = self.text_encoder.init(rngs[1], ids)
        clip_params = self.image_encoder.init(rngs[2], video[:, 0])
        img_tokens = self.image_encoder.apply(clip_params, video[:, 0])
        # tokens unrepeated; per-frame structure = the resampler's f*n_q
        # latent queries (see image_context)
        proj_params = self.image_proj.init(rngs[3], img_tokens)
        image_ctx = self.image_proj.apply(proj_params, img_tokens)

        sample = jnp.zeros((b, f, h // 8, w // 8, self.unet.in_channels), self.dtype)
        context = {
            "prompt": jnp.zeros((b, ids.shape[1], self.unet.context_dim), self.dtype),
            "image": image_ctx.astype(self.dtype),
            "action": self.template_action_emb(b),
        }
        unet_params = self.unet.init(rngs[4], sample, jnp.zeros((b,)), context)
        params = {
            "unet": unet_params, "vae": vae_params, "text_encoder": text_params,
            "image_encoder": clip_params, "image_proj": proj_params,
        }
        params.update(self.extra_param_inits(rngs[4], batch))
        return params

    # -- conditioning ------------------------------------------------------

    def encode_first_stage(self, params, video, rng=None):
        """[-1,1] [b, f, c, h, w] -> latents [b, f, h/8, w/8, 4] x scale."""
        b, f, c, h, w = video.shape
        frames = video.reshape(b * f, c, h, w).transpose(0, 2, 3, 1).astype(self.dtype)
        z = self.vae.apply(params["vae"], frames, rng, method="encode")
        z = z.reshape(b, f, h // 8, w // 8, -1)
        return z.astype(jnp.float32) * self.scale_factor

    def image_context(self, params, cond_frames):
        """[b, c, h, w] frames -> per-frame image context [b, f*n_q, 1024].

        The image tokens go to the resampler UNREPEATED ([b, 257, 1280]);
        the per-frame structure lives in the resampler's f*n_q latent
        queries, exactly as the reference feeds image_proj_model
        (``inference.py:189-190``, ``ddpm3d.py:1133-1134``). An earlier
        version tiled the tokens f times, which shifts softmax mass in
        PerceiverAttention's concat(x, latents) keys — caught by the
        whole-pipeline parity test."""
        tokens = self.image_encoder.apply(params["image_encoder"], cond_frames)
        return self.image_proj.apply(params["image_proj"], tokens)

    def action_context(self, params, batch, rng, train: bool = True):
        return None

    def uncond_action_context(self, params, batch):
        """Inference-time unconditional action branch (matches the training
        dropout branch of each subclass; reference inference.py:249-258)."""
        return None

    def null_ids(self, b: int, length: int):
        """[b, length] token ids of the empty prompt."""
        if self.null_prompt_ids is None:
            return jnp.zeros((b, length), jnp.int32)
        ids = self.null_prompt_ids[:length]
        ids = jnp.pad(ids, (0, length - ids.shape[0]))
        return jnp.broadcast_to(ids[None], (b, length))

    # -- training ----------------------------------------------------------

    def loss(self, params, batch: dict, rng: jax.Array):
        video = jnp.asarray(batch["video"])
        b, f, c, h, w = video.shape
        rngs = jax.random.split(rng, 7)

        # frozen first-stage: constants w.r.t. trainables — run under the
        # fused Pallas GroupNorm (no-VJP kernel, guarded by stop_gradient;
        # the XLA GroupNorm's fp32 materializations dominated the measured
        # 26.6 GB train-step OOM at 16f 320x512)
        from motionrag_tpu.ops.norms import pallas_norms

        with pallas_norms():
            z = self.encode_first_stage(params, video, rngs[0])
        z = jax.lax.stop_gradient(z)

        # random conditioning frame (reference ddpm3d.py:1127-1128)
        if self.rand_cond_frame:
            cond_idx = jax.random.randint(rngs[1], (), 0, f)
        else:
            cond_idx = 0
        cond_frame = jax.lax.dynamic_index_in_dim(video, cond_idx, axis=1, keepdims=False)

        # correlated CFG-dropout bands from ONE uniform draw; text dropout
        # substitutes the ENCODED null prompt ""; image dropout zeroes the
        # image BEFORE CLIP — identical to the inference-time uncond branches.
        drop_text, drop_img = cfg_dropout_bands(rngs[2], b, self.uncond_prob)

        # tokenizer-less data paths carry string prompts, which the trainer
        # strips before jit — fall back to null-token ids like eval does
        ids = jnp.asarray(batch.get("prompt_ids", jnp.zeros((b, 77), jnp.int32)))
        prompt = self.text_encoder.apply(params["text_encoder"], ids)
        null_prompt = self.text_encoder.apply(
            params["text_encoder"], self.null_ids(b, ids.shape[1])
        )
        prompt = jnp.where(drop_text[:, None, None], null_prompt, prompt)
        masked_frame = jnp.where(
            drop_img[:, None, None, None], jnp.zeros_like(cond_frame), cond_frame
        )
        image_ctx = self.image_context(params, masked_frame)
        action = self.action_context(params, batch, rngs[4])

        # hybrid conditioning: channel-concat the repeated cond-frame latent
        cond_z = jax.lax.dynamic_index_in_dim(z, cond_idx, axis=1, keepdims=True)
        c_concat = jnp.broadcast_to(cond_z, z.shape)

        t = jax.random.randint(rngs[5], (b,), 0, self.schedule.num_timesteps)
        noise = jax.random.normal(rngs[6], z.shape, jnp.float32)
        x_noisy = self.schedule.q_sample(z, noise, t)
        target = self.schedule.get_v(z, noise, t)

        unet_in = jnp.concatenate(
            [x_noisy.astype(self.dtype), c_concat.astype(self.dtype)], axis=-1
        )
        context = {
            "prompt": prompt.astype(self.dtype),
            "image": image_ctx.astype(self.dtype),
            "action": None if action is None else action.astype(self.dtype),
        }
        fs = jnp.full((b,), float(self.frame_stride), jnp.float32)
        pred = self.unet.apply(params["unet"], unet_in, t, context, fs=fs).astype(jnp.float32)

        loss = jnp.mean(jnp.square(pred - target))
        return loss, {"train/main_loss": loss}

    # -- evaluation --------------------------------------------------------

    def _quantized_unet_params(self, tree):
        """int8 copy of the UNet params, cached by leaf identity (see
        ``CogVideoX5B._quantized_transformer_params`` for the HBM caveat)."""
        from motionrag_tpu.ops.quant import QuantizedTreeCache

        if self._quant_cache is None:
            self._quant_cache = QuantizedTreeCache()
        include, exclude = dynamicrafter_quant_patterns()
        return self._quant_cache.get(tree, include, exclude)

    def eval_pipeline(self, params, batch: dict, rng: jax.Array, **kwargs):
        call_kwargs = dict(self.eval_pipeline_call_kwargs)
        call_kwargs.update(kwargs)
        if self.quantize:
            params = {**params, "unet": self._quantized_unet_params(params["unet"])}
        frames = self.pipe(params, batch, rng, **call_kwargs)
        return frames[:, :16]

    @property
    def trainable_patterns(self):
        return tuple(self.full_trainable_modules)


class DynamiCrafterActionModule(DynamiCrafterModule):
    def __init__(
        self,
        *args,
        action_embedder=None,
        action_proj=None,
        ref_fusion_type: str = "mean",
        action_uncond_prob: float = 0.05,
        **kwargs,
    ):
        self.action_embedder = action_embedder
        self.action_proj = action_proj
        self.ref_fusion_type = ref_fusion_type
        self.action_uncond_prob = action_uncond_prob
        if kwargs.get("unet") is None:
            kwargs["unet"] = UNet3D(
                action_cross_attention=True, dtype=kwargs.get("dtype", jnp.bfloat16)
            )
        super().__init__(*args, **kwargs)

    def template_action_emb(self, b):
        n = getattr(self.action_proj, "num_queries", 16)
        d = getattr(self.action_proj, "output_dim", self.unet.context_dim)
        return jnp.zeros((b, n, d), self.dtype)

    def extra_param_inits(self, rng, batch) -> dict:
        r1, r2 = jax.random.split(rng)
        ref = jnp.asarray(batch["ref_videos"])
        flat = ref.reshape((-1,) + ref.shape[2:])
        emb_params = self.action_embedder.init(r1, flat)
        tokens = self.action_embedder.apply(emb_params, flat[:1])
        proj_params = self.action_proj.init(r2, tokens)
        return {"action_embedder": emb_params, "action_proj": proj_params}

    def action_context(self, params, batch, rng, train: bool = True):
        ref = jnp.asarray(batch["ref_videos"])
        b, k = ref.shape[:2]
        # uncond zeros-video branch at uncond_prob (reference ddpm3d.py:1314);
        # training-time only — the eval pipeline computes the cond branch
        if train:
            drop = jax.random.bernoulli(rng, self.action_uncond_prob, (b,))
            ref = jnp.where(drop[:, None, None, None, None, None], jnp.zeros_like(ref), ref)
        flat = ref.reshape((b * k,) + ref.shape[2:])
        emb = self.action_embedder.apply(params["action_embedder"], flat)
        emb = emb.reshape(b, k, emb.shape[-2], emb.shape[-1])
        emb = condition_fusion(emb, self.ref_fusion_type, weight=batch.get("ref_video_distance"))
        return self.action_proj.apply(params["action_proj"], emb)

    def uncond_action_context(self, params, batch):
        """Zeros video through embedder+proj (reference inference.py:250-252
        embeds a SINGLE zero video). Under 'concat' fusion the cond branch
        carries k*t tokens, so the uncond tokens are tiled k-fold — duplicate
        K/V tokens leave attention output unchanged, keeping shapes static."""
        ref = jnp.asarray(batch["ref_videos"])
        zero = jnp.zeros_like(ref[:, 0])
        emb = self.action_embedder.apply(params["action_embedder"], zero)
        if self.ref_fusion_type == "concat":
            emb = jnp.tile(emb, (1, ref.shape[1], 1))
        return self.action_proj.apply(params["action_proj"], emb)


class DynamiCrafterCTModule(DynamiCrafterActionModule):
    def __init__(self, *args, condition_transformer=None, **kwargs):
        self.condition_transformer = condition_transformer
        kwargs.setdefault("action_embedder", None)
        kwargs.setdefault("action_proj", None)
        super().__init__(*args, **kwargs)

    def template_action_emb(self, b):
        proj = self.condition_transformer.vision_proj
        return jnp.zeros((b, proj.num_queries, proj.output_dim), self.dtype)

    def extra_param_inits(self, rng, batch) -> dict:
        ref = jnp.asarray(batch["ref_videos"])
        videos = jnp.concatenate([ref, batch["video"][:, None]], axis=1)
        ct_params = self.condition_transformer.init(rng, videos, videos[:, :, 0])
        return {"condition_transformer": ct_params}

    def action_context(self, params, batch, rng, train: bool = True):
        cond = self.condition_transformer.apply(
            params["condition_transformer"],
            {"ref_videos": batch["ref_videos"], "video": batch["video"]},
            return_loss=False, method="batch_forward",
        )[:, -1]
        if not train:
            return cond
        # zeros-video uncond branch at uncond_prob (reference
        # ddpm3d.py:1352-1355: encode_vision on zeros, not a CT forward)
        b = cond.shape[0]
        drop = jax.random.bernoulli(rng, self.action_uncond_prob, (b,))
        uncond = self.uncond_action_context(params, batch)
        return jnp.where(drop[:, None, None], uncond, cond)

    def uncond_action_context(self, params, batch):
        """encode_vision on a zeros video (reference inference.py:256-258)."""
        ref = jnp.asarray(batch["ref_videos"])
        return self.condition_transformer.apply(
            params["condition_transformer"],
            jnp.zeros_like(ref[:, 0:1]), method="encode_vision",
        )[:, 0]
