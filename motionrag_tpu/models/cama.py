"""CAMA — Context-Aware Motion Adaptation (the heart of MotionRAG).

Flax re-design of the reference's ``src/projects/condition/module.py``:

  - ``ActionTransformer`` (Motion Context Transformer): causal in-context
    learner over per-video motion tokens. K retrieved reference videos are
    encoded (VideoMAE motion tokens -> Perceiver Resampler, 25 tokens each),
    ordered least->most similar, target appended; DINO first-frame features
    (-> Resampler + per-video sinusoid PE) are *added* as conditions; a
    learned SOS token is prepended; a block-causal mask (frame i attends
    <= i) lets position k predict video k's motion tokens from the preceding
    context (reference ``condition/module.py:255-351``).
  - ``ConditionTransformer``: decoder-variant parent (cross-attn to
    conditions) used for image/skill settings (``module.py:88-198``).
  - ``SkillTransformer``: multi-step keyframe variant (``module.py:201-245``).
  - ``ActionCLIP``: contrastive text<->motion pretraining with cross-device
    gather (``module.py:15-85``); the reference's grad-synced
    ``all_gather`` becomes ``jax.lax.all_gather`` over the dp axis.

All modules are pure-functional; trainable-vs-frozen selection happens in the
trainer via optax masks (training/optim.py), not by module surgery.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from motionrag_tpu.ops.attention import block_causal_mask
from motionrag_tpu.ops.posemb import sinusoid_table

__all__ = [
    "SinusoidPositionalEmbeddings",
    "ActionTransformer",
    "ConditionTransformer",
    "SkillTransformer",
    "ActionCLIP",
    "CTLoss",
    "mse_loss",
    "smooth_l1_loss",
]


class SinusoidPositionalEmbeddings:
    """Additive fixed sinusoid PE (reference
    ``position_embeddings.py:149-174``). Stateless — safe to pass into any
    module from the config layer."""

    def __init__(self, dim: int, max_length: int):
        self.dim = dim
        self.max_length = max_length

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        seq = x.shape[-2]
        assert seq <= self.max_length, f"seq {seq} > max_length {self.max_length}"
        table = sinusoid_table(self.max_length, self.dim)[:seq]
        return x + table.astype(x.dtype)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


@flax.struct.dataclass
class CTLoss:
    main: jnp.ndarray
    mse: jnp.ndarray
    smooth: jnp.ndarray


class ActionTransformer(nn.Module):
    """Motion Context Transformer (reference ``condition/module.py:255-351``)."""

    vision_model: nn.Module
    vision_proj: nn.Module
    condition_model: nn.Module
    condition_proj: nn.Module
    transformer: nn.Module
    vision_pe: Optional[Callable] = None
    condition_pe: Optional[Callable] = None

    def setup(self):
        nq = self.vision_proj.num_queries
        dim = self.vision_proj.output_dim
        self.sos_token = self.param(
            "sos_token",
            lambda key: nn.initializers.normal(1.0)(key, (1, nq, dim)) / dim ** 0.5,
        )

    def encode_vision(self, videos: jnp.ndarray) -> jnp.ndarray:
        """[b, k, t, c, h, w] videos -> [b, k, l, c] motion tokens."""
        b, k = videos.shape[:2]
        tokens = self.vision_model(videos.reshape((b * k,) + videos.shape[2:]))
        emb = self.vision_proj(tokens)
        return emb.reshape(b, k, emb.shape[-2], emb.shape[-1])

    def encode_condition(self, condition: jnp.ndarray) -> jnp.ndarray:
        """[b, k, c, h, w] first frames -> [b, k*l, c]; the sinusoid PE is
        applied per-video window (reference parent encode_condition runs
        before the (b k) merge, ``module.py:270-276``)."""
        b, k = condition.shape[:2]
        emb = self.condition_model(condition.reshape((b * k,) + condition.shape[2:]))
        emb = self.condition_proj(emb)
        if self.condition_pe is not None:
            emb = self.condition_pe(emb)
        return emb.reshape(b, k * emb.shape[-2], emb.shape[-1])

    def __call__(
        self,
        visions: jnp.ndarray,
        condition: jnp.ndarray,
        return_loss: bool = True,
        ignore_ref_loss: bool = False,
    ):
        vision_emb = self.encode_vision(visions)  # [b, t, l, c]
        condition_emb = self.encode_condition(condition)  # [b, t*l, c]
        b, num_frames, frame_tokens, d = vision_emb.shape

        sos = jnp.broadcast_to(
            self.sos_token.astype(vision_emb.dtype), (b,) + self.sos_token.shape[1:]
        )
        x = jnp.concatenate(
            [sos, vision_emb[:, :-1].reshape(b, -1, d)], axis=1
        )
        if self.vision_pe is not None:
            x = self.vision_pe(x)
        x = x + condition_emb.astype(x.dtype)

        mask = block_causal_mask(num_frames, frame_tokens)
        pred = self.transformer(x, mask=mask)
        pred = pred.reshape(b, num_frames, frame_tokens, d)

        if not return_loss:
            return pred
        if ignore_ref_loss:
            pred_l, gt = pred[:, -1:], vision_emb[:, -1:]
        else:
            pred_l, gt = pred, vision_emb
        mse = mse_loss(pred_l, gt)
        smooth = smooth_l1_loss(pred_l, gt)
        return CTLoss(main=mse, mse=mse, smooth=smooth)

    def batch_forward(self, batch: dict, return_loss: bool = True, ignore_ref_loss: bool = False):
        """Assemble (refs reversed to least->most similar, target appended)
        and run forward (reference ``module.py:317-323``)."""
        ref_videos = jnp.flip(batch["ref_videos"], axis=1)
        videos = jnp.concatenate([ref_videos, batch["video"][:, None]], axis=1)
        ref_images = videos[:, :, 0]
        return self(videos, ref_images, return_loss, ignore_ref_loss)

    def predict(self, batch: dict, do_classifier_free_guidance: bool = False) -> jnp.ndarray:
        """Adapted motion tokens for the target position; optionally stacked
        with the uncond (zeros-video) branch for CFG (reference
        ``module.py:325-331``)."""
        action_emb = self.batch_forward(batch, return_loss=False)[:, -1]
        if do_classifier_free_guidance:
            zeros = jnp.zeros_like(batch["ref_videos"][:, 0:1])
            uncond = self.encode_vision(zeros)[:, 0]
            action_emb = jnp.concatenate([uncond, action_emb], axis=0)
        return action_emb


class ConditionTransformer(nn.Module):
    """Decoder-based parent variant: visions as target sequence, conditions
    as cross-attention memory (reference ``module.py:88-198``)."""

    vision_model: nn.Module
    vision_proj: nn.Module
    condition_model: nn.Module
    condition_proj: nn.Module
    transformer: nn.Module
    vision_pe: Optional[Callable] = None
    condition_pe: Optional[Callable] = None

    def encode_vision(self, images: jnp.ndarray) -> jnp.ndarray:
        b, t = images.shape[:2]
        emb = self.vision_model(images.reshape((b * t,) + images.shape[2:]))
        emb = self.vision_proj(emb)
        return emb.reshape(b, t, emb.shape[-2], emb.shape[-1])

    def encode_condition(self, condition) -> jnp.ndarray:
        emb = self.condition_model(condition)
        emb = self.condition_proj(emb)
        if self.condition_pe is not None:
            emb = self.condition_pe(emb)
        return emb

    def get_loss(self, pred, emb):
        return mse_loss(pred, emb[:, 1:])

    def __call__(self, visions, condition, return_loss: bool = True):
        vision_emb = self.encode_vision(visions)
        condition_emb = self.encode_condition(condition)
        b, num_frames, frame_tokens, d = vision_emb.shape

        mask = block_causal_mask(num_frames - 1, frame_tokens)
        x = vision_emb[:, :-1].reshape(b, -1, d)
        if self.vision_pe is not None:
            x = self.vision_pe(x)
        pred = self.transformer(x, condition_emb, tgt_mask=mask)
        pred = pred.reshape(b, num_frames - 1, frame_tokens, d)
        if return_loss:
            return self.get_loss(pred, vision_emb)
        return jnp.concatenate([vision_emb[:, 0:1], pred], axis=1)

    def autoregressive(self, images, condition, return_loss: bool = False,
                       num_frames: Optional[int] = None):
        """Autoregressive rollout (reference ``condition/module.py:177-198``):
        start from frame 0's embedding and repeatedly re-run the decoder,
        feeding each iteration's predictions back as the token prefix.
        Shapes grow per iteration, so each rollout length compiles once —
        fine for the <=250-token CT sequences this serves (eval/analysis)."""
        t = images.shape[1] if num_frames is None else num_frames
        vision_emb = self.encode_vision(images)
        condition_emb = self.encode_condition(condition)
        b, _, frame_tokens, d = vision_emb.shape

        x = x_0 = vision_emb[:, 0]
        for i in range(1, t):
            mask = block_causal_mask(i, frame_tokens)
            x = jnp.concatenate([x_0, x], axis=1) if i > 1 else x
            if self.vision_pe is not None:
                x = self.vision_pe(x)
            x = self.transformer(x, condition_emb, tgt_mask=mask)

        x = x.reshape(b, t - 1, frame_tokens, d)
        if return_loss:
            return self.get_loss(x, vision_emb)
        return jnp.concatenate([vision_emb[:, 0:1], x], axis=1)


class SkillTransformer(ConditionTransformer):
    """Skill-step variant: per-step prompts, context-weighted loss
    (reference ``module.py:201-245``)."""

    context_weight: float = 0.0

    def encode_condition(self, condition) -> jnp.ndarray:
        # condition: [b, steps, ...] already-encoded text embedding tensor
        b, steps = condition.shape[:2]
        emb = ConditionTransformer.encode_condition(
            self, condition.reshape((b * steps,) + condition.shape[2:])
        )
        return emb.reshape(b, steps * emb.shape[-2], emb.shape[-1])

    def get_loss(self, pred, emb):
        gt = emb[:, 1:]
        base = mse_loss(pred, gt)
        if self.context_weight:
            context = jnp.broadcast_to(emb[:, 0:1], pred.shape)
            base = base + mse_loss(pred, context) * self.context_weight
        return base


class ActionCLIP(nn.Module):
    """Contrastive text <-> motion pretraining (reference ``module.py:15-85``).

    ``axis_name`` enables the cross-device batch gather (grad-synced, matching
    the reference's Lightning ``all_gather(sync_grads=True)``)."""

    action_model: nn.Module
    text_model: nn.Module
    resampler: nn.Module
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, video: jnp.ndarray, text_emb: jnp.ndarray) -> jnp.ndarray:
        import numpy as np

        logit_scale = self.param(
            "logit_scale", lambda key: jnp.asarray(np.log(1 / 0.07), jnp.float32)
        )
        action_emb = self.action_model(video)
        action_cls, _ = self.resampler(action_emb, return_cls_tokens=True)

        if self.axis_name is not None:
            text_emb = jax.lax.all_gather(text_emb, self.axis_name).reshape(-1, text_emb.shape[-1])
            action_cls = jax.lax.all_gather(action_cls, self.axis_name).reshape(-1, action_cls.shape[-1])

        logits = (
            text_emb.astype(jnp.float32)
            @ action_cls.astype(jnp.float32).T
            * jnp.exp(logit_scale)
        )
        labels = jnp.arange(logits.shape[0])
        loss_t = _cross_entropy(logits, labels)
        loss_a = _cross_entropy(logits.T, labels)
        return (loss_t + loss_a) / 2


def _cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
