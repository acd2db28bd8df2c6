"""Stage-2 training module for the Motion Context Transformer (and
ActionCLIP pretraining) — the standalone CAMA training path the reference
runs from ``configs/motion_transformer/*`` (reference
``condition/module.py:333-351``: train on all positions, val/test ignore the
reference positions)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from motionrag_tpu.models.cama import ActionTransformer

__all__ = ["ActionTransformerModule", "ActionCLIPModule"]


class ActionTransformerModule:
    def __init__(
        self,
        condition_transformer: Optional[ActionTransformer] = None,
        freeze_modules=("condition_model", "vision_model", "vision_proj"),
        full_trainable_modules=("transformer", "condition_proj"),
        lora_trainable_modules=(),
        lora_rank: int = 256,
        eval_pipeline_call_kwargs: dict | None = None,
        **legacy_kwargs,
    ):
        # accept the reference config's flat encoder kwargs too
        if condition_transformer is None:
            condition_transformer = ActionTransformer(**legacy_kwargs)
        self.ct = condition_transformer
        self.freeze_modules = tuple(freeze_modules)
        self.full_trainable_modules = tuple(full_trainable_modules)
        self.lora_trainable_modules = tuple(lora_trainable_modules)
        self.lora_rank = lora_rank

    def init_params(self, rng, batch: dict) -> dict:
        ref = jnp.asarray(batch["ref_videos"])
        videos = jnp.concatenate([ref, jnp.asarray(batch["video"])[:, None]], axis=1)
        return {"condition_transformer": self.ct.init(rng, videos, videos[:, :, 0])}

    def loss(self, params, batch: dict, rng: jax.Array):
        out = self.ct.apply(
            params["condition_transformer"],
            {"ref_videos": jnp.asarray(batch["ref_videos"]),
             "video": jnp.asarray(batch["video"])},
            True, False, method="batch_forward",
        )
        return out.main, {"train/main_loss": out.mse, "train/smooth": out.smooth}

    def validation_loss(self, params, batch: dict, rng: jax.Array):
        out = self.ct.apply(
            params["condition_transformer"],
            {"ref_videos": jnp.asarray(batch["ref_videos"]),
             "video": jnp.asarray(batch["video"])},
            True, True, method="batch_forward",
        )
        return out.main, {"val/main_loss": out.mse, "val/smooth": out.smooth}

    @property
    def trainable_patterns(self):
        # patterns are relative to the single top-level key
        return tuple(
            f"condition_transformer.{m}" for m in self.full_trainable_modules
        )


class ActionCLIPModule:
    """Contrastive text<->motion pretraining wrapper (reference
    ``condition/module.py:15-85``). Text embeddings come precomputed in the
    batch (``text_emb``) or from a provided encoder fn."""

    def __init__(self, action_clip, full_trainable_modules=("resampler",), **_):
        self.model = action_clip
        self.full_trainable_modules = tuple(full_trainable_modules)
        self.lora_trainable_modules = ()
        self.lora_rank = 64

    def init_params(self, rng, batch: dict) -> dict:
        return {
            "action_clip": self.model.init(
                rng, jnp.asarray(batch["video"]), jnp.asarray(batch["text_emb"])
            )
        }

    def loss(self, params, batch: dict, rng: jax.Array):
        loss = self.model.apply(
            params["action_clip"], jnp.asarray(batch["video"]), jnp.asarray(batch["text_emb"])
        )
        return loss, {"train/main_loss": loss}

    @property
    def trainable_patterns(self):
        return tuple(f"action_clip.{m}" for m in self.full_trainable_modules) + (
            "action_clip.logit_scale",
        )
