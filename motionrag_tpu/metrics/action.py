"""Action Score: cosine similarity x100 between pred/gt classifier features
(reference ``src/metrics/action.py:10-61``)."""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from motionrag_tpu.metrics.base import Metric

__all__ = ["ActionScore", "I3DActionScore", "MAEActionScore"]


class ActionScore(Metric):
    higher_is_better = True

    def __init__(self, feature_fn: Callable):
        super().__init__()
        self.feature_fn = feature_fn
        self.add_state("action_score", 0.0)
        self.add_state("num_samples", 0)

    def update(self, preds: np.ndarray, target: np.ndarray):
        assert preds.shape == target.shape and preds.ndim == 5
        pf = np.asarray(self.feature_fn(preds), np.float64)
        tf = np.asarray(self.feature_fn(target), np.float64)
        pf /= np.linalg.norm(pf, axis=1, keepdims=True)
        tf /= np.linalg.norm(tf, axis=1, keepdims=True)
        self.action_score += float((100.0 * (pf * tf).sum(axis=1)).sum())
        self.num_samples += len(preds)

    def compute(self) -> float:
        return self.action_score / self.num_samples


class I3DActionScore(ActionScore):
    def __init__(self, feature_fn: Optional[Callable] = None):
        if feature_fn is None:
            from motionrag_tpu.metrics.frechet import _default_i3d_feature_fn

            feature_fn = _default_i3d_feature_fn()
        super().__init__(feature_fn)


class MAEActionScore(ActionScore):
    """VideoMAE-ssv2 classifier features (reference uses the HF
    classification head logits; here: our VideoMAE ViT mean-pooled tokens, or
    a ported classifier head via ``feature_fn``)."""

    def __init__(self, feature_fn: Optional[Callable] = None):
        if feature_fn is None:
            import jax
            import jax.numpy as jnp

            from motionrag_tpu.models.encoders.condition import VideoMAEEmbedder

            model = VideoMAEEmbedder()
            params = {}
            apply = jax.jit(lambda p, v: jnp.mean(model.apply(p, v), axis=1))

            def feature_fn(videos_u8):
                video = jnp.asarray(videos_u8, jnp.float32) / 127.5 - 1.0
                if not params:
                    params.update(model.init(jax.random.key(0), video[:1]))
                return np.asarray(apply(dict(params), video))

        super().__init__(feature_fn)
