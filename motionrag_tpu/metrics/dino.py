"""DINO score: per-frame DINOv2 CLS cosine similarity x100 between pred and
gt frames (reference ``src/metrics/dino.py:11-58``)."""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from motionrag_tpu.metrics.base import Metric

__all__ = ["DINOScore"]


class DINOScore(Metric):
    higher_is_better = True

    def __init__(self, feature_fn: Optional[Callable] = None):
        super().__init__()
        if feature_fn is None:
            import jax
            import jax.numpy as jnp

            from motionrag_tpu.models.encoders.condition import DINOImageEmbedder

            model = DINOImageEmbedder()
            params = {}
            apply = jax.jit(lambda p, f: model.apply(p, f)[:, 0])  # CLS token

            def feature_fn(frames_u8):
                frames = jnp.asarray(frames_u8, jnp.float32) / 127.5 - 1.0
                if not params:
                    params.update(model.init(jax.random.key(0), frames[:1]))
                return np.asarray(apply(dict(params), frames))

        self.feature_fn = feature_fn
        self.add_state("dino_score", 0.0)
        self.add_state("num_samples", 0)

    def update(self, preds: np.ndarray, target: np.ndarray):
        assert preds.shape == target.shape and preds.ndim == 5
        for pred, tgt in zip(preds, target):
            pf = np.asarray(self.feature_fn(pred), np.float64)
            tf = np.asarray(self.feature_fn(tgt), np.float64)
            pf /= np.linalg.norm(pf, axis=1, keepdims=True)
            tf /= np.linalg.norm(tf, axis=1, keepdims=True)
            self.dino_score += float(100.0 * (pf * tf).sum(axis=1).mean())
            self.num_samples += 1

    def compute(self) -> float:
        return self.dino_score / self.num_samples
