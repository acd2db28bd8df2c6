"""CLIP scores: t2v (text <-> mean frame similarity) and v2v (frame-wise
similarity between two videos), x100 (reference ``src/metrics/clip.py``).

The reference uses open_clip ViT-bigG; here the image tower is our CLIP ViT
(pooled + projected) and text features come either from a provided
``text_feature_fn`` or a precomputed cache (the reference ships
``src/data/text_cache.py`` for exactly this pattern)."""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from motionrag_tpu.metrics.base import Metric

__all__ = ["CLIPScore"]


class CLIPScore(Metric):
    higher_is_better = True

    def __init__(
        self,
        mode: str = "t2v",
        image_feature_fn: Optional[Callable] = None,
        text_feature_fn: Optional[Callable] = None,
    ):
        super().__init__()
        assert mode in ("t2v", "v2v")
        self.mode = mode
        if image_feature_fn is None:
            import jax
            import jax.numpy as jnp

            from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder

            model = CLIPImageEmbedder(resize_mode="crop")
            params = {}
            apply = jax.jit(lambda p, f: model.apply(p, f)[:, 0])

            def image_feature_fn(frames_u8):
                frames = jnp.asarray(frames_u8, jnp.float32) / 127.5 - 1.0
                if not params:
                    params.update(model.init(jax.random.key(0), frames[:1]))
                return np.asarray(apply(dict(params), frames))

        self.image_feature_fn = image_feature_fn
        self.text_feature_fn = text_feature_fn
        self.add_state("clip_score", 0.0)
        self.add_state("num_samples", 0)

    @staticmethod
    def _norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    def _video_features(self, video_u8):
        return self._norm(np.asarray(self.image_feature_fn(video_u8), np.float64))

    def update(self, videos1: np.ndarray, arg2):
        assert videos1.ndim == 5
        if self.mode == "t2v":
            texts = arg2
            assert len(texts) == len(videos1)
            for video, text in zip(videos1, texts):
                vf = self._video_features(video)
                if isinstance(text, str):
                    assert self.text_feature_fn is not None, "need text_feature_fn for raw strings"
                    tf = np.asarray(self.text_feature_fn([text]), np.float64)[0]
                else:
                    tf = np.asarray(text, np.float64)
                tf = tf / np.linalg.norm(tf)
                self.clip_score += float(100.0 * (vf * tf).sum(axis=-1).mean())
                self.num_samples += 1
        else:
            for v1, v2 in zip(videos1, arg2):
                f1 = self._video_features(v1)
                f2 = self._video_features(v2)
                self.clip_score += float(100.0 * (f1 * f2).sum(axis=-1).mean())
                self.num_samples += 1

    def compute(self) -> float:
        return self.clip_score / self.num_samples
