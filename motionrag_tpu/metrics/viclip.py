"""ViCLIP scores (video-native CLIP t2v / v2v, reference
``src/metrics/viclip.py:12-54``: 8-frame uniform sampling).

The video backbone is the real ViCLIP-L/14 joint space-time encoder
(models/encoders/viclip.py, the InternVideo architecture behind the
reference's trust_remote_code model), loaded turnkey from
``$MRT_METRIC_WEIGHTS_DIR/viclip_vision.pt`` when present. Without weights
the 8-frame VideoMAE mean-pool stand-in keeps the metric math exercised.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from motionrag_tpu.metrics.base import Metric

__all__ = ["ViCLIPScore"]


def viclip_video_feature_fn(params=None):
    """Real ViCLIP-L video features (reference preprocessing: resize 224
    bicubic-ish, center crop, ImageNet normalize — viclip.py:24-30)."""
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.encoders.condition import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        preprocess_frames,
    )
    from motionrag_tpu.models.encoders.viclip import ViCLIPVision

    model = ViCLIPVision()
    state = {"params": params}
    apply = jax.jit(lambda p, v: model.apply(p, v))

    def fn(videos_u8: np.ndarray) -> np.ndarray:
        video = jnp.asarray(videos_u8, jnp.float32) / 255.0 * 2.0 - 1.0
        video = preprocess_frames(video, 224, IMAGENET_MEAN, IMAGENET_STD)
        if state["params"] is None:
            state["params"] = model.init(jax.random.key(0), video[:1])
        return np.asarray(apply(state["params"], video))

    return fn


def _default_video_feature_fn():
    from motionrag_tpu.metrics.weights import load_metric_weights
    from motionrag_tpu.models.encoders.viclip import port_viclip_vision

    variables = load_metric_weights("viclip_vision", port_viclip_vision)
    if variables is not None:
        return viclip_video_feature_fn(variables)

    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.encoders.condition import VideoMAEEmbedder

    model = VideoMAEEmbedder(num_frames=8)
    params = {}
    apply = jax.jit(lambda p, v: jnp.mean(model.apply(p, v), axis=1))

    def fn(videos_u8: np.ndarray) -> np.ndarray:
        video = jnp.asarray(videos_u8, jnp.float32) / 127.5 - 1.0
        if not params:
            params.update(model.init(jax.random.key(0), video[:1]))
        return np.asarray(apply(dict(params), video))

    return fn


class ViCLIPScore(Metric):
    higher_is_better = True

    def __init__(
        self,
        mode: str = "v2v",
        video_feature_fn: Optional[Callable] = None,
        text_feature_fn: Optional[Callable] = None,
        num_frames: int = 8,
    ):
        super().__init__()
        assert mode in ("t2v", "v2v")
        self.mode = mode
        self.video_feature_fn = video_feature_fn or _default_video_feature_fn()
        self.text_feature_fn = text_feature_fn
        self.num_frames = num_frames
        self.add_state("score", 0.0)
        self.add_state("num_samples", 0)

    def _sample(self, videos: np.ndarray) -> np.ndarray:
        t = videos.shape[1]
        idx = np.linspace(0, t - 1, self.num_frames).round().astype(int)
        return videos[:, idx]

    def _feat(self, videos: np.ndarray) -> np.ndarray:
        f = np.asarray(self.video_feature_fn(self._sample(videos)), np.float64)
        return f / np.linalg.norm(f, axis=-1, keepdims=True)

    def update(self, videos1: np.ndarray, arg2):
        assert videos1.ndim == 5
        f1 = self._feat(videos1)
        if self.mode == "v2v":
            f2 = self._feat(np.asarray(arg2))
        else:
            assert self.text_feature_fn is not None or not isinstance(arg2[0], str)
            f2 = np.asarray(
                self.text_feature_fn(arg2) if isinstance(arg2[0], str) else arg2,
                np.float64,
            )
            f2 = f2 / np.linalg.norm(f2, axis=-1, keepdims=True)
        self.score += float((100.0 * (f1 * f2).sum(axis=-1)).sum())
        self.num_samples += len(videos1)

    def compute(self) -> float:
        return self.score / self.num_samples
