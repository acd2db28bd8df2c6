"""Frechet distance metrics (FVD over I3D features; FID over image
features).

Math matches torchmetrics' FrechetInceptionDistance used by the reference
(``src/metrics/fvd.py``): accumulate feature sum / outer-product sum /
count for real and fake sets; FD = |mu_r - mu_f|^2 + tr(C_r + C_f -
2 sqrt(C_r C_f)). The matrix sqrt runs host-side (scipy) at compute time —
it is O(d^3) once, not per-sample.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from motionrag_tpu.metrics.base import Metric

__all__ = ["FrechetDistance", "FrechetVideoDistance", "FrechetImageDistance"]


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


class FrechetDistance(Metric):
    """Generic Frechet distance over a feature function."""

    higher_is_better = False

    def __init__(self, feature_fn: Callable, num_features: int):
        super().__init__()
        self.feature_fn = feature_fn
        self.num_features = num_features
        d = num_features
        self.add_state("real_sum", np.zeros(d, np.float64))
        self.add_state("real_cov_sum", np.zeros((d, d), np.float64))
        self.add_state("real_n", 0)
        self.add_state("fake_sum", np.zeros(d, np.float64))
        self.add_state("fake_cov_sum", np.zeros((d, d), np.float64))
        self.add_state("fake_n", 0)

    def update(self, videos: np.ndarray, real: bool):
        feat = np.asarray(self.feature_fn(videos), np.float64)
        prefix = "real" if real else "fake"
        setattr(self, f"{prefix}_sum", getattr(self, f"{prefix}_sum") + feat.sum(0))
        setattr(
            self, f"{prefix}_cov_sum", getattr(self, f"{prefix}_cov_sum") + feat.T @ feat
        )
        setattr(self, f"{prefix}_n", getattr(self, f"{prefix}_n") + len(feat))

    @staticmethod
    def _moments(s, c, n):
        mu = s / n
        sigma = (c - n * np.outer(mu, mu)) / max(n - 1, 1)
        return mu, sigma

    def compute(self) -> float:
        assert self.real_n > 1 and self.fake_n > 1, "need >= 2 samples per set"
        mu_r, cov_r = self._moments(self.real_sum, self.real_cov_sum, self.real_n)
        mu_f, cov_f = self._moments(self.fake_sum, self.fake_cov_sum, self.fake_n)
        return frechet_distance(mu_r, cov_r, mu_f, cov_f)


def _default_i3d_feature_fn(dtype=None):
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.metrics.i3d import I3D

    from motionrag_tpu.metrics.weights import load_metric_weights
    from motionrag_tpu.utils.porting_metrics import port_i3d

    model = I3D()
    params = load_metric_weights("i3d", port_i3d)
    apply = jax.jit(lambda p, v: model.apply(p, v))

    def fn(videos_u8: np.ndarray) -> np.ndarray:
        nonlocal params
        if params is None:
            params = model.init(jax.random.key(0), jnp.asarray(videos_u8[:1]))
        return np.asarray(apply(params, jnp.asarray(videos_u8)))

    return fn


class FrechetVideoDistance(FrechetDistance):
    """FVD with I3D 400-d features (reference ``fvd.py:9-18``). Pass a
    ``feature_fn`` wrapping ported I3D weights for real scores."""

    def __init__(self, feature_fn: Optional[Callable] = None, num_features: int = 400):
        super().__init__(feature_fn or _default_i3d_feature_fn(), num_features)


def _default_inception_feature_fn():
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.metrics.inception import InceptionV3

    from motionrag_tpu.metrics.weights import load_metric_weights
    from motionrag_tpu.utils.porting_metrics import port_inception_v3

    model = InceptionV3()
    params = load_metric_weights("inception_v3", port_inception_v3) or {}
    apply = jax.jit(lambda p, f: model.apply(p, f))

    def fn(frames_u8: np.ndarray) -> np.ndarray:
        if not params:
            params.update(model.init(jax.random.key(0), jnp.asarray(frames_u8[:1])))
        return np.asarray(apply(dict(params), jnp.asarray(frames_u8)))

    return fn


class FrechetImageDistance(FrechetDistance):
    """FID over per-frame InceptionV3 pool3 features (2048-d), matching the
    torchmetrics FrechetInceptionDistance the reference applies to frames
    (``fvd.py:29-32``). ``feature_fn`` is pluggable."""

    def __init__(self, feature_fn: Optional[Callable] = None, num_features: int = 2048):
        super().__init__(feature_fn or _default_inception_feature_fn(), num_features)

    def update(self, videos: np.ndarray, real: bool):
        frames = videos.reshape((-1,) + videos.shape[2:])  # [b*t, c, h, w]
        feat = np.asarray(self.feature_fn(frames), np.float64)
        prefix = "real" if real else "fake"
        setattr(self, f"{prefix}_sum", getattr(self, f"{prefix}_sum") + feat.sum(0))
        setattr(
            self, f"{prefix}_cov_sum", getattr(self, f"{prefix}_cov_sum") + feat.T @ feat
        )
        setattr(self, f"{prefix}_n", getattr(self, f"{prefix}_n") + len(feat))
