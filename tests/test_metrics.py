"""Metrics tests: Frechet math vs scipy reference, score identities
(identical inputs -> perfect scores), motion KL behavior, callbacks."""

import numpy as np
import pytest

from motionrag_tpu.metrics.action import ActionScore
from motionrag_tpu.metrics.clip_score import CLIPScore
from motionrag_tpu.metrics.dino import DINOScore
from motionrag_tpu.metrics.frechet import FrechetDistance, frechet_distance
from motionrag_tpu.metrics.motion import MotionDistance


def rand_videos(rng, n=4, t=5, h=24, w=32):
    return rng.integers(0, 255, (n, t, 3, h, w), dtype=np.uint8)


def test_frechet_distance_math():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 8))
    b = rng.standard_normal((500, 8)) + 2.0
    mu1, c1 = a.mean(0), np.cov(a, rowvar=False)
    mu2, c2 = b.mean(0), np.cov(b, rowvar=False)
    d_same = frechet_distance(mu1, c1, mu1, c1)
    d_diff = frechet_distance(mu1, c1, mu2, c2)
    assert abs(d_same) < 1e-6
    assert d_diff > 8 * 3.0  # |mu diff|^2 = 8 * 4 approx


def test_frechet_metric_accumulation():
    rng = np.random.default_rng(1)
    feature_fn = lambda v: v.reshape(len(v), -1)[:, :16].astype(np.float64)
    m = FrechetDistance(feature_fn, 16)
    vids = rand_videos(rng, n=8)
    m.update(vids, real=True)
    m.update(vids, real=False)
    # rank-deficient covariances make sqrtm slightly noisy; near-zero is fine
    assert m.compute() == pytest.approx(0.0, abs=0.05)
    m.reset()
    m.update(vids, real=True)
    m.update(np.zeros_like(vids), real=False)
    assert m.compute() > 1.0


def test_action_score_identity():
    rng = np.random.default_rng(2)
    feature_fn = lambda v: v.reshape(len(v), -1).astype(np.float64) + 1.0
    m = ActionScore(feature_fn)
    vids = rand_videos(rng)
    m.update(vids, vids)
    assert m.compute() == pytest.approx(100.0, abs=1e-6)
    m.reset()
    m.update(vids, 255 - vids)
    assert m.compute() < 100.0


def test_dino_score_with_stub():
    rng = np.random.default_rng(3)
    feature_fn = lambda frames: frames.reshape(len(frames), -1).astype(np.float64) + 1.0
    m = DINOScore(feature_fn)
    vids = rand_videos(rng, n=2)
    m.update(vids, vids)
    assert m.compute() == pytest.approx(100.0, abs=1e-6)


def test_clip_score_v2v_and_t2v():
    rng = np.random.default_rng(4)
    feature_fn = lambda frames: frames.reshape(len(frames), -1)[:, :8].astype(np.float64) + 1.0
    m = CLIPScore(mode="v2v", image_feature_fn=feature_fn)
    vids = rand_videos(rng, n=2)
    m.update(vids, vids)
    assert m.compute() == pytest.approx(100.0, abs=1e-4)

    m = CLIPScore(mode="t2v", image_feature_fn=feature_fn)
    text_emb = [np.ones(8), np.ones(8)]
    m.update(vids, text_emb)
    assert 0 < m.compute() <= 100.0


def test_motion_distance_static_vs_moving():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    static = np.stack([base] * 6).transpose(0, 3, 1, 2)[None]
    moving = np.stack(
        [np.roll(base, shift=4 * i, axis=1) for i in range(6)]
    ).transpose(0, 3, 1, 2)[None]
    m = MotionDistance()
    m.update(static, static)
    same_kl = m.compute()
    m.reset()
    m.update(static, moving)  # pred static, gt moving
    diff_kl = m.compute()
    assert same_kl == pytest.approx(0.0, abs=1e-9)
    assert diff_kl > same_kl


def test_metric_logger_callback():
    from motionrag_tpu.metrics.callbacks import MetricLogger

    feature_fn = lambda v: v.reshape(len(v), -1).astype(np.float64) + 1.0
    logger = MetricLogger("action", lambda: ActionScore(feature_fn))
    rng = np.random.default_rng(6)
    vids = rand_videos(rng, n=2)
    out = logger.on_eval_epoch_end(None, "test", [vids], [vids], ["a", "b"])
    assert out["test/action"] == pytest.approx(100.0, abs=1e-6)

    # failure degrades to NaN, not crash
    bad = MetricLogger("bad", lambda: ActionScore(lambda v: 1 / 0))
    out = bad.on_eval_epoch_end(None, "test", [vids], [vids], ["a", "b"])
    assert np.isnan(out["test/bad"])


def test_i3d_forward_shape():
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.metrics.i3d import I3D

    model = I3D(num_classes=10)
    vids = jnp.zeros((1, 9, 3, 64, 64), jnp.uint8)
    params = model.init(jax.random.key(0), vids)
    out = model.apply(params, vids)
    assert out.shape == (1, 10)


def test_inception_v3_shape_and_params():
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.metrics.inception import InceptionV3

    model = InceptionV3()
    frames = jnp.zeros((1, 3, 64, 64), jnp.uint8)
    variables = model.init(jax.random.key(0), frames)
    out = model.apply(variables, frames)
    assert out.shape == (1, 2048)
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    # torchvision InceptionV3 feature extractor ~21.8M params
    assert 20e6 < n < 24e6, f"param count {n/1e6:.1f}M out of range"


def test_raft_shapes_and_shift_direction():
    """RAFT plumbing: output shape, and with random weights the flow should
    at least be finite; with a simple translated pattern the iterative
    refinement must run all iters without NaN."""
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.metrics.raft import RAFT

    model = RAFT(iters=2)
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (1, 3, 32, 48)).astype(np.float32)
    img2 = np.roll(img, shift=4, axis=-1)
    params = model.init(jax.random.key(0), jnp.asarray(img), jnp.asarray(img2))
    flow = model.apply(params, jnp.asarray(img), jnp.asarray(img2))
    assert flow.shape == (1, 2, 32, 48)
    assert np.isfinite(np.asarray(flow)).all()
