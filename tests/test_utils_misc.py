"""Coverage for the small utility modules: text cache, tensor2latent,
visualization, StageTimer (reference ``src/data/text_cache.py``,
``src/utils/{common,visualization}.py``, SURVEY §5.1)."""

import numpy as np
import jax
import jax.numpy as jnp


def test_calc_text_features_and_cache(tmp_path):
    from motionrag_tpu.data.text_cache import TextFeatureCache, calc_text_features

    calls = []

    def encode(prompts):
        calls.append(list(prompts))
        return np.stack([np.full(4, len(p), np.float32) for p in prompts])

    prompts = ["b", "a", "b", "ccc"]
    feats = calc_text_features(prompts, encode, tmp_path / "cache.pkl", batch_size=2)
    assert set(feats) == {"a", "b", "ccc"}  # deduped
    assert sum(len(c) for c in calls) == 3  # unique only
    np.testing.assert_array_equal(feats["ccc"], np.full(4, 3, np.float32))

    cache = TextFeatureCache(tmp_path / "cache.pkl")
    np.testing.assert_array_equal(cache("a"), feats["a"])
    try:
        cache("unseen")
        assert False, "expected KeyError"
    except KeyError:
        pass
    cache2 = TextFeatureCache(tmp_path / "cache.pkl", encode_fn=encode)
    assert cache2("unseen").shape == (4,)  # on-miss encode
    assert "unseen" in cache2.features


def test_tensor2latent_shape_and_scaling():
    from motionrag_tpu.models.dynamicrafter.vae import AutoencoderKL2D
    from motionrag_tpu.utils.common import tensor2latent

    vae = AutoencoderKL2D(block_out_channels=(32, 32, 32, 32), dtype=jnp.float32)
    video = jnp.zeros((1, 2, 3, 32, 32), jnp.float32)
    params = vae.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    z = tensor2latent(video, vae, params)
    assert z.shape[:2] == (1, 2) and z.shape[2:4] == (4, 4)
    z_unscaled = tensor2latent(video, vae, params, scaling=False)
    if hasattr(vae, "scaling_factor"):
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(z_unscaled) * vae.scaling_factor, rtol=1e-6
        )


def test_frame_grid_and_html(tmp_path):
    from motionrag_tpu.utils.visualization import frame_grid, videos_to_html

    video = np.random.default_rng(0).integers(0, 255, (10, 3, 8, 6), dtype=np.uint8)
    grid = frame_grid(video, num_frames=4, pad=2)
    assert grid.shape == (8, 4 * 8 - 2, 3)
    # first tile is frame 0
    np.testing.assert_array_equal(grid[:, :6], video[0].transpose(1, 2, 0))

    out = videos_to_html(["a.mp4", "b.mp4"], tmp_path / "page.html", titles=["x", "y"])
    text = out.read_text()
    assert "a.mp4" in text and "<video" in text and "y" in text


def test_motion_histogram_figure(tmp_path):
    from motionrag_tpu.utils.visualization import motion_histogram_figure

    hist = np.random.default_rng(0).random((5, 16)).astype(np.float32)
    motion_histogram_figure(hist, tmp_path / "hist.png")
    assert (tmp_path / "hist.png").stat().st_size > 0


def test_stage_timer():
    from motionrag_tpu.utils.profiling import StageTimer

    timer = StageTimer(sync=False)
    import time

    with timer.stage("a"):
        time.sleep(0.01)
    with timer.stage("a"):
        time.sleep(0.01)
    with timer.stage("b"):
        pass
    s = timer.summary()
    assert s["a"] >= 0.009 and timer.counts["a"] == 2
    assert "a:" in timer.report() and "b:" in timer.report()
