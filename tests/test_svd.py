"""End-to-end SVD slice tests at tiny sizes: UNet forward shape/jit, EDM
training loss, full sampling pipeline (CFG + chunked decode), adapter branch
effect, CT module integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder, VideoMAEEmbedder
from motionrag_tpu.models.resampler import Resampler
from motionrag_tpu.models.svd.module import SVDActionModule, SVDModule
from motionrag_tpu.models.svd.sampler import edm_precondition, karras_sigmas
from motionrag_tpu.models.svd.unet import UNetSpatioTemporal
from motionrag_tpu.models.svd.vae import AutoencoderKLTemporalDecoder


def tiny_unet(**kw):
    return UNetSpatioTemporal(
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=1,
        cross_attention_dim=48,
        num_attention_heads=(1, 2, 2, 2),
        dtype=jnp.float32,
        **kw,
    )


def tiny_module(cls=SVDModule, **kw):
    return cls(
        unet=kw.pop("unet", tiny_unet()),
        vae=AutoencoderKLTemporalDecoder(
            block_out_channels=(32, 32, 32, 32), dtype=jnp.float32
        ),
        image_encoder=CLIPImageEmbedder(
            image_size=28, patch_size=14, dim=32, depth=1, heads=2,
            projection_dim=48, dtype=jnp.float32,
        ),
        dtype=jnp.float32,
        **kw,
    )


def make_batch(b=1, f=4, h=64, w=64, k=2):
    rng = np.random.default_rng(0)
    return {
        "video": jnp.asarray(rng.uniform(-1, 1, (b, f, 3, h, w)), jnp.float32),
        "ref_videos": jnp.asarray(rng.uniform(-1, 1, (b, k, f, 3, h, w)), jnp.float32),
        "ref_video_distance": jnp.asarray(rng.uniform(0, 0.5, (b, k)), jnp.float32),
    }


@pytest.fixture(scope="module")
def svd_setup():
    module = tiny_module()
    batch = make_batch()
    params = module.init_params(jax.random.key(0), batch)
    return module, params, batch


def test_unet_forward_shape():
    unet = tiny_unet()
    b, f, h, w = 1, 2, 8, 8
    sample = jnp.zeros((b, f, h, w, 8))
    ctx = jnp.zeros((b, 1, 48))
    ids = jnp.zeros((b, 3))
    params = unet.init(jax.random.key(0), sample, jnp.zeros((b,)), ctx, ids)
    out = unet.apply(params, sample, jnp.ones((b,)), ctx, ids)
    assert out.shape == (b, f, h, w, 4)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    assert n_params > 1e5


def test_unet_adapter_branch_changes_output():
    sites = ("mid_block.attentions.0.transformer_blocks.0.attn2.processor",)
    unet = tiny_unet(adapter_sites=sites)
    b, f = 1, 2
    sample = jnp.ones((b, f, 8, 8, 8)) * 0.1
    ctx = jnp.ones((b, 1, 48)) * 0.2
    ids = jnp.zeros((b, 3))
    action = jnp.ones((b, 3, 48)) * 0.3
    params = unet.init(jax.random.key(1), sample, jnp.zeros((b,)), ctx, ids, action_emb=action)
    out1 = unet.apply(params, sample, jnp.ones((b,)), ctx, ids, action_emb=action)
    out2 = unet.apply(params, sample, jnp.ones((b,)), ctx, ids, action_emb=action * 5)
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
    # adapter params exist under the mid-block attn2
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("to_q_ip" in n for n in names)


def test_edm_preconditioning_identities():
    sigmas = jnp.asarray([0.002, 1.0, 700.0])
    c_skip, c_out, c_in, c_noise = edm_precondition(sigmas)
    np.testing.assert_allclose(np.asarray(c_skip + (-c_out) * sigmas * c_in), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c_noise), 0.25 * np.log(np.asarray(sigmas)), rtol=1e-6)
    s = karras_sigmas(10)
    assert s[0] == pytest.approx(700.0) and s[-1] == 0.0 and np.all(np.diff(s) < 0)


def test_svd_training_loss(svd_setup):
    module, params, batch = svd_setup
    loss, metrics = jax.jit(module.loss)(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert "train/main_loss" in metrics


def test_svd_eval_pipeline_contract(svd_setup):
    module, params, batch = svd_setup
    frames = module.eval_pipeline(
        params, batch, jax.random.key(2),
        num_frames=4, height=64, width=64, num_inference_steps=2, decode_chunk_size=2,
    )
    assert frames.shape == (1, 4, 3, 64, 64)
    arr = np.asarray(frames)
    assert np.isfinite(arr).all()


def test_svd_quantized_eval_pipeline(svd_setup):
    """quantize='int8' UNet serving: finite, close trajectory; timestep
    embedding MLPs stay unquantized."""
    module, params, batch = svd_setup
    qmodule = tiny_module(quantize="int8")
    kw = dict(num_frames=4, height=64, width=64, num_inference_steps=2,
              decode_chunk_size=2)
    exact = module.eval_pipeline(params, batch, jax.random.key(2), **kw)
    approx = qmodule.eval_pipeline(params, batch, jax.random.key(2), **kw)
    assert approx.shape == exact.shape
    assert np.isfinite(np.asarray(approx)).all()
    keys = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_leaves_with_path(qmodule._quant_cache.tree)}
    assert any(k.endswith("['kernel_scale']") for k in keys)
    assert not any(
        ("linear_1" in k or "linear_2" in k or "time_emb_proj" in k)
        and v.dtype == jnp.int8 for k, v in keys.items()
    )
    a, e = np.asarray(approx, np.float64).ravel(), np.asarray(exact, np.float64).ravel()
    corr = np.corrcoef(a, e)[0, 1]
    assert corr > 0.95, corr


def test_svd_action_module_loss():
    module = tiny_module(
        SVDActionModule,
        unet=tiny_unet(
            adapter_sites=("mid_block.attentions.0.transformer_blocks.0.attn2.processor",)
        ),
        action_embedder=VideoMAEEmbedder(
            num_frames=4, image_size=32, dim=32, depth=1, heads=2, dtype=jnp.float32
        ),
        action_proj_model=Resampler(
            dim=32, depth=1, dim_head=8, heads=4, num_queries=4,
            embedding_dim=32, output_dim=48,
        ),
        adapter_modules=("mid_block.attentions.0.transformer_blocks.0.attn2.processor",),
    )
    batch = make_batch()
    params = module.init_params(jax.random.key(0), batch)
    loss, _ = module.loss(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    # action conditioning reaches the loss: different ref videos -> different loss
    batch2 = dict(batch, ref_videos=batch["ref_videos"] * -1.0)
    loss2, _ = module.loss(params, batch2, jax.random.key(1))
    assert float(loss) != float(loss2)


def test_cfg_modes_equivalent():
    """Sequential CFG must produce the same frames as batched CFG."""
    module = tiny_module()
    batch = make_batch()
    params = module.init_params(jax.random.key(0), batch)
    outs = {}
    for mode in ("batched", "sequential"):
        module.pipe.cfg_mode = mode
        outs[mode] = np.asarray(module.eval_pipeline(
            params, batch, jax.random.key(5),
            num_frames=4, height=64, width=64, num_inference_steps=2,
            decode_chunk_size=4,
        ))
    np.testing.assert_allclose(outs["batched"], outs["sequential"], atol=2e-4, rtol=1e-3)


def test_svd_euler_adaptive_cache():
    """cache_threshold on the EDM Euler loop: 0.0 bit-identical, positive
    threshold finite with bounded drift (models/sampler_cache.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from motionrag_tpu.models.svd.sampler import euler_sample_loop, karras_sigmas

    sigmas = karras_sigmas(8)
    x0 = jax.random.normal(jax.random.key(0), (1, 3, 4, 4, 4), jnp.float32) * float(
        jnp.sqrt(sigmas[0] ** 2 + 1)
    )
    g = jnp.linspace(1.0, 3.0, 3)

    def fn(x, c_noise, sigma):
        c = jnp.cos(x * 0.1 + c_noise)
        return 0.9 * c, c

    exact = euler_sample_loop(fn, x0, sigmas, g)
    zero = euler_sample_loop(fn, x0, sigmas, g, cache_threshold=0.0)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(zero))
    cached = euler_sample_loop(fn, x0, sigmas, g, cache_threshold=0.05)
    assert np.isfinite(np.asarray(cached)).all()
