"""DynamiCrafter stack tests at tiny sizes: UNet3D forward with context
dict + branches, schedule identities + dynamic rescale, training loss,
end-to-end pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionrag_tpu.models.dynamicrafter.ddim import LVDMSchedule
from motionrag_tpu.models.dynamicrafter.module import (
    DynamiCrafterActionModule,
    DynamiCrafterModule,
)
from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D
from motionrag_tpu.models.dynamicrafter.vae import AutoencoderKL2D
from motionrag_tpu.models.encoders.clip_text import CLIPTextEncoder
from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder, VideoMAEEmbedder
from motionrag_tpu.models.resampler import Resampler


def tiny_unet(**kw):
    kw.setdefault("model_channels", 32)
    kw.setdefault("channel_mult", (1, 2))
    kw.setdefault("num_res_blocks", 1)
    kw.setdefault("attention_resolutions", (1, 2))
    kw.setdefault("num_head_channels", 16)
    kw.setdefault("context_dim", 32)
    kw.setdefault("dtype", jnp.float32)
    return UNet3D(**kw)


def test_unet3d_forward_and_branches():
    unet = tiny_unet(action_cross_attention=True)
    b, t, h, w = 1, 4, 16, 16
    x = jnp.ones((b, t, h, w, 8)) * 0.1
    ctx = {
        "prompt": jnp.ones((b, 7, 32)) * 0.2,
        "image": jnp.ones((b, t * 3, 32)) * 0.3,
        "action": jnp.ones((b, 5, 32)) * 0.4,
    }
    params = unet.init(jax.random.key(0), x, jnp.zeros((b,)), ctx)
    # several convs are zero-init for lvdm parity (conv_out, every resblock
    # out conv, temporal conv4, temporal-transformer proj_out) -> randomize
    # them so conditioning effects are observable at "init"
    params = jax.tree_util.tree_map(lambda v: v, params)

    def _randomize_zeros(tree, key=[0]):
        for name, sub in tree.items():
            if isinstance(sub, dict):
                _randomize_zeros(sub, key)
            elif name == "kernel" and not np.any(np.asarray(sub)):
                key[0] += 1
                tree[name] = jax.random.normal(jax.random.key(key[0]), sub.shape) * 0.1

    _randomize_zeros(params["params"])
    out = unet.apply(params, x, jnp.asarray([500.0]), ctx)
    assert out.shape == (b, t, h, w, 4)

    # action branch changes output
    ctx2 = dict(ctx, action=-ctx["action"])
    out2 = unet.apply(params, x, jnp.asarray([500.0]), ctx2)
    assert not np.allclose(np.asarray(out), np.asarray(out2), atol=1e-7)

    # image branch changes output
    ctx3 = dict(ctx, image=ctx["image"] * 3)
    out3 = unet.apply(params, x, jnp.asarray([500.0]), ctx3)
    assert not np.allclose(np.asarray(out), np.asarray(out3), atol=1e-7)

    # fs conditioning changes output
    out4 = unet.apply(params, x, jnp.asarray([500.0]), ctx, fs=jnp.asarray([3.0]))
    assert not np.allclose(np.asarray(out), np.asarray(out4), atol=1e-7)


def test_lvdm_schedule_identities():
    sch = LVDMSchedule(rescale_betas_zero_snr=True, use_dynamic_rescale=True, base_scale=0.3)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 3, 4, 4, 2)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal(x0.shape), jnp.float32)
    t = jnp.asarray([50, 800])
    # v-param roundtrip WITHOUT rescale: q_sample applies scale to x0
    x_noisy = sch.q_sample(x0, noise, t)
    a = sch.alphas_cumprod[t].reshape(2, 1, 1, 1, 1)
    s = sch.scale_arr[t].reshape(2, 1, 1, 1, 1)
    v = sch.get_v(x0 * s, noise, t)
    x0_rec = sch.predict_x0_from_v(x_noisy, v, a)
    eps_rec = sch.predict_eps_from_v(x_noisy, v, a)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0 * s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-5)
    # zero terminal SNR
    acp = np.asarray(sch.alphas_cumprod)
    assert acp[-1] < 1e-6
    # dynamic rescale ramps 1 -> 0.3 then constant
    arr = np.asarray(sch.scale_arr)
    assert arr[0] == 1.0 and arr[399] == pytest.approx(0.3) and arr[-1] == pytest.approx(0.3)
    # trailing spacing covers the terminal step
    ts = sch.ddim_timesteps(10)
    assert ts[-1] == 999


def tiny_module(cls=DynamiCrafterModule, **kw):
    return cls(
        unet=kw.pop("unet", tiny_unet(action_cross_attention=cls is not DynamiCrafterModule)),
        vae=AutoencoderKL2D(block_out_channels=(32, 32, 32, 32), dtype=jnp.float32),
        text_encoder=CLIPTextEncoder(vocab_size=100, max_length=16, dim=32, depth=2,
                                     heads=2, dtype=jnp.float32),
        image_encoder=CLIPImageEmbedder(image_size=28, patch_size=14, dim=32, depth=1,
                                        heads=2, pooled=False, dtype=jnp.float32),
        image_proj=Resampler(dim=32, depth=1, dim_head=8, heads=4, num_queries=3,
                             embedding_dim=32, output_dim=32, video_length=4),
        dtype=jnp.float32,
        **kw,
    )


def make_batch(b=1, f=4, h=32, w=32, k=2):
    rng = np.random.default_rng(0)
    return {
        "video": jnp.asarray(rng.uniform(-1, 1, (b, f, 3, h, w)), jnp.float32),
        "ref_videos": jnp.asarray(rng.uniform(-1, 1, (b, k, f, 3, h, w)), jnp.float32),
        "prompt_ids": jnp.asarray(rng.integers(0, 100, (b, 16)), jnp.int32),
    }


@pytest.fixture(scope="module")
def dc_setup():
    module = tiny_module()
    batch = make_batch()
    params = module.init_params(jax.random.key(0), batch)
    return module, params, batch


def test_dynamicrafter_training_loss(dc_setup):
    module, params, batch = dc_setup
    loss, _ = jax.jit(module.loss)(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))


def test_dynamicrafter_pipeline(dc_setup):
    module, params, batch = dc_setup
    frames = module.eval_pipeline(
        params, batch, jax.random.key(2),
        num_frames=4, height=32, width=32, ddim_steps=2,
    )
    assert frames.shape == (1, 4, 3, 32, 32)
    assert np.isfinite(np.asarray(frames)).all()


def test_dynamicrafter_cfg_modes_equivalent(dc_setup):
    """Sequential CFG (a length-2 lax.map over the stacked cond/uncond
    contexts — one UNet body in the compiled program) must produce the same
    frames as the reference-style batched-2x CFG."""
    module, params, batch = dc_setup
    kw = dict(num_frames=4, height=32, width=32, ddim_steps=2)
    outs = {}
    for mode in ("batched", "sequential"):
        module.cfg_mode = mode
        module.pipe = module.build_pipeline()
        outs[mode] = np.asarray(
            module.eval_pipeline(params, batch, jax.random.key(5), **kw))
    module.cfg_mode = "sequential"
    module.pipe = module.build_pipeline()
    np.testing.assert_allclose(outs["batched"], outs["sequential"],
                               atol=2e-4, rtol=1e-3)


def test_dynamicrafter_quantized_eval_pipeline(dc_setup):
    """quantize='int8' UNet serving: same trajectory shape, close output,
    modulation MLPs left unquantized."""
    module, params, batch = dc_setup
    qmodule = tiny_module(quantize="int8")
    kw = dict(num_frames=4, height=32, width=32, ddim_steps=2)
    exact = module.eval_pipeline(params, batch, jax.random.key(2), **kw)
    approx = qmodule.eval_pipeline(params, batch, jax.random.key(2), **kw)
    assert approx.shape == exact.shape
    assert np.isfinite(np.asarray(approx)).all()
    qtree = qmodule._quant_cache.tree["params"]
    # attention kernels quantized, timestep modulation not
    flat = jax.tree_util.tree_leaves_with_path(qtree)
    keys = {jax.tree_util.keystr(p): v for p, v in flat}
    assert any(k.endswith("['kernel_scale']") for k in keys)
    assert not any("emb_proj" in k and v.dtype == jnp.int8 for k, v in keys.items())
    assert not any("time_embed" in k and v.dtype == jnp.int8 for k, v in keys.items())
    a, e = np.asarray(approx, np.float64).ravel(), np.asarray(exact, np.float64).ravel()
    corr = np.corrcoef(a, e)[0, 1]
    assert corr > 0.95, corr


def test_dynamicrafter_action_module():
    module = tiny_module(
        DynamiCrafterActionModule,
        action_embedder=VideoMAEEmbedder(num_frames=4, image_size=32, dim=32, depth=1,
                                         heads=2, dtype=jnp.float32),
        action_proj=Resampler(dim=32, depth=1, dim_head=8, heads=4, num_queries=4,
                              embedding_dim=32, output_dim=32),
        action_uncond_prob=0.0,
    )
    batch = make_batch()
    params = module.init_params(jax.random.key(0), batch)
    # conv_out is zero-init -> prediction is 0 and conditioning cannot show;
    # randomize it so the action path reaches the loss
    kernel = params["unet"]["params"]["conv_out"]["kernel"]
    params["unet"]["params"]["conv_out"]["kernel"] = (
        jax.random.normal(jax.random.key(9), kernel.shape) * 0.1
    )
    loss, _ = module.loss(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    batch2 = dict(batch, ref_videos=batch["ref_videos"] * -1)
    loss2, _ = module.loss(params, batch2, jax.random.key(1))
    assert float(loss) != float(loss2)


def test_ddim_dual_cfg_runs():
    from motionrag_tpu.models.dynamicrafter.ddim import LVDMSchedule, ddim_sample_dual_cfg

    sch = LVDMSchedule(rescale_betas_zero_snr=True, use_dynamic_rescale=True)
    x0 = jnp.ones((1, 2, 4, 4, 2))

    def fn3(x, t):
        return x * 0.1, x * 0.05, x * 0.0

    out = ddim_sample_dual_cfg(sch, fn3, x0, num_steps=3,
                               text_guidance_scale=7.5, image_guidance_scale=1.2)
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()


def test_dc_adaptive_cache_sampling():
    """cache_threshold on both lvdm DDIM samplers: 0.0 bit-identical,
    positive threshold finite with bounded drift (models/sampler_cache.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from motionrag_tpu.models.dynamicrafter.ddim import (
        LVDMSchedule, ddim_sample, ddim_sample_dual_cfg)

    sched = LVDMSchedule()
    x0 = jax.random.normal(jax.random.key(0), (1, 3, 4, 4, 4), jnp.float32)

    def fn2(x, t):
        c = jnp.cos(x + t.astype(jnp.float32) * 0.001)
        return c, 0.9 * c

    exact = ddim_sample(sched, fn2, x0, 8)
    zero = ddim_sample(sched, fn2, x0, 8, cache_threshold=0.0)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(zero))
    cached = ddim_sample(sched, fn2, x0, 8, cache_threshold=0.05)
    assert np.isfinite(np.asarray(cached)).all()
    rel = float(jnp.linalg.norm(cached - exact) / jnp.linalg.norm(exact))
    assert rel < 0.5, rel

    def fn3(x, t):
        c = jnp.cos(x + t.astype(jnp.float32) * 0.001)
        return c, 0.95 * c, 0.9 * c

    exact3 = ddim_sample_dual_cfg(sched, fn3, x0, 8)
    zero3 = ddim_sample_dual_cfg(sched, fn3, x0, 8, cache_threshold=0.0)
    np.testing.assert_array_equal(np.asarray(exact3), np.asarray(zero3))
    cached3 = ddim_sample_dual_cfg(sched, fn3, x0, 8, cache_threshold=0.05)
    assert np.isfinite(np.asarray(cached3)).all()


def test_pipeline_accepts_reference_kwarg_spellings(dc_setup):
    """A verbatim reference DC config passes num_inference_steps /
    frame_stride; the pipeline must map them onto ddim_steps / fs instead of
    silently swallowing them into **unused (reference
    MotionRAG_open.yml:165-171 spellings)."""
    module, params, batch = dc_setup
    ours = module.eval_pipeline(
        params, batch, jax.random.key(2),
        num_frames=4, height=32, width=32, ddim_steps=2, fs=9.0,
    )
    aliased = module.eval_pipeline(
        params, batch, jax.random.key(2),
        num_frames=4, height=32, width=32, num_inference_steps=2,
        frame_stride=9.0,
    )
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(aliased))
    # a DIFFERENT aliased step count must change the trajectory — proves the
    # alias is consumed, not silently swallowed (the tiny fixture UNet has
    # fs_condition off, so step count is the observable knob)
    other = module.eval_pipeline(
        params, batch, jax.random.key(2),
        num_frames=4, height=32, width=32, num_inference_steps=3,
        frame_stride=9.0,
    )
    assert np.abs(np.asarray(other) - np.asarray(ours)).max() > 0
