"""CogVideoX stack tests at tiny sizes: DiT forward + adapter, schedule
identities, causal VAE causality + shapes, end-to-end pipeline, training
loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D
from motionrag_tpu.models.cogvideox.module import CogVideoX5B, CogVideoX5BAction
from motionrag_tpu.models.cogvideox.scheduler import CogVideoXSchedule
from motionrag_tpu.models.cogvideox.vae3d import CogVideoXVAE
from motionrag_tpu.models.encoders.t5 import T5Encoder
from motionrag_tpu.models.encoders.condition import VideoMAEEmbedder
from motionrag_tpu.models.resampler import Resampler


def tiny_dit(**kw):
    return CogVideoXTransformer3D(
        in_channels=8, out_channels=4, dim=64, depth=2, heads=4, head_dim=16,
        text_embed_dim=32, time_embed_dim=32, dtype=jnp.float32, **kw,
    )


def tiny_vae():
    return CogVideoXVAE(
        latent_channels=4, block_out_channels=(32, 32, 32, 32),
        layers_per_block=1, dtype=jnp.float32,
    )


def tiny_t5():
    return T5Encoder(vocab_size=100, dim=32, depth=2, heads=2, head_dim=16,
                     ff_dim=64, dtype=jnp.float32)


def test_dit_forward_shape():
    dit = tiny_dit()
    b, f, h, w = 1, 3, 8, 8
    x = jnp.zeros((b, f, h, w, 8))
    text = jnp.zeros((b, 5, 32))
    params = dit.init(jax.random.key(0), x, text, jnp.zeros((b,), jnp.int32))
    out = dit.apply(params, x, text, jnp.asarray([500]))
    assert out.shape == (b, f, h, w, 4)


def test_dit_adapter_changes_output():
    dit = tiny_dit(adapter_sites=("transformer_blocks.1.attn1.processor",))
    b, f, h, w = 1, 2, 4, 4
    x = jnp.ones((b, f, h, w, 8)) * 0.1
    text = jnp.ones((b, 3, 32)) * 0.2
    action = jnp.ones((b, 4, 64)) * 0.5
    params = dit.init(jax.random.key(1), x, text, jnp.zeros((b,), jnp.int32), action_emb=action)
    o1 = dit.apply(params, x, text, jnp.asarray([10]), action_emb=action)
    o2 = dit.apply(params, x, text, jnp.asarray([10]), action_emb=-action)
    assert not np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_schedule_vpred_identities():
    sch = CogVideoXSchedule()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 3, 4, 4, 4)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal(x0.shape), jnp.float32)
    t = jnp.asarray([100, 700])
    noisy = sch.add_noise(x0, noise, t)
    v = sch.get_velocity(noise, x0, t)
    a = sch.alphas_cumprod[t].reshape(2, 1, 1, 1, 1)
    x0_rec, eps_rec = sch.to_x0_eps(v, noisy, a)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-5)
    # zero-terminal-SNR: last alpha ~ 0, first ~ 1
    acp = np.asarray(sch.alphas_cumprod)
    assert acp[-1] < 1e-6 and acp[0] > 0.99
    # trailing spacing hits the last timestep
    ts = sch.timesteps(50)
    assert ts[0] == 999 and len(ts) == 50


def test_vae3d_shapes_and_temporal_compression():
    vae = tiny_vae()
    video = jnp.zeros((1, 9, 32, 32, 3))  # 1 + 4*2 frames
    params = vae.init(jax.random.key(0), video)
    lat = vae.apply(params, video, method="encode")
    assert lat.shape == (1, 3, 4, 4, 4)  # (9-1)/4+1=3 frames, 32/8 spatial
    dec = vae.apply(params, lat, method="decode")
    assert dec.shape == (1, 9, 32, 32, 3)


def test_causal_conv3d_is_temporally_causal():
    """The conv path never looks forward in time (GroupNorm statistics span
    the chunk, as in the reference torch implementation, so causality holds
    at the conv level / across chunk boundaries)."""
    from motionrag_tpu.models.cogvideox.vae3d import CausalConv3d

    conv = CausalConv3d(4, (3, 3, 3), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 6, 8, 8, 3)), jnp.float32)
    params = conv.init(jax.random.key(0), x)
    y1 = conv.apply(params, x)
    x2 = x.at[:, 4:].add(1.0)  # perturb only frames 4..5
    y2 = conv.apply(params, x2)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]), atol=1e-6)
    assert not np.allclose(np.asarray(y1[:, 4:]), np.asarray(y2[:, 4:]), atol=1e-4)


def test_causal_conv3d_streaming_cache_matches_monolithic():
    """Chunked conv with the conv-cache (diffusers conv_cache threading)
    reproduces the monolithic causal conv bit-for-bit."""
    from motionrag_tpu.models.cogvideox.vae3d import CausalConv3d

    conv = CausalConv3d(4, (3, 3, 3), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 7, 8, 8, 3)), jnp.float32)
    params = conv.init(jax.random.key(0), x)
    full = conv.apply(params, x)

    outs, cache = [], {}
    for chunk in (x[:, :3], x[:, 3:5], x[:, 5:7]):
        variables = dict(params)
        if cache:
            variables["cache"] = cache
        y, state = conv.apply(variables, chunk, True, mutable=("cache",))
        cache = state["cache"]
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), np.asarray(full),
                               atol=1e-6)


def test_vae3d_chunked_decode():
    """Frame-batched decode (the reference's default diffusers decode path):
    13 latent frames -> 49 output frames in 2-frame chunks, and chunked
    output is causal — a later-chunk perturbation never changes earlier
    frames."""
    from motionrag_tpu.models.cogvideox.vae3d import decode_chunked

    vae = tiny_vae()
    z = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 13, 4, 4, 4)), jnp.float32
    )
    params = vae.init(jax.random.key(0), jnp.zeros((1, 9, 32, 32, 3)))
    out = decode_chunked(vae, params, z, frame_batch_size=2)
    assert out.shape == (1, 49, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()

    z2 = z.at[:, 11:].add(1.0)  # last chunk only
    out2 = decode_chunked(vae, params, z2, frame_batch_size=2)
    # frames from latents [0:11] -> output frames [0:41] unchanged
    np.testing.assert_allclose(
        np.asarray(out[:, :41]), np.asarray(out2[:, :41]), atol=1e-5
    )
    assert not np.allclose(np.asarray(out[:, 41:]), np.asarray(out2[:, 41:]), atol=1e-4)


def test_vae3d_decode_schedule_serving_only():
    """Explicit chunk schedules are a SERVING-ONLY knob: shape-correct and
    causal, but NOT numerically protocol-equivalent — the decoder GroupNorm
    statistics span the chunk's time axis (exactly diffusers' GroupNorm over
    (T, H, W)), so the reference protocol is pinned to the default fbs=2
    layout and any other layout measurably differs. This test documents
    both facts so the protocol pin can't silently drift."""
    from motionrag_tpu.models.cogvideox.vae3d import decode_chunked

    vae = tiny_vae()
    z = jnp.asarray(
        np.random.default_rng(5).normal(size=(1, 5, 4, 4, 4)), jnp.float32
    )
    params = vae.init(jax.random.key(0), jnp.zeros((1, 9, 32, 32, 3)))
    ref = decode_chunked(vae, params, z, frame_batch_size=2)  # protocol (3, 2)
    for schedule in ((1, 2, 2), (1, 4), (5,)):
        out = decode_chunked(vae, params, z, schedule=schedule)
        assert out.shape == ref.shape
        assert np.isfinite(np.asarray(out)).all()
        # layout changes the GroupNorm time-window -> different frames
        assert not np.allclose(np.asarray(ref), np.asarray(out), atol=1e-3), schedule

    # causality holds for any schedule: perturbing the last chunk's latents
    # leaves every earlier frame untouched
    z2 = z.at[:, 3:].add(1.0)
    a = decode_chunked(vae, params, z, schedule=(1, 2, 2))
    b = decode_chunked(vae, params, z2, schedule=(1, 2, 2))
    np.testing.assert_allclose(np.asarray(a[:, :9]), np.asarray(b[:, :9]),
                               atol=1e-5)


@pytest.fixture(scope="module")
def cog_setup():
    module = CogVideoX5B(
        transformer=tiny_dit(),
        vae=tiny_vae(),
        text_encoder=tiny_t5(),
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.uniform(-1, 1, (1, 9, 3, 32, 32)), jnp.float32),
        "prompt_ids": jnp.asarray(rng.integers(0, 100, (1, 6)), jnp.int32),
    }
    params = module.init_params(jax.random.key(0), batch)
    return module, params, batch


def test_cogvideox_training_loss(cog_setup):
    module, params, batch = cog_setup
    loss, metrics = jax.jit(module.loss)(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("scheduler", ["ddim", "dpm"])
def test_cogvideox_pipeline_smoke(cog_setup, scheduler):
    module, params, batch = cog_setup
    module.pipe.scheduler_name = scheduler
    frames = module.eval_pipeline(
        params, batch, jax.random.key(2),
        num_frames=9, height=32, width=32, num_inference_steps=2,
        sample_method=None,
    )
    assert frames.shape == (1, 9, 3, 32, 32)
    assert np.isfinite(np.asarray(frames)).all()


@pytest.mark.parametrize("scheduler", ["ddim", "dpm"])
def test_cogvideox_cfg_modes_equivalent(cog_setup, scheduler):
    """Sequential CFG (a length-2 lax.map over the stacked uncond/cond
    conditioning — one DiT body in the compiled program) must produce the
    same frames as the reference-style batched-2x CFG."""
    module, params, batch = cog_setup
    kw = dict(num_frames=9, height=32, width=32, num_inference_steps=2,
              sample_method=None)
    module.pipe.scheduler_name = scheduler
    outs = {}
    for mode in ("batched", "sequential"):
        module.pipe.cfg_mode = mode
        outs[mode] = np.asarray(
            module.eval_pipeline(params, batch, jax.random.key(5), **kw))
    module.pipe.cfg_mode = "sequential"
    np.testing.assert_allclose(outs["batched"], outs["sequential"],
                               atol=2e-4, rtol=1e-3)


def test_cogvideox_quantized_eval_pipeline(cog_setup):
    """quantize='int8' end-to-end: the module quantizes the frozen DiT once
    (cached by leaf identity) and the sampler runs the W8A8 path, staying
    close to the exact bf16/f32 trajectory at 2 steps."""
    module, params, batch = cog_setup
    from motionrag_tpu.models.cogvideox.module import CogVideoX5B

    qmodule = CogVideoX5B(
        transformer=module.transformer, vae=module.vae,
        text_encoder=module.text_encoder, dtype=jnp.float32, quantize="int8",
    )
    kw = dict(num_frames=9, height=32, width=32, num_inference_steps=2,
              sample_method=None)
    module.pipe.scheduler_name = "ddim"
    exact = module.eval_pipeline(params, batch, jax.random.key(2), **kw)
    approx = qmodule.eval_pipeline(params, batch, jax.random.key(2), **kw)
    assert approx.shape == exact.shape
    assert np.isfinite(np.asarray(approx)).all()
    # quantized DiT params were cached
    assert qmodule._quant_cache is not None and qmodule._quant_cache.tree is not None
    qleaf = qmodule._quant_cache.tree["params"]["transformer_blocks_0"]["to_q"]["kernel"]
    assert qleaf.dtype == jnp.int8
    # same rng, 2 steps of a tiny random model: trajectories stay correlated
    a, e = np.asarray(approx, np.float64).ravel(), np.asarray(exact, np.float64).ravel()
    corr = np.corrcoef(a, e)[0, 1]
    assert corr > 0.95, corr
    # second call reuses the cache (no retransform)
    cache_before = qmodule._quant_cache.tree
    qmodule.eval_pipeline(params, batch, jax.random.key(3), **kw)
    assert qmodule._quant_cache.tree is cache_before


def test_cogvideox_text_cache_path():
    """text_encoder=False + batch['prompt_embeds'] (the reference's
    src/data/text_cache.py idiom): T5 is never initialized and never
    resident; the loss consumes the precomputed embeddings. Mandatory for
    single-16GB-chip stage-1 training where T5-XXL cannot co-reside with
    the 5.57B DiT."""
    module = CogVideoX5B(
        transformer=tiny_dit(), vae=tiny_vae(), text_encoder=False,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.uniform(-1, 1, (1, 9, 3, 32, 32)), jnp.float32),
        "prompt_embeds": jnp.asarray(rng.normal(size=(1, 6, 32)), jnp.float32),
    }
    params = module.init_params(jax.random.key(0), batch)
    assert "text_encoder" not in params
    loss, _ = jax.jit(module.loss)(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    # embeddings actually flow into the model
    batch2 = dict(batch, prompt_embeds=batch["prompt_embeds"] * -1)
    loss2, _ = jax.jit(module.loss)(params, batch2, jax.random.key(1))
    assert float(loss) != float(loss2)
    with pytest.raises(ValueError, match="prompt_embeds"):
        module.loss(params, {"video": batch["video"]}, jax.random.key(1))
    # a module WITH a text encoder also prefers cached embeds when present
    module_t5 = CogVideoX5B(
        transformer=tiny_dit(), vae=tiny_vae(), text_encoder=tiny_t5(),
        dtype=jnp.float32,
    )
    params_t5 = module_t5.init_params(
        jax.random.key(0),
        {"video": batch["video"],
         "prompt_ids": jnp.zeros((1, 6), jnp.int32)})
    loss_cached, _ = module_t5.loss(params_t5, batch, jax.random.key(1))
    assert np.isfinite(float(loss_cached))


def test_cogvideox_action_module_loss():
    module = CogVideoX5BAction(
        transformer=tiny_dit(adapter_sites=("transformer_blocks.0.attn1.processor",)),
        vae=tiny_vae(),
        text_encoder=tiny_t5(),
        adapter_modules=("transformer_blocks.0.attn1.processor",),
        action_embedder=VideoMAEEmbedder(
            num_frames=4, image_size=32, dim=32, depth=1, heads=2, dtype=jnp.float32
        ),
        action_proj_model=Resampler(
            dim=32, depth=1, dim_head=8, heads=4, num_queries=4,
            embedding_dim=32, output_dim=64,
        ),
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.uniform(-1, 1, (1, 9, 3, 32, 32)), jnp.float32),
        "ref_videos": jnp.asarray(rng.uniform(-1, 1, (1, 2, 4, 3, 32, 32)), jnp.float32),
        "prompt_ids": jnp.asarray(rng.integers(0, 100, (1, 6)), jnp.int32),
    }
    params = module.init_params(jax.random.key(0), batch)
    loss, _ = module.loss(params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    batch2 = dict(batch, ref_videos=batch["ref_videos"] * -1)
    loss2, _ = module.loss(params, batch2, jax.random.key(1))
    assert float(loss) != float(loss2)


def test_segmented_sampling_matches_single_launch():
    """step_range segmentation must be bit-identical math for both
    schedulers (the tunneled runtime kills >60s device programs, so long
    samplers run as several launches)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from motionrag_tpu.models.cogvideox.scheduler import (
        CogVideoXSchedule, ddim_sample_loop, dpm_sample_loop)

    sched = CogVideoXSchedule()
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (1, 2, 4, 4, 4), jnp.float32)

    def denoise_fn(x, t):
        c = jnp.cos(x + t.astype(jnp.float32) * 0.001)
        return 0.9 * c, c

    n = 9
    full = ddim_sample_loop(sched, denoise_fn, x0, n, guidance_scale=6.0)
    x = x0
    for lo in range(0, n, 4):
        x = ddim_sample_loop(sched, denoise_fn, x, n, guidance_scale=6.0,
                             step_range=(lo, min(lo + 4, n)))
    np.testing.assert_allclose(np.asarray(full), np.asarray(x), atol=1e-6)

    full = dpm_sample_loop(sched, denoise_fn, x0, n, guidance_scale=6.0)
    x, carry = x0, None
    for lo in range(0, n, 4):
        x, carry = dpm_sample_loop(
            sched, denoise_fn, x, n, guidance_scale=6.0,
            step_range=(lo, min(lo + 4, n)), init_carry=carry, return_carry=True)
    np.testing.assert_allclose(np.asarray(full), np.asarray(x), atol=1e-6)


def test_adaptive_cache_sampling():
    """Opt-in TeaCache-style output caching (scheduler.ddim_sample_loop
    cache_threshold): 0.0 is bit-identical to the exact loop; a positive
    threshold skips model calls (the denoise_fn call count drops) yet stays
    finite and close at small thresholds; the cache carry makes segmented
    launches bit-identical to the single launch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from motionrag_tpu.models.cogvideox.scheduler import (
        CogVideoXSchedule, ddim_sample_loop)

    sched = CogVideoXSchedule()
    x0 = jax.random.normal(jax.random.key(0), (1, 2, 4, 4, 4), jnp.float32)

    calls = []

    def make_fn():
        def denoise_fn(x, t):
            calls.append(1)  # traced once per lax.cond branch, not per step
            c = jnp.cos(x + t.astype(jnp.float32) * 0.001)
            return 0.9 * c, c
        return denoise_fn

    n = 9
    exact = ddim_sample_loop(sched, make_fn(), x0, n, guidance_scale=6.0)
    zero_thr = ddim_sample_loop(sched, make_fn(), x0, n, guidance_scale=6.0,
                                cache_threshold=0.0)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(zero_thr))

    cached = ddim_sample_loop(sched, make_fn(), x0, n, guidance_scale=6.0,
                              cache_threshold=0.05)
    assert np.isfinite(np.asarray(cached)).all()
    # small threshold -> bounded deviation from the exact trajectory
    rel = float(jnp.linalg.norm(cached - exact) / jnp.linalg.norm(exact))
    assert rel < 0.5, rel

    # a huge threshold degenerates to "compute first/last step only" and
    # must still produce a finite, different trajectory
    frozen = ddim_sample_loop(sched, make_fn(), x0, n, guidance_scale=6.0,
                              cache_threshold=1e9)
    assert np.isfinite(np.asarray(frozen)).all()
    assert not np.array_equal(np.asarray(frozen), np.asarray(exact))

    # segmented with cache carry == single launch, bit-identical
    x, carry = x0, None
    for lo in range(0, n, 4):
        x, carry = ddim_sample_loop(
            sched, make_fn(), x, n, guidance_scale=6.0,
            step_range=(lo, min(lo + 4, n)), cache_threshold=0.05,
            cache_carry=carry, return_cache=True)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(x), atol=1e-6)
