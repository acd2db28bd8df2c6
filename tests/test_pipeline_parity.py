"""WHOLE-pipeline generation parity vs the reference's own inference code.

Component/activation parity (test_activation_parity.py) pins each module;
these tests chain everything — conditioning assembly, CFG dicts, latent
scaling, sampler, VAE decode — through one generation at tiny shapes with
shared random weights:

  * DynamiCrafter: the vendored torch ``image_guided_synthesis``
    (reference ``DynamiCrafter/scripts/evaluation/inference.py:174-305``)
    driving a real (reduced-width) ``LatentVisualDiffusion`` instance, vs
    our ``DynamiCrafterPipeline.__call__``.
  * SVD / CogVideoX: torch mirror chains (the same golden mirrors the
    activation-parity suite uses) run cond->sample->decode end to end vs
    our pipelines.

Randomness is pinned on both sides: shared x_T, VAE posterior mode
(sample() monkeypatched to mode() on the torch side), eta=0.
"""

import sys
import types

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo/tests")
from test_activation_parity import _import_lvdm, _randomize, _sd_numpy  # noqa: E402

CTX = 32          # UNet context dim
IMG_DIM = 48      # image-embedder token dim
TXT_LEN = 16      # byte-token prompt length
T, H, W = 4, 32, 32


def _byte_ids(text: str, length: int = TXT_LEN) -> list[int]:
    ids = list(text.encode("utf-8"))[:length]
    return ids + [0] * (length - len(ids))


def _register_stub_module():
    """Tiny text/image encoders importable by lvdm's instantiate_from_config
    (registered in sys.modules under 'dc_parity_stubs')."""
    if "dc_parity_stubs" in sys.modules:
        return sys.modules["dc_parity_stubs"]
    mod = types.ModuleType("dc_parity_stubs")

    class TinyTextEmbedder(torch.nn.Module):
        def __init__(self, vocab=256, length=TXT_LEN, dim=CTX):
            super().__init__()
            self.length = length
            self.emb = torch.nn.Embedding(vocab, dim)

        def forward(self, texts):
            ids = torch.tensor([_byte_ids(t, self.length) for t in texts])
            return self.emb(ids)

    class TinyImageEmbedder(torch.nn.Module):
        def __init__(self, dim=IMG_DIM, patch=8):
            super().__init__()
            self.proj = torch.nn.Conv2d(3, dim, patch, patch)

        def forward(self, img):
            h = self.proj(img)            # [b, d, h/p, w/p]
            return h.flatten(2).transpose(1, 2)  # [b, l, d]

    mod.TinyTextEmbedder = TinyTextEmbedder
    mod.TinyImageEmbedder = TinyImageEmbedder
    import importlib.machinery

    mod.__spec__ = importlib.machinery.ModuleSpec("dc_parity_stubs", None)
    sys.modules["dc_parity_stubs"] = mod
    return mod


def _stub_heavy_deps():
    """omegaconf / torchvision / lightning extras the vendored inference
    script imports but never exercises on this path."""
    import importlib.machinery

    def ensure(name, **attrs):
        if name in sys.modules:
            mod = sys.modules[name]
        else:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
        for k, v in attrs.items():
            if not hasattr(mod, k):
                setattr(mod, k, v)
        return mod

    ensure("omegaconf", OmegaConf=type("OmegaConf", (), {}))
    tv = ensure("torchvision")
    tv.utils = ensure("torchvision.utils", make_grid=lambda *a, **k: None)
    tv.transforms = ensure("torchvision.transforms")
    lp = sys.modules["lightning.pytorch"]  # installed by _import_lvdm
    if not hasattr(lp, "seed_everything"):
        lp.seed_everything = lambda *a, **k: None
    util = ensure("lightning.pytorch.utilities",
                  rank_zero_only=lambda fn: fn)
    lp.utilities = util


def _flax_stub_classes():
    import flax.linen as nn
    import jax.numpy as jnp

    class JTinyText(nn.Module):
        vocab: int = 256
        dim: int = CTX

        @nn.compact
        def __call__(self, ids):
            emb = self.param("emb", nn.initializers.normal(1.0),
                             (self.vocab, self.dim))
            return jnp.take(emb, ids, axis=0)

    class JTinyImage(nn.Module):
        dim: int = IMG_DIM
        patch: int = 8

        @nn.compact
        def __call__(self, img):  # [b, 3, h, w]
            x = jnp.transpose(img, (0, 2, 3, 1))
            x = nn.Conv(self.dim, (self.patch, self.patch),
                        strides=(self.patch, self.patch), name="proj")(x)
            return x.reshape(x.shape[0], -1, self.dim)

    return JTinyText, JTinyImage


UNET_KW = dict(
    in_channels=8, out_channels=4, model_channels=32, num_res_blocks=1,
    context_dim=CTX, num_head_channels=16, transformer_depth=1,
)


@pytest.mark.slow
def test_dynamicrafter_whole_pipeline_parity():
    """Reference image_guided_synthesis (vendored torch, real reduced-width
    LatentVisualDiffusion) vs our DynamiCrafterPipeline: one full
    image-to-video generation must match."""
    _import_lvdm()
    _stub_heavy_deps()
    _register_stub_module()

    import jax
    import jax.numpy as jnp

    from DynamiCrafter.lvdm.models import ddpm3d
    from DynamiCrafter.lvdm.models.ddpm3d import LatentVisualDiffusion
    from DynamiCrafter.lvdm.models.samplers.ddim import DDIMSampler
    from DynamiCrafter.scripts.evaluation.inference import image_guided_synthesis

    from motionrag_tpu.models.dynamicrafter.module import DynamiCrafterModule
    from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D
    from motionrag_tpu.models.dynamicrafter.vae import AutoencoderKL2D
    from motionrag_tpu.models.resampler import Resampler
    from motionrag_tpu.utils.porting_diffusion import port_dynamicrafter_checkpoint

    # ---- torch reference model (reduced width, real vendored classes) -----
    unet_config = {
        "target": "DynamiCrafter.lvdm.modules.networks.openaimodel3d.UNetModel",
        "params": dict(
            UNET_KW, attention_resolutions=[1, 2], channel_mult=[1, 2],
            use_linear=True, temporal_conv=True, temporal_attention=True,
            use_relative_position=False, use_causal_attention=False,
            temporal_length=T, addition_attention=True,
            image_cross_attention=True, fs_condition=True, dropout=0.0,
        ),
    }
    first_stage_config = {
        "target": "DynamiCrafter.lvdm.models.autoencoder.AutoencoderKL",
        "params": dict(
            ddconfig=dict(double_z=True, z_channels=4, resolution=H,
                          in_channels=3, out_ch=3, ch=32, ch_mult=[1, 1, 2, 2],
                          num_res_blocks=2, attn_resolutions=[], dropout=0.0),
            lossconfig={"target": "torch.nn.Identity"}, embed_dim=4,
        ),
    }
    model = LatentVisualDiffusion(
        img_cond_stage_config={"target": "dc_parity_stubs.TinyImageEmbedder"},
        image_proj_stage_config={
            "target": "DynamiCrafter.lvdm.modules.encoders.resampler.Resampler",
            "params": dict(dim=16, depth=2, dim_head=8, heads=2, num_queries=3,
                           embedding_dim=IMG_DIM, output_dim=CTX, ff_mult=4,
                           video_length=T),
        },
        first_stage_config=first_stage_config,
        cond_stage_config={"target": "dc_parity_stubs.TinyTextEmbedder"},
        unet_config=unet_config,
        timesteps=1000, linear_start=0.00085, linear_end=0.012,
        rescale_betas_zero_snr=True, parameterization="v", use_ema=False,
        conditioning_key="hybrid", scale_factor=0.18215,
        use_dynamic_rescale=True, base_scale=0.3,
        fps_condition_type="fs", perframe_ae=True,
        uncond_type="empty_seq", uncond_prob=0.05,
        first_stage_key="video", cond_stage_key="caption",
    )
    model.configure_model()
    _randomize(model, seed=11)
    # full-suite ordering: test_activation_parity's CAMA section may have
    # upgraded the lightning stub to a class whose read-only `device`
    # property already answers cpu — only set it on the plain stub
    if not isinstance(getattr(type(model), "device", None), property):
        model.device = torch.device("cpu")
    # vendored register_buffer forces .to('cuda'); route to plain setattr
    DDIMSampler.register_buffer = lambda self, name, attr: setattr(self, name, attr)
    # pin the VAE posterior to its mode on both sides
    ddpm3d.DiagonalGaussianDistribution.sample = (
        lambda self, noise=None: self.mode())

    rng = np.random.default_rng(3)
    video = rng.uniform(-1, 1, (1, 3, T, H, W)).astype(np.float32)
    x_T = rng.standard_normal((1, 4, T, H // 8, W // 8)).astype(np.float32)
    prompts = ["a cat on a mat"]

    with torch.no_grad():
        out_t = image_guided_synthesis(
            model, prompts, torch.from_numpy(video),
            noise_shape=(1, 4, T, H // 8, W // 8), n_samples=1,
            ddim_steps=6, ddim_eta=0.0, unconditional_guidance_scale=2.0,
            fs=7, text_input=True, timestep_spacing="uniform",
            guidance_rescale=0.0, x_T=torch.from_numpy(x_T),
        )
    out_t = out_t[:, 0].numpy()  # [b, c, t, h, w]

    # ---- ours: ported weights, same inputs ---------------------------------
    JTinyText, JTinyImage = _flax_stub_classes()
    module = DynamiCrafterModule(
        unet=UNet3D(attention_resolutions=(1, 2), channel_mult=(1, 2),
                    temporal_conv=True, temporal_attention=True,
                    addition_attention=True, image_cross_attention=True,
                    fs_condition=True, dtype=jnp.float32, **UNET_KW),
        vae=AutoencoderKL2D(latent_channels=4,
                            block_out_channels=(32, 32, 64, 64),
                            dtype=jnp.float32),
        text_encoder=JTinyText(),
        image_encoder=JTinyImage(),
        image_proj=Resampler(dim=16, depth=2, dim_head=8, heads=2,
                             num_queries=3, embedding_dim=IMG_DIM,
                             output_dim=CTX, ff_mult=4, video_length=T),
        scale_factor=0.18215, rescale_betas_zero_snr=True,
        use_dynamic_rescale=True, base_scale=0.3, frame_stride=7,
        dtype=jnp.float32,
    )
    ported = port_dynamicrafter_checkpoint(
        _sd_numpy(model),
        unet_kwargs=dict(channel_mult=(1, 2), num_res_blocks=1,
                         attention_levels=(0, 1), temporal_attention=True),
        vae_kwargs=dict(n_levels=4, enc_blocks=2, dec_blocks=3),
        strict=True,
    )
    params = {
        "unet": ported["unet"],
        "vae": ported["vae"],
        "image_proj": ported["image_proj"],
        "text_encoder": {"params": {
            "emb": model.cond_stage_model.emb.weight.detach().numpy()}},
        "image_encoder": {"params": {"proj": {
            "kernel": model.embedder.proj.weight.detach().numpy()
            .transpose(2, 3, 1, 0),
            "bias": model.embedder.proj.bias.detach().numpy()}}},
    }

    batch = {
        "video": jnp.asarray(video.transpose(0, 2, 1, 3, 4)),  # [b,f,c,h,w]
        "prompt_ids": jnp.asarray([_byte_ids(prompts[0])], jnp.int32),
    }
    out_j = module.pipe(
        params, batch, jax.random.key(0), num_frames=T, height=H, width=W,
        ddim_steps=6, unconditional_guidance_scale=2.0, ddim_eta=0.0,
        timestep_spacing="uniform", fs=7, decode_chunk_size=16,
        latents=jnp.asarray(x_T.transpose(0, 2, 3, 4, 1)),
    )
    out_j = np.asarray(out_j).transpose(0, 2, 1, 3, 4)  # -> [b, c, t, h, w]

    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_svd_whole_pipeline_parity():
    """Torch mirror of the reference SVD chain (diffusers
    StableVideoDiffusionPipeline semantics as the reference drives it:
    CLIP-pooled conditioning, raw-mode condition latent, EDM Euler loop
    with per-frame CFG ramp, temporal VAE decode — reference
    ``svd/pipelines/pipeline.py:60-160`` + ``svd/module.py:60-90,280-296``)
    vs our ``SVDPipeline.__call__`` end to end."""
    import jax
    import jax.numpy as jnp
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    from test_activation_parity import _TSVDUNet, _TSVDVAE

    from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder
    from motionrag_tpu.models.svd.pipeline import SVDPipeline
    from motionrag_tpu.models.svd.unet import UNetSpatioTemporal
    from motionrag_tpu.models.svd.vae import AutoencoderKLTemporalDecoder
    from motionrag_tpu.utils import porting
    from motionrag_tpu.utils.porting_diffusion import port_svd_unet, port_svd_vae

    in_ch, out_ch, ctx = 8, 4, 48
    f, h, w, steps = 4, 64, 64, 6
    fps, motion_bucket_id = 7, 127

    # ---- torch components (diffusers-keyed mirrors + real transformers CLIP)
    t_unet = _TSVDUNet(in_ch, out_ch, chans=(32, 64, 64, 64), layers=1,
                       ctx_dim=ctx, heads=(1, 2, 2, 2))
    _randomize(t_unet, seed=21, scale=0.05)
    t_vae = _TSVDVAE(chans=(32, 32, 64, 64))
    _randomize(t_vae, seed=22, scale=0.06)
    clip_cfg = CLIPVisionConfig(
        image_size=w, patch_size=16, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128, projection_dim=ctx,
        hidden_act="gelu",
    )
    torch.manual_seed(23)
    t_clip = CLIPVisionModelWithProjection(clip_cfg).eval()

    rng = np.random.default_rng(9)
    image = rng.uniform(-1, 1, (1, 3, h, w)).astype(np.float32)
    x_T = rng.standard_normal((1, f, 4, h // 8, w // 8)).astype(np.float32)
    scale_factor = 0.18215

    CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
    CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)

    with torch.no_grad():
        # CLIP conditioning (resize is identity at matching size)
        xn = (torch.from_numpy(image) + 1.0) / 2.0
        xn = (xn - torch.from_numpy(CLIP_MEAN)[:, None, None]) / \
            torch.from_numpy(CLIP_STD)[:, None, None]
        emb = t_clip(pixel_values=xn).image_embeds[:, None]  # [b, 1, ctx]

        # raw-mode condition latent (noise_aug_strength = 0 -> deterministic)
        moments = t_vae.encode_moments(torch.from_numpy(image))
        img_lat = moments[:, :4]  # mode = mean

        ids = torch.tensor([[float(fps - 1), float(motion_bucket_id), 0.0]])

        # EDM Euler loop, karras sigmas (trajectory pinned separately)
        ramp = torch.linspace(0, 1, steps, dtype=torch.float64)
        sig = ((700.0 ** (1 / 7) + ramp * (0.002 ** (1 / 7) - 700.0 ** (1 / 7))) ** 7).float()
        gs = torch.linspace(1.0, 3.0, f).reshape(1, f, 1, 1, 1)
        x = torch.from_numpy(x_T) * float(np.sqrt(float(sig[0]) ** 2 + 1.0))
        cond_lat = img_lat[:, None].repeat(1, f, 1, 1, 1)  # [b, f, 4, hl, wl]
        for i in range(steps):
            sigma = float(sig[i])
            scaled = x / np.sqrt(sigma ** 2 + 1.0)
            c_noise = torch.tensor([0.25 * np.log(sigma)], dtype=torch.float32)
            out_u = t_unet(torch.cat([scaled, torch.zeros_like(cond_lat)], 2),
                           c_noise, torch.zeros_like(emb), ids)
            out_c = t_unet(torch.cat([scaled, cond_lat], 2), c_noise, emb, ids)
            den_u = out_u * (-sigma / np.sqrt(sigma ** 2 + 1.0)) + x / (sigma ** 2 + 1.0)
            den_c = out_c * (-sigma / np.sqrt(sigma ** 2 + 1.0)) + x / (sigma ** 2 + 1.0)
            denoised = den_u + gs * (den_c - den_u)
            d = (x - denoised) / sigma
            sigma_next = float(sig[i + 1]) if i + 1 < steps else 0.0
            x = x + d * (sigma_next - sigma)

        # temporal VAE decode (latents live in the scaled space)
        flat = x.reshape(f, 4, h // 8, w // 8) / scale_factor
        frames_t = t_vae.decode(flat, f).reshape(1, f, 3, h, w).numpy()

    # ---- ours ---------------------------------------------------------------
    sd = {}
    for k, v in t_unet.state_dict().items():
        sd[k.replace(".net.1.", ".net.2.")] = v
    pipe = SVDPipeline(
        unet=UNetSpatioTemporal(
            in_channels=in_ch, out_channels=out_ch,
            block_out_channels=(32, 64, 64, 64), layers_per_block=1,
            cross_attention_dim=ctx, num_attention_heads=(1, 2, 2, 2),
            addition_time_embed_dim=32, dtype=jnp.float32),
        vae=AutoencoderKLTemporalDecoder(block_out_channels=(32, 32, 64, 64),
                                         dtype=jnp.float32),
        image_encoder=CLIPImageEmbedder(
            image_size=w, patch_size=16, dim=32, depth=2, heads=2,
            projection_dim=ctx, pooled=True, dtype=jnp.float32),
        dtype=jnp.float32,
    )
    params = {
        "unet": port_svd_unet(sd, layers_per_block=1, strict=True),
        "vae": port_svd_vae(_sd_numpy(t_vae), strict=True),
        "image_encoder": {"params": {"encoder": porting.port_clip_vision(
            t_clip.state_dict(), depth=2)["params"]}},
    }

    out_j = pipe(
        params, jnp.asarray(image), jax.random.key(0), num_frames=f,
        height=h, width=w, num_inference_steps=steps,
        min_guidance_scale=1.0, max_guidance_scale=3.0, fps=fps,
        motion_bucket_id=motion_bucket_id, noise_aug_strength=0.0,
        decode_chunk_size=16,
        latents=jnp.asarray(x_T.transpose(0, 1, 3, 4, 2)),
    )
    np.testing.assert_allclose(np.asarray(out_j), frames_t, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_cogvideox_whole_pipeline_parity():
    """Torch mirror of the reference CogVideoX I2V chain (diffusers
    CogVideoXImageToVideoPipeline semantics as the reference drives it:
    T5 prompt + encoded-"" negative, scaled mode image latent zero-padded
    over time, shared image latents across CFG branches, v-pred DDIM loop,
    3D-VAE decode — reference ``cogvideox/pipeline.py:13-140``) vs our
    ``CogVideoXImageToVideoPipeline.__call__`` end to end."""
    import jax
    import jax.numpy as jnp
    from transformers import T5Config, T5EncoderModel

    from test_activation_parity import _TCogVideoX, _TCogVAE, _t_cog_alphas

    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D
    from motionrag_tpu.models.cogvideox.pipeline import CogVideoXImageToVideoPipeline
    from motionrag_tpu.models.cogvideox.vae3d import CogVideoXVAE
    from motionrag_tpu.models.encoders.t5 import T5Encoder
    from motionrag_tpu.utils import porting
    from motionrag_tpu.utils.porting_diffusion import (
        port_cogvideox_transformer, port_cogvideox_vae)

    f, h, w, steps, g = 5, 32, 48, 6, 3.0
    f_lat, hl, wl = 2, h // 8, w // 8
    in_ch, out_ch, dim, depth, heads, hd, text_d, t_d = 8, 4, 64, 2, 4, 16, 32, 32
    L = 5  # prompt length

    t_dit = _TCogVideoX(in_ch, out_ch, dim, depth, heads, hd, text_d, t_d)
    _randomize(t_dit, seed=31)
    t_vae = _TCogVAE(chans=(32, 32, 64, 64), latent=4)
    _randomize(t_vae, seed=32, scale=0.06)
    t5_cfg = T5Config(
        vocab_size=100, d_model=text_d, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(33)
    t_t5 = T5EncoderModel(t5_cfg).eval()

    rng = np.random.default_rng(13)
    image = rng.uniform(-1, 1, (1, 3, h, w)).astype(np.float32)
    x_T = rng.standard_normal((1, f_lat, 4, hl, wl)).astype(np.float32)
    ids = np.array([[7, 12, 3, 9, 1]], np.int64)         # prompt + </s>
    neg_ids = np.array([[1, 0, 0, 0, 0]], np.int64)      # "" -> </s> + pads
    scaling = 1.15258426

    with torch.no_grad():
        pos = t_t5(input_ids=torch.from_numpy(ids)).last_hidden_state
        neg = t_t5(input_ids=torch.from_numpy(neg_ids)).last_hidden_state

        # scaled mode image latent, zero-padded over latent time
        vid = torch.from_numpy(image)[:, :, None]  # [b, c, 1, h, w]
        mom = t_vae.encode_moments(vid)            # [b, 2C, 1, hl, wl]
        img_lat = mom[:, :4] * scaling
        img_lat = torch.cat(
            [img_lat, torch.zeros(1, 4, f_lat - 1, hl, wl)], dim=2
        ).permute(0, 2, 1, 3, 4)                   # [b, f_lat, C, hl, wl]

        acp = _t_cog_alphas()
        T = 1000
        ts = torch.from_numpy(
            (np.round(np.arange(T, 0, -T / steps)).astype(np.int64) - 1)[:steps])
        x = torch.from_numpy(x_T.copy())
        for i in range(steps):
            t = ts[i]
            model_in = torch.cat([x, img_lat], dim=2)  # channel concat
            vu = t_dit(model_in, neg, t[None])
            vc = t_dit(model_in, pos, t[None])
            v = vu + g * (vc - vu)
            a_t = acp[t]
            prev_t = t - T // steps
            a_prev = acp[prev_t] if prev_t >= 0 else torch.tensor(1.0)
            x0 = a_t.sqrt() * x - (1 - a_t).sqrt() * v
            eps = a_t.sqrt() * v + (1 - a_t).sqrt() * x
            x = a_prev.sqrt() * x0 + (1 - a_prev).sqrt() * eps

        frames_t = t_vae.decode(x.permute(0, 2, 1, 3, 4) / scaling)
        frames_t = frames_t.permute(0, 2, 1, 3, 4).numpy()  # [b, f, c, h, w]

    # ---- ours ---------------------------------------------------------------
    sd = {}
    for k, v_ in t_dit.state_dict().items():
        sd[k.replace("ff.net.1.", "ff.net.2.")] = v_
    pipe = CogVideoXImageToVideoPipeline(
        transformer=CogVideoXTransformer3D(
            in_channels=in_ch, out_channels=out_ch, dim=dim, depth=depth,
            heads=heads, head_dim=hd, text_embed_dim=text_d,
            time_embed_dim=t_d, dtype=jnp.float32),
        vae=CogVideoXVAE(latent_channels=4, block_out_channels=(32, 32, 64, 64),
                         dtype=jnp.float32),
        text_encoder=T5Encoder(vocab_size=100, dim=text_d, depth=2, heads=4,
                               head_dim=8, ff_dim=64, num_buckets=8,
                               max_distance=16, dtype=jnp.float32),
        scheduler="ddim", dtype=jnp.float32,
    )
    params = {
        "transformer": port_cogvideox_transformer(sd, depth=depth, strict=True),
        "vae": port_cogvideox_vae(_sd_numpy(t_vae), strict=True),
        "text_encoder": porting.port_t5_encoder(t_t5.state_dict(), depth=2),
    }

    out_j = pipe(
        params, jnp.asarray(image), jax.random.key(0),
        prompt_ids=jnp.asarray(ids), negative_prompt_ids=jnp.asarray(neg_ids),
        num_frames=f, height=h, width=w, num_inference_steps=steps,
        guidance_scale=g, steps_per_launch=None,
        latents=jnp.asarray(x_T.transpose(0, 1, 3, 4, 2)),
    )
    np.testing.assert_allclose(np.asarray(out_j), frames_t, rtol=2e-3, atol=2e-3)
