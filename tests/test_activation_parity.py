"""Full-model activation parity, torch <-> Flax, through the converters.

The vendored reference lvdm stack runs on the installed CPU torch
(``/root/reference/src/projects/dynamicrafter/DynamiCrafter``). We build
reduced-width but structurally complete instances, randomize every torch
parameter, port the state_dict through ``utils/porting_diffusion.py``, and
assert forward activations match — the strongest offline proof that real
DynamiCrafter checkpoints will load and run correctly (VERDICT r1 item 2).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference/src/projects/dynamicrafter"


def _import_lvdm():
    """Import the vendored lvdm tree as the 'DynamiCrafter' namespace package
    with a minimal lightning stub (lightning is not installed here)."""
    if REF_ROOT not in sys.path:
        # APPEND, never insert(0): the reference tree has its own main.py /
        # tools/ which would shadow ours for later-imported test modules
        sys.path.append(REF_ROOT)
    if "lightning" not in sys.modules:
        import importlib.machinery

        pl_stub = types.ModuleType("lightning.pytorch")
        pl_stub.LightningModule = torch.nn.Module
        lightning_stub = types.ModuleType("lightning")
        lightning_stub.pytorch = pl_stub
        # a real __spec__ keeps later find_spec("lightning") probes working
        for name, mod in (("lightning", lightning_stub),
                          ("lightning.pytorch", pl_stub)):
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    import DynamiCrafter.lvdm  # noqa: F401

    return sys.modules["DynamiCrafter"]


def _randomize(model: torch.nn.Module, seed: int = 0, scale: float = 0.08):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    model.eval()


def _sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.mark.slow
def test_unet3d_activation_parity():
    """Reduced-width lvdm UNetModel (torch, the reference's own vendored
    source: openaimodel3d.py:284-636) vs our UNet3D via port_lvdm_unet3d —
    same inputs, activations must agree."""
    _import_lvdm()
    from DynamiCrafter.lvdm.modules.networks.openaimodel3d import UNetModel

    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D
    from motionrag_tpu.utils.porting_diffusion import port_lvdm_unet3d

    b, t, h, w = 1, 4, 16, 16
    ctx_dim, mc = 32, 32

    tmodel = UNetModel(
        in_channels=8, model_channels=mc, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], channel_mult=[1, 2], context_dim=ctx_dim,
        num_head_channels=16, transformer_depth=1, use_linear=True,
        temporal_conv=True, temporal_attention=True, use_relative_position=False,
        use_causal_attention=False, temporal_length=t, addition_attention=True,
        image_cross_attention=True, action_cross_attention=True,
        fs_condition=True, dropout=0.0,
    )
    _randomize(tmodel)

    junet = UNet3D(
        in_channels=8, out_channels=4, model_channels=mc, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2), num_head_channels=16,
        transformer_depth=1, context_dim=ctx_dim, temporal_conv=True,
        temporal_attention=True, addition_attention=True,
        image_cross_attention=True, action_cross_attention=True,
        fs_condition=True, dtype=jnp.float32,
    )
    ported = port_lvdm_unet3d(
        _sd_numpy(tmodel), channel_mult=(1, 2), num_res_blocks=1,
        attention_levels=(0, 1), temporal_attention=True, strict=True,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, 8, t, h, w)).astype(np.float32)
    prompt = rng.standard_normal((b, 5, ctx_dim)).astype(np.float32)
    image = rng.standard_normal((b, t * 3, ctx_dim)).astype(np.float32)
    action = rng.standard_normal((b, 4, ctx_dim)).astype(np.float32)
    timesteps = np.asarray([451.0], np.float32)
    fs = np.asarray([7.0], np.float32)

    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(x), torch.from_numpy(timesteps),
            context={
                "prompt": torch.from_numpy(prompt),
                "image": torch.from_numpy(image),
                "action": torch.from_numpy(action),
            },
            fs=torch.from_numpy(fs).long(),
        ).numpy()

    j_out = junet.apply(
        ported,
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(timesteps),
        {"prompt": jnp.asarray(prompt), "image": jnp.asarray(image),
         "action": jnp.asarray(action)},
        fs=jnp.asarray(fs),
    )
    j_out = np.asarray(j_out).transpose(0, 4, 1, 2, 3)

    np.testing.assert_allclose(j_out, t_out, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_autoencoder_kl_activation_parity():
    """Reduced-width lvdm AutoencoderKL (torch, vendored
    lvdm/models/autoencoder.py:13-219 + ae_modules) vs our AutoencoderKL2D
    via port_autoencoder_kl: encoder mode latents and decoder output."""
    _import_lvdm()
    from DynamiCrafter.lvdm.models.autoencoder import AutoencoderKL

    import jax.numpy as jnp

    from motionrag_tpu.models.dynamicrafter.vae import AutoencoderKL2D
    from motionrag_tpu.utils.porting_diffusion import port_autoencoder_kl

    ddconfig = dict(
        double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 2], num_res_blocks=2, attn_resolutions=[],
        dropout=0.0,
    )
    tmodel = AutoencoderKL(
        ddconfig, {"target": "torch.nn.Identity"}, embed_dim=4,
    )
    _randomize(tmodel, seed=3)

    jvae = AutoencoderKL2D(latent_channels=4, block_out_channels=(32, 64),
                           dtype=jnp.float32)
    ported = port_autoencoder_kl(
        _sd_numpy(tmodel), n_levels=2, enc_blocks=2, dec_blocks=3, strict=True,
    )

    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        posterior = tmodel.encode(torch.from_numpy(img))
        z_t = posterior.mode().numpy()
        dec_t = tmodel.decode(torch.from_numpy(z_t)).numpy()

    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))
    z_j = np.asarray(jvae.apply(ported, img_j, method="encode"))
    np.testing.assert_allclose(
        z_j.transpose(0, 3, 1, 2), z_t, rtol=2e-4, atol=2e-4
    )
    dec_j = np.asarray(jvae.apply(ported, jnp.asarray(z_j), method="decode"))
    np.testing.assert_allclose(
        dec_j.transpose(0, 3, 1, 2), dec_t, rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_videomae2_activation_parity():
    """Tiny VideoMAEv2 (the reference's vendored torch vit.py — the same
    architecture as the OpenGVLab trust_remote_code model) vs our
    VisionTransformer(variant='videomae2') via port_videomae2."""
    import importlib.util

    # timm stub: the vendored vit.py imports three helpers from timm.
    # Spec-less ModuleType entries in sys.modules break later
    # importlib.util.find_spec("timm") probes inside transformers
    # ("timm.__spec__ is None"), so install only for the duration of the
    # reference-module exec and remove afterwards.
    injected = []
    if "timm" not in sys.modules:
        import importlib.machinery

        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.drop_path = lambda x, p=0.0, training=False: x
        layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
        layers.trunc_normal_ = lambda t, std=1.0: torch.nn.init.trunc_normal_(t, std=std)
        models.layers = layers
        timm.models = models
        for name, mod in (("timm", timm), ("timm.models", models),
                          ("timm.models.layers", layers)):
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
            injected.append(name)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_vit", "/root/reference/src/projects/condition/encoders/vit.py"
        )
        ref_vit = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_vit)
    finally:
        for name in injected:
            sys.modules.pop(name, None)

    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.encoders.vit import VisionTransformer
    from motionrag_tpu.utils.porting import port_videomae2

    depth, dim, heads = 2, 32, 2
    tmodel = ref_vit.VisionTransformer(
        img_size=32, patch_size=16, embed_dim=dim, depth=depth, num_heads=heads,
        mlp_ratio=4, qkv_bias=True, all_frames=4, tubelet_size=2,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        use_mean_pooling=True, init_values=0.0,
    )
    _randomize(tmodel, seed=5)

    jmodel = VisionTransformer(
        variant="videomae2", image_size=32, patch_size=16, num_frames=4,
        tubelet_size=2, dim=dim, depth=depth, heads=heads, dtype=jnp.float32,
    )
    ported = port_videomae2(_sd_numpy(tmodel), depth=depth)

    rng = np.random.default_rng(2)
    # [b, c, t, h, w] for torch; [b, t, c, h, w] for ours
    video = rng.standard_normal((1, 4, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        # replicate the reference embedder's manual forward_features
        # (condition.py:434-450): patch_embed + pos_embed + blocks, no norm
        x = tmodel.patch_embed(torch.from_numpy(video.transpose(0, 2, 1, 3, 4)))
        x = x + tmodel.pos_embed.expand(1, -1, -1).type_as(x)
        for blk in tmodel.blocks:
            x = blk(x)
        t_out = x.numpy()

    j_out = np.asarray(jmodel.apply(ported, jnp.asarray(video)))
    np.testing.assert_allclose(j_out, t_out, rtol=2e-4, atol=2e-4)


class _StubLVDM:
    """Minimal stand-in for LatentVisualDiffusion exposing exactly what the
    vendored DDIMSampler reads (schedule buffers + apply_model), with the
    DynamiCrafter schedule (linear 0.00085..0.012, zero-terminal-SNR,
    dynamic rescale base 0.3/turning 400, v-param)."""

    def __init__(self, denoise):
        _import_lvdm()
        from DynamiCrafter.lvdm.models.utils_diffusion import (
            make_beta_schedule,
            rescale_zero_terminal_snr,
        )

        betas = make_beta_schedule(
            "linear", 1000, linear_start=0.00085, linear_end=0.012
        )
        betas = rescale_zero_terminal_snr(betas)
        acp = np.cumprod(1.0 - betas)
        self.num_timesteps = 1000
        self.betas = torch.tensor(betas, dtype=torch.float32)
        self.alphas_cumprod_np = acp
        self.alphas_cumprod = torch.tensor(acp, dtype=torch.float32)
        self.alphas_cumprod_prev = torch.tensor(
            np.append(1.0, acp[:-1]), dtype=torch.float32
        )
        self.sqrt_alphas_cumprod = torch.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = torch.sqrt(1.0 - self.alphas_cumprod)
        scale_arr = np.concatenate(
            [np.linspace(1.0, 0.3, 400), np.full(1000, 0.3)]
        )[:1000]
        self.scale_arr = torch.tensor(scale_arr, dtype=torch.float32)
        self.use_dynamic_rescale = True
        self.parameterization = "v"
        self.device = torch.device("cpu")
        self._denoise = denoise

    def apply_model(self, x, t, cond, **kwargs):
        return self._denoise(x, t, cond)

    def predict_start_from_z_and_v(self, x_t, t, v):
        a = self.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1, 1)
        om = self.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1, 1)
        return a * x_t - om * v

    def predict_eps_from_z_and_v(self, x_t, t, v):
        a = self.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1, 1)
        om = self.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1, 1)
        return a * v + om * x_t


@pytest.mark.slow
@pytest.mark.parametrize("spacing", ["uniform", "uniform_trailing"])
def test_ddim_trajectory_parity(spacing):
    """Full multi-step DDIM trajectory, CFG + guidance rescale + dynamic
    rescale + zero-terminal-SNR, vendored torch sampler vs our jitted
    ddim_sample, with an identical closed-form 'denoiser' on both sides."""
    _import_lvdm()
    from DynamiCrafter.lvdm.models.samplers.ddim import DDIMSampler

    import jax.numpy as jnp

    from motionrag_tpu.models.dynamicrafter.ddim import LVDMSchedule, ddim_sample

    b, t, h, w, c = 1, 3, 4, 4, 4
    rng = np.random.default_rng(7)
    w_cond = rng.standard_normal((1,)).astype(np.float32) * 0.1
    x_T = rng.standard_normal((b, c, t, h, w)).astype(np.float32)
    cond_vec = rng.standard_normal((b, c, t, h, w)).astype(np.float32)
    uncond_vec = np.zeros_like(cond_vec)

    def denoise_torch(x, tt, cond):
        # cond arrives batch-doubled [cond; uncond] in the CFG path
        cv = cond["c_crossattn"]
        tscaled = (tt.float() / 1000.0).reshape(-1, 1, 1, 1, 1)
        return 0.3 * torch.tanh(x) + 0.2 * cv + 0.05 * tscaled * x + float(w_cond[0])

    stub = _StubLVDM(denoise_torch)
    # the vendored register_buffer forces .to('cuda'); route it to plain setattr
    DDIMSampler.register_buffer = lambda self, name, attr: setattr(self, name, attr)
    sampler = DDIMSampler(stub)
    with torch.no_grad():
        samples_t, _ = sampler.sample(
            S=6, batch_size=b, shape=(c, t, h, w),
            conditioning={"c_crossattn": torch.from_numpy(cond_vec)},
            unconditional_conditioning={"c_crossattn": torch.from_numpy(uncond_vec)},
            unconditional_guidance_scale=3.5, guidance_rescale=0.7,
            x_T=torch.from_numpy(x_T), timestep_spacing=spacing, verbose=False,
            schedule_verbose=False,
        )
    samples_t = samples_t.numpy()

    schedule = LVDMSchedule(
        rescale_betas_zero_snr=True, use_dynamic_rescale=True, base_scale=0.3
    )
    # identical closed-form denoiser, NHWC
    def denoise_jax(x, tt):
        tscaled = (tt.astype(jnp.float32) / 1000.0).reshape(-1, 1, 1, 1, 1)

        def f(cv):
            return 0.3 * jnp.tanh(x) + 0.2 * cv + 0.05 * tscaled * x + float(w_cond[0])

        return f(jnp.asarray(cond_vec.transpose(0, 2, 3, 4, 1))), f(
            jnp.asarray(uncond_vec.transpose(0, 2, 3, 4, 1))
        )

    samples_j = ddim_sample(
        schedule, denoise_jax, jnp.asarray(x_T.transpose(0, 2, 3, 4, 1)),
        num_steps=6, guidance_scale=3.5, guidance_rescale=0.7,
        parameterization="v", timestep_spacing=spacing,
    )
    samples_j = np.asarray(samples_j).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(samples_j, samples_t, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# CogVideoX DiT: independent torch re-implementation (diffusers
# CogVideoXTransformer3DModel structure + key names, reference
# ``cogvideox/module.py:22-49`` loads it via diffusers) vs our
# CogVideoXTransformer3D through port_cogvideox_transformer.
# ---------------------------------------------------------------------------


def _t_rope_3d(head_dim, f, ph, pw):
    """torch build of diffusers get_3d_rotary_pos_embed: per-axis bands
    (t: d/4, h: 3d/8, w: 3d/8), interleave-duplicated cos/sin [S, D]."""
    dim_t, dim_h = head_dim // 4, head_dim // 8 * 3
    dim_w = head_dim - dim_t - dim_h

    def axis(n, d):
        theta = 1.0 / (10000.0 ** (torch.arange(0, d, 2).double() / d))
        return torch.outer(torch.arange(n).double(), theta)  # [n, d/2]

    ft, fh, fw = axis(f, dim_t), axis(ph, dim_h), axis(pw, dim_w)
    grid = torch.cat(
        [
            ft[:, None, None, :].expand(f, ph, pw, -1),
            fh[None, :, None, :].expand(f, ph, pw, -1),
            fw[None, None, :, :].expand(f, ph, pw, -1),
        ],
        dim=-1,
    ).reshape(f * ph * pw, head_dim // 2)
    cos = grid.cos().repeat_interleave(2, dim=-1).float()
    sin = grid.sin().repeat_interleave(2, dim=-1).float()
    return cos, sin


def _t_apply_rope(x, cos, sin):
    """diffusers apply_rotary_emb, use_real=True, interleaved pairs
    (use_real_unbind_dim=-1); x [b, heads, s, d]."""
    x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(-2)
    return (x.float() * cos + x_rot.float() * sin).to(x.dtype)


class _TCogBlock(torch.nn.Module):
    """diffusers CogVideoXBlock: CogVideoXLayerNormZero (affine inner LN
    shared by both streams) -> joint attention with per-head QK LayerNorm
    (eps 1e-6) + RoPE on the video part -> gated residual; same for the
    gelu-tanh FF over the re-concatenated joint sequence."""

    def __init__(self, dim, heads, head_dim, time_embed_dim):
        super().__init__()
        nn = torch.nn
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.norm1 = nn.ModuleDict(
            dict(linear=nn.Linear(time_embed_dim, 6 * dim), norm=nn.LayerNorm(dim, eps=1e-5))
        )
        self.attn1 = nn.ModuleDict(
            dict(
                to_q=nn.Linear(dim, inner), to_k=nn.Linear(dim, inner),
                to_v=nn.Linear(dim, inner),
                norm_q=nn.LayerNorm(head_dim, eps=1e-6),
                norm_k=nn.LayerNorm(head_dim, eps=1e-6),
            )
        )
        # diffusers names the out projection attn1.to_out.0 (to_out.1=Dropout)
        self.attn1.to_out = nn.ModuleList([nn.Linear(inner, dim)])
        self.norm2 = nn.ModuleDict(
            dict(linear=nn.Linear(time_embed_dim, 6 * dim), norm=nn.LayerNorm(dim, eps=1e-5))
        )
        self.ff = nn.ModuleDict()
        self.ff.net = nn.ModuleList(
            [nn.ModuleDict(dict(proj=nn.Linear(dim, 4 * dim))), nn.Linear(4 * dim, dim)]
        )
        # key-name shim: diffusers ff.net = [GELU(proj), Dropout, Linear] so
        # the final linear is ff.net.2 — rename our index-1 entry on export
        self._ff_out_key = "ff.net.2"

    def _ln_zero(self, mod, h, e, temb):
        six = mod.linear(torch.nn.functional.silu(temb))
        shift, scale, gate, e_shift, e_scale, e_gate = six.chunk(6, dim=1)
        h = mod.norm(h) * (1 + scale)[:, None] + shift[:, None]
        e = mod.norm(e) * (1 + e_scale)[:, None] + e_shift[:, None]
        return h, e, gate[:, None], e_gate[:, None]

    def forward(self, hidden, enc, temb, rope):
        b, st = hidden.shape[0], enc.shape[1]
        h_n, e_n, gate, e_gate = self._ln_zero(self.norm1, hidden, enc, temb)
        x = torch.cat([e_n, h_n], dim=1)
        s = x.shape[1]

        def heads_first(t):
            return t.view(b, s, self.heads, self.head_dim).transpose(1, 2)

        q = self.attn1.norm_q(heads_first(self.attn1.to_q(x)))
        k = self.attn1.norm_k(heads_first(self.attn1.to_k(x)))
        v = heads_first(self.attn1.to_v(x))
        if rope is not None:
            cos, sin = rope
            q = torch.cat([q[:, :, :st], _t_apply_rope(q[:, :, st:], cos, sin)], dim=2)
            k = torch.cat([k[:, :, :st], _t_apply_rope(k[:, :, st:], cos, sin)], dim=2)
        out = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, s, -1)
        out = self.attn1.to_out[0](out)
        hidden = hidden + gate * out[:, st:]
        enc = enc + e_gate * out[:, :st]

        h_n, e_n, gate, e_gate = self._ln_zero(self.norm2, hidden, enc, temb)
        x = torch.cat([e_n, h_n], dim=1)
        ff = self.ff.net[1](torch.nn.functional.gelu(self.ff.net[0].proj(x), approximate="tanh"))
        hidden = hidden + gate * ff[:, st:]
        enc = enc + e_gate * ff[:, :st]
        return hidden, enc


class _TCogVideoX(torch.nn.Module):
    """Reduced-config diffusers CogVideoXTransformer3DModel: patch_embed
    (Conv2d per frame + text_proj, text tokens first), sinusoid timestep ->
    2-linear MLP, N blocks, norm_final over the joint sequence, AdaLayerNorm
    out (affine inner LN, shift-then-scale chunk order), proj_out."""

    def __init__(self, in_ch, out_ch, dim, depth, heads, head_dim, text_d, t_d, p=2):
        super().__init__()
        nn = torch.nn
        self.p, self.t_d, self.out_ch = p, t_d, out_ch
        self.patch_embed = nn.ModuleDict(
            dict(proj=nn.Conv2d(in_ch, dim, p, stride=p), text_proj=nn.Linear(text_d, dim))
        )
        self.time_embedding = nn.ModuleDict(
            dict(linear_1=nn.Linear(dim, t_d), linear_2=nn.Linear(t_d, t_d))
        )
        self.transformer_blocks = nn.ModuleList(
            [_TCogBlock(dim, heads, head_dim, t_d) for _ in range(depth)]
        )
        self.head_dim = head_dim
        self.norm_final = nn.LayerNorm(dim, eps=1e-5)
        self.norm_out = nn.ModuleDict(
            dict(linear=nn.Linear(t_d, 2 * dim), norm=nn.LayerNorm(dim, eps=1e-5))
        )
        self.proj_out = nn.Linear(dim, p * p * out_ch)

    def _timesteps(self, t, dim):
        half = dim // 2
        freqs = torch.exp(-torch.log(torch.tensor(10000.0)) * torch.arange(half).float() / half)
        args = t.float()[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)  # flip_sin_to_cos

    def forward(self, latents, text, timestep):
        # latents [b, f, c, h, w] (torch channel order), text [b, st, text_d]
        b, f, c, h, w = latents.shape
        p = self.p
        x = self.patch_embed.proj(latents.reshape(b * f, c, h, w))
        x = x.flatten(2).transpose(1, 2).reshape(b, -1, x.shape[1])  # [b, f*ph*pw, dim]
        e = self.patch_embed.text_proj(text)

        temb = self._timesteps(timestep, x.shape[-1])
        temb = self.time_embedding.linear_2(
            torch.nn.functional.silu(self.time_embedding.linear_1(temb))
        )
        rope = _t_rope_3d(self.head_dim, f, h // p, w // p)

        hidden, enc = x, e
        for blk in self.transformer_blocks:
            hidden, enc = blk(hidden, enc, temb, rope)

        st = enc.shape[1]
        joint = self.norm_final(torch.cat([enc, hidden], dim=1))
        hidden = joint[:, st:]
        two = self.norm_out.linear(torch.nn.functional.silu(temb))
        shift, scale = two.chunk(2, dim=1)
        hidden = self.norm_out.norm(hidden) * (1 + scale)[:, None] + shift[:, None]
        out = self.proj_out(hidden)

        ph, pw = h // p, w // p
        out = out.reshape(b, f, ph, pw, p, p, self.out_ch)
        out = out.permute(0, 1, 6, 2, 4, 3, 5).reshape(b, f, self.out_ch, h, w)
        return out


@pytest.mark.slow
def test_cogvideox_dit_activation_parity():
    """Reduced-config CogVideoX DiT: torch (diffusers structure + exact
    checkpoint key names) vs our Flax CogVideoXTransformer3D via
    port_cogvideox_transformer — same weights, same inputs, same output."""
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D
    from motionrag_tpu.utils.porting_diffusion import port_cogvideox_transformer

    in_ch, out_ch, dim, depth, heads, hd, text_d, t_d = 8, 4, 64, 2, 4, 16, 32, 32
    tm = _TCogVideoX(in_ch, out_ch, dim, depth, heads, hd, text_d, t_d)
    _randomize(tm, seed=3)

    # export with diffusers key names (rename ff.net.1 -> ff.net.2)
    sd = {}
    for k, v in tm.state_dict().items():
        sd[k.replace("ff.net.1.", "ff.net.2.")] = v
    ported = port_cogvideox_transformer(sd, depth=depth, strict=True)

    dit = CogVideoXTransformer3D(
        in_channels=in_ch, out_channels=out_ch, dim=dim, depth=depth,
        heads=heads, head_dim=hd, text_embed_dim=text_d, time_embed_dim=t_d,
        dtype=jnp.float32,
    )

    rng = np.random.default_rng(0)
    lat = rng.standard_normal((2, 3, in_ch, 4, 6), dtype=np.float32)  # b f c h w
    txt = rng.standard_normal((2, 5, text_d), dtype=np.float32)
    ts = np.asarray([17, 431], dtype=np.int64)

    with torch.no_grad():
        out_t = tm(torch.from_numpy(lat), torch.from_numpy(txt), torch.from_numpy(ts))
    out_j = dit.apply(
        ported, jnp.asarray(lat.transpose(0, 1, 3, 4, 2)), jnp.asarray(txt),
        jnp.asarray(ts),
    )
    out_j = np.asarray(out_j).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(out_j, out_t.numpy(), rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# SVD UNet: independent torch re-implementation (diffusers
# UNetSpatioTemporalConditionModel structure + checkpoint key names,
# reference ``svd/module.py:37-47`` loads it via diffusers) vs our
# UNetSpatioTemporal through port_svd_unet.
# ---------------------------------------------------------------------------


def _t_sinusoid(t, dim):
    """diffusers Timesteps, flip_sin_to_cos=True, downscale_freq_shift=0."""
    half = dim // 2
    freqs = torch.exp(-torch.log(torch.tensor(10000.0)) * torch.arange(half).float() / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class _TGEGLUFF(torch.nn.Module):
    """diffusers FeedForward(geglu): net.0=GEGLU(proj), net.1=Dropout,
    net.2=Linear — exported via the net.1->net.2 rename shim."""

    def __init__(self, dim, mult=4):
        super().__init__()
        nn = torch.nn
        self.net = nn.ModuleList(
            [nn.ModuleDict(dict(proj=nn.Linear(dim, dim * mult * 2))), nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        h, gate = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[1](h * torch.nn.functional.gelu(gate))


class _TDAttn(torch.nn.Module):
    """diffusers Attention: bias-free qkv, to_out.0 linear."""

    def __init__(self, q_dim, ctx_dim, heads, head_dim):
        super().__init__()
        nn = torch.nn
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(q_dim, inner, bias=False)
        self.to_k = nn.Linear(ctx_dim or q_dim, inner, bias=False)
        self.to_v = nn.Linear(ctx_dim or q_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, q_dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, s = x.shape[0], x.shape[1]

        def hf(t):
            return t.view(b, -1, self.heads, self.head_dim).transpose(1, 2)

        out = torch.nn.functional.scaled_dot_product_attention(
            hf(self.to_q(x)), hf(self.to_k(ctx)), hf(self.to_v(ctx))
        )
        return self.to_out[0](out.transpose(1, 2).reshape(b, s, -1))


class _TBasicBlock(torch.nn.Module):
    def __init__(self, dim, heads, head_dim, ctx_dim):
        super().__init__()
        nn = torch.nn
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = _TDAttn(dim, None, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = _TDAttn(dim, ctx_dim, heads, head_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = _TGEGLUFF(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class _TTemporalBlock(torch.nn.Module):
    """diffusers TemporalBasicTransformerBlock (is_res: dim == inner)."""

    def __init__(self, dim, heads, head_dim, ctx_dim):
        super().__init__()
        nn = torch.nn
        self.norm_in = nn.LayerNorm(dim)
        self.ff_in = _TGEGLUFF(dim)
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = _TDAttn(dim, None, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = _TDAttn(dim, ctx_dim, heads, head_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = _TGEGLUFF(dim)

    def forward(self, x, context):
        x = x + self.ff_in(self.norm_in(x))
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class _TAlpha(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.mix_factor = torch.nn.Parameter(torch.tensor([0.5]))

    def alpha(self):
        return torch.sigmoid(self.mix_factor)


class _TResnet2D(torch.nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, eps=1e-5):
        super().__init__()
        nn = torch.nn
        self.norm1 = nn.GroupNorm(32, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(32, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x, temb):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        h = h + self.time_emb_proj(torch.nn.functional.silu(temb))[:, :, None, None]
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        return h + (self.conv_shortcut(x) if self.conv_shortcut is not None else x)


class _TTemporalResnet(torch.nn.Module):
    """diffusers TemporalResnetBlock: (3,1,1) convs over [b, c, f, h, w]."""

    def __init__(self, in_ch, out_ch, temb_dim, eps=1e-5):
        super().__init__()
        nn = torch.nn
        self.norm1 = nn.GroupNorm(32, in_ch, eps=eps)
        self.conv1 = nn.Conv3d(in_ch, out_ch, (3, 1, 1), padding=(1, 0, 0))
        self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(32, out_ch, eps=eps)
        self.conv2 = nn.Conv3d(out_ch, out_ch, (3, 1, 1), padding=(1, 0, 0))
        self.conv_shortcut = nn.Conv3d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x, temb):
        # temb [b, f, temb_dim]
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        t = self.time_emb_proj(torch.nn.functional.silu(temb))  # [b, f, c]
        h = h + t.permute(0, 2, 1)[:, :, :, None, None]
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        return h + (self.conv_shortcut(x) if self.conv_shortcut is not None else x)


class _TSTRes(torch.nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim):
        super().__init__()
        self.spatial_res_block = _TResnet2D(in_ch, out_ch, temb_dim)
        self.temporal_res_block = _TTemporalResnet(out_ch, out_ch, temb_dim)
        self.time_mixer = _TAlpha()

    def forward(self, x, temb, f):
        h = self.spatial_res_block(x, temb)
        bf, c, hh, ww = h.shape
        b = bf // f
        h5 = h.reshape(b, f, c, hh, ww).permute(0, 2, 1, 3, 4)
        t5 = self.temporal_res_block(h5, temb.reshape(b, f, -1))
        a = self.time_mixer.alpha()
        out = a * h5 + (1 - a) * t5
        return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


class _TSTTransformer(torch.nn.Module):
    """diffusers TransformerSpatioTemporalModel (depth 1)."""

    def __init__(self, c, heads, ctx_dim):
        super().__init__()
        nn = torch.nn
        self.c = c
        self.norm = nn.GroupNorm(32, c, eps=1e-6)
        self.proj_in = nn.Linear(c, c)
        self.transformer_blocks = nn.ModuleList([_TBasicBlock(c, heads, c // heads, ctx_dim)])
        self.temporal_transformer_blocks = nn.ModuleList(
            [_TTemporalBlock(c, heads, c // heads, ctx_dim)]
        )
        self.time_pos_embed = nn.ModuleDict(
            dict(linear_1=nn.Linear(c, 4 * c), linear_2=nn.Linear(4 * c, c))
        )
        self.time_mixer = _TAlpha()
        self.proj_out = nn.Linear(c, c)

    def forward(self, x, context, f):
        bf, c, hh, ww = x.shape
        b = bf // f
        residual = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
        h = self.proj_in(h)

        emb = self.time_pos_embed.linear_2(
            torch.nn.functional.silu(self.time_pos_embed.linear_1(_t_sinusoid(torch.arange(f), c)))
        )  # [f, c]
        tc = context.reshape(b, f, *context.shape[1:])[:, 0]  # first frame's ctx
        tc = tc[:, None].expand(b, hh * ww, *tc.shape[1:]).reshape(b * hh * ww, *tc.shape[1:])

        h = self.transformer_blocks[0](h, context)
        mix = h.reshape(b, f, hh * ww, c).permute(0, 2, 1, 3).reshape(b * hh * ww, f, c)
        mix = mix + emb[None]
        mix = self.temporal_transformer_blocks[0](mix, tc)
        mix = mix.reshape(b, hh * ww, f, c).permute(0, 2, 1, 3).reshape(bf, hh * ww, c)
        a = self.time_mixer.alpha()
        h = a * h + (1 - a) * mix
        h = self.proj_out(h)
        return h.reshape(bf, hh, ww, c).permute(0, 3, 1, 2) + residual


class _TSVDUNet(torch.nn.Module):
    def __init__(self, in_ch=8, out_ch=4, chans=(32, 64, 64, 64), layers=1,
                 ctx_dim=48, heads=(1, 2, 2, 2), addt=32):
        super().__init__()
        nn = torch.nn
        ch0, temb = chans[0], 4 * chans[0]
        self.addt, self.ch0 = addt, ch0
        self.conv_in = nn.Conv2d(in_ch, ch0, 3, padding=1)
        self.time_embedding = nn.ModuleDict(
            dict(linear_1=nn.Linear(ch0, temb), linear_2=nn.Linear(temb, temb))
        )
        self.add_embedding = nn.ModuleDict(
            dict(linear_1=nn.Linear(3 * addt, temb), linear_2=nn.Linear(temb, temb))
        )

        self.layers = layers
        skip_chans = [ch0]
        self.down_blocks = nn.ModuleList()
        prev = ch0
        for i, c in enumerate(chans):
            final = i == len(chans) - 1
            blk = nn.ModuleDict(dict(resnets=nn.ModuleList(), attentions=nn.ModuleList()))
            for j in range(layers):
                blk.resnets.append(_TSTRes(prev if j == 0 else c, c, temb))
                if not final:
                    blk.attentions.append(_TSTTransformer(c, heads[i], ctx_dim))
                skip_chans.append(c)
            if not final:
                blk.downsamplers = nn.ModuleList(
                    [nn.ModuleDict(dict(conv=nn.Conv2d(c, c, 3, stride=2, padding=1)))]
                )
                skip_chans.append(c)
            self.down_blocks.append(blk)
            prev = c

        self.mid_block = nn.ModuleDict(
            dict(
                resnets=nn.ModuleList(
                    [_TSTRes(chans[-1], chans[-1], temb), _TSTRes(chans[-1], chans[-1], temb)]
                ),
                attentions=nn.ModuleList([_TSTTransformer(chans[-1], heads[-1], ctx_dim)]),
            )
        )

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(chans))
        rheads = list(reversed(heads))
        prev = chans[-1]
        for i, c in enumerate(rev):
            first = i == 0
            blk = nn.ModuleDict(dict(resnets=nn.ModuleList(), attentions=nn.ModuleList()))
            for j in range(layers + 1):
                skip = skip_chans.pop()
                blk.resnets.append(_TSTRes(prev + skip, c, temb))
                prev = c
                if not first:
                    blk.attentions.append(_TSTTransformer(c, rheads[i], ctx_dim))
            if i < len(chans) - 1:
                blk.upsamplers = nn.ModuleList(
                    [nn.ModuleDict(dict(conv=nn.Conv2d(c, c, 3, padding=1)))]
                )
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(32, ch0, eps=1e-5)
        self.conv_out = nn.Conv2d(ch0, out_ch, 3, padding=1)

    def forward(self, sample, timestep, context, added_time_ids):
        # sample [b, f, c, h, w]; context [b, n, ctx]; ids [b, 3]
        b, f = sample.shape[:2]
        temb = self.time_embedding.linear_2(
            torch.nn.functional.silu(self.time_embedding.linear_1(_t_sinusoid(timestep, self.ch0)))
        )
        aug = _t_sinusoid(added_time_ids.flatten(), self.addt).reshape(b, -1)
        temb = temb + self.add_embedding.linear_2(
            torch.nn.functional.silu(self.add_embedding.linear_1(aug))
        )

        x = sample.flatten(0, 1)
        temb = temb.repeat_interleave(f, dim=0)
        context = context.repeat_interleave(f, dim=0)

        x = self.conv_in(x)
        residuals = [x]
        for blk in self.down_blocks:
            for j, res in enumerate(blk.resnets):
                x = res(x, temb, f)
                if len(blk.attentions):
                    x = blk.attentions[j](x, context, f)
                residuals.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0].conv(x)
                residuals.append(x)

        x = self.mid_block.resnets[0](x, temb, f)
        x = self.mid_block.attentions[0](x, context, f)
        x = self.mid_block.resnets[1](x, temb, f)

        for i, blk in enumerate(self.up_blocks):
            for j, res in enumerate(blk.resnets):
                x = torch.cat([x, residuals.pop()], dim=1)
                x = res(x, temb, f)
                if len(blk.attentions):
                    x = blk.attentions[j](x, context, f)
            if hasattr(blk, "upsamplers"):
                x = torch.nn.functional.interpolate(x, scale_factor=2.0, mode="nearest")
                x = blk.upsamplers[0].conv(x)

        x = self.conv_out(torch.nn.functional.silu(self.conv_norm_out(x)))
        return x.reshape(b, f, *x.shape[1:])


@pytest.mark.slow
def test_svd_unet_activation_parity():
    """Reduced-width SVD UNet: torch (diffusers structure + exact checkpoint
    key names) vs our Flax UNetSpatioTemporal via port_svd_unet — same
    weights, same inputs, same output."""
    import jax.numpy as jnp

    from motionrag_tpu.models.svd.unet import UNetSpatioTemporal
    from motionrag_tpu.utils.porting_diffusion import port_svd_unet

    in_ch, out_ch, ctx = 8, 4, 48
    tm = _TSVDUNet(in_ch, out_ch, chans=(32, 64, 64, 64), layers=1,
                   ctx_dim=ctx, heads=(1, 2, 2, 2))
    _randomize(tm, seed=5, scale=0.05)

    sd = {}
    for k, v in tm.state_dict().items():
        sd[k.replace(".net.1.", ".net.2.")] = v
    ported = port_svd_unet(sd, layers_per_block=1, strict=True)

    unet = UNetSpatioTemporal(
        in_channels=in_ch, out_channels=out_ch, block_out_channels=(32, 64, 64, 64),
        layers_per_block=1, cross_attention_dim=ctx, num_attention_heads=(1, 2, 2, 2),
        addition_time_embed_dim=32, dtype=jnp.float32,
    )

    rng = np.random.default_rng(1)
    f, h, w = 3, 16, 16
    sample = rng.standard_normal((1, f, in_ch, h, w), dtype=np.float32)
    context = rng.standard_normal((1, 1, ctx), dtype=np.float32)
    ids = np.asarray([[6.0, 127.0, 0.02]], dtype=np.float32)
    ts = np.asarray([441.0], dtype=np.float32)

    with torch.no_grad():
        out_t = tm(
            torch.from_numpy(sample), torch.from_numpy(ts),
            torch.from_numpy(context), torch.from_numpy(ids),
        )
    out_j = unet.apply(
        ported, jnp.asarray(sample.transpose(0, 1, 3, 4, 2)), jnp.asarray(ts),
        jnp.asarray(context), jnp.asarray(ids),
    )
    out_j = np.asarray(out_j).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(out_j, out_t.numpy(), rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------------
# SVD VAE (AutoencoderKLTemporalDecoder): torch re-implementation (diffusers
# structure + key names, reference ``svd/module.py:41``) vs ours through
# port_svd_vae. Decoder spatio-temporal blocks use diffusers'
# switch_spatial_to_temporal_mix=True semantics (alpha on the TEMPORAL arm).
# ---------------------------------------------------------------------------


class _TVAERes2D(torch.nn.Module):
    def __init__(self, in_ch, out_ch, eps=1e-6):
        super().__init__()
        nn = torch.nn
        self.norm1 = nn.GroupNorm(32, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        return h + (self.conv_shortcut(x) if self.conv_shortcut is not None else x)


class _TVAETemporalRes(torch.nn.Module):
    def __init__(self, in_ch, out_ch, eps=1e-5):
        super().__init__()
        nn = torch.nn
        self.norm1 = nn.GroupNorm(32, in_ch, eps=eps)
        self.conv1 = nn.Conv3d(in_ch, out_ch, (3, 1, 1), padding=(1, 0, 0))
        self.norm2 = nn.GroupNorm(32, out_ch, eps=eps)
        self.conv2 = nn.Conv3d(out_ch, out_ch, (3, 1, 1), padding=(1, 0, 0))
        self.conv_shortcut = nn.Conv3d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        return h + (self.conv_shortcut(x) if self.conv_shortcut is not None else x)


class _TSwitchedSTRes(torch.nn.Module):
    """SpatioTemporalResBlock, temb-free, merge_strategy='learned',
    switch_spatial_to_temporal_mix=True: alpha = 1 - sigmoid(mix_factor)."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.spatial_res_block = _TVAERes2D(in_ch, out_ch, eps=1e-6)
        self.temporal_res_block = _TVAETemporalRes(out_ch, out_ch, eps=1e-5)
        self.time_mixer = _TAlpha()

    def forward(self, x, f):
        h = self.spatial_res_block(x)
        bf, c, hh, ww = h.shape
        b = bf // f
        h5 = h.reshape(b, f, c, hh, ww).permute(0, 2, 1, 3, 4)
        t5 = self.temporal_res_block(h5)
        a = 1.0 - torch.sigmoid(self.time_mixer.mix_factor)
        out = a * h5 + (1 - a) * t5
        return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


class _TVAEAttn(torch.nn.Module):
    """diffusers VAE mid attention: GroupNorm + single-head biased qkv +
    to_out.0, residual."""

    def __init__(self, c):
        super().__init__()
        nn = torch.nn
        self.group_norm = nn.GroupNorm(32, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        hid = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        out = torch.nn.functional.scaled_dot_product_attention(
            self.to_q(hid)[:, None], self.to_k(hid)[:, None], self.to_v(hid)[:, None]
        )[:, 0]
        out = self.to_out[0](out)
        return x + out.reshape(b, h, w, c).permute(0, 3, 1, 2)


class _TSVDVAE(torch.nn.Module):
    def __init__(self, chans=(32, 32, 64, 64), latent=4, enc_blocks=2, dec_blocks=3):
        super().__init__()
        nn = torch.nn
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        prev = chans[0]
        for i, c in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for j in range(enc_blocks):
                blk.resnets.append(_TVAERes2D(prev if j == 0 else c, c))
                prev = c
            if i < len(chans) - 1:
                ds = nn.Module()
                # VAE encoder downsample: padding=0 + asymmetric (0,1,0,1) pad
                ds.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)
                blk.downsamplers = nn.ModuleList([ds])
            enc.down_blocks.append(blk)
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [_TVAERes2D(chans[-1], chans[-1]), _TVAERes2D(chans[-1], chans[-1])]
        )
        enc.mid_block.attentions = nn.ModuleList([_TVAEAttn(chans[-1])])
        enc.conv_norm_out = nn.GroupNorm(32, chans[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(chans[-1], 2 * latent, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(latent, chans[-1], 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList(
            [_TSwitchedSTRes(chans[-1], chans[-1]), _TSwitchedSTRes(chans[-1], chans[-1])]
        )
        dec.mid_block.attentions = nn.ModuleList([_TVAEAttn(chans[-1])])
        dec.up_blocks = nn.ModuleList()
        rev = list(reversed(chans))
        prev = chans[-1]
        for i, c in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for j in range(dec_blocks):
                blk.resnets.append(_TSwitchedSTRes(prev if j == 0 else c, c))
                prev = c
            if i < len(rev) - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(c, c, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = nn.GroupNorm(32, chans[0], eps=1e-6)
        dec.conv_out = nn.Conv2d(chans[0], 3, 3, padding=1)
        dec.time_conv_out = nn.Conv3d(3, 3, (3, 1, 1), padding=(1, 0, 0))
        self.decoder = dec

    def encode_moments(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(torch.nn.functional.pad(h, (0, 1, 0, 1)))
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(torch.nn.functional.silu(e.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z, f):
        d = self.decoder
        h = d.conv_in(z)
        h = d.mid_block.resnets[0](h, f)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h, f)
        for i, blk in enumerate(d.up_blocks):
            for res in blk.resnets:
                h = res(h, f)
            if hasattr(blk, "upsamplers"):
                h = torch.nn.functional.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        h = d.conv_out(torch.nn.functional.silu(d.conv_norm_out(h)))
        bf, c, hh, ww = h.shape
        h5 = h.reshape(bf // f, f, c, hh, ww).permute(0, 2, 1, 3, 4)
        h5 = d.time_conv_out(h5)
        return h5.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


@pytest.mark.slow
def test_svd_vae_activation_parity():
    """Reduced-width AutoencoderKLTemporalDecoder: torch vs ours via
    port_svd_vae — encoder moments and temporal decode both match,
    including the switched time-mixer semantics (negated mix_factor)."""
    import jax.numpy as jnp

    from motionrag_tpu.models.svd.vae import AutoencoderKLTemporalDecoder
    from motionrag_tpu.utils.porting_diffusion import port_svd_vae

    chans = (32, 32, 64, 64)
    tm = _TSVDVAE(chans=chans)
    _randomize(tm, seed=7, scale=0.06)
    ported = port_svd_vae(_sd_numpy(tm), strict=True)

    ours = AutoencoderKLTemporalDecoder(block_out_channels=chans, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    f = 3
    frames = rng.standard_normal((f, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        mom_t = tm.encode_moments(torch.from_numpy(frames)).numpy()
    mom_j = ours.apply(
        ported, jnp.asarray(frames.transpose(0, 2, 3, 1)), method="encode_moments"
    )
    np.testing.assert_allclose(
        np.asarray(mom_j).transpose(0, 3, 1, 2), mom_t, rtol=3e-4, atol=3e-4
    )

    z = rng.standard_normal((f, 4, 4, 4), dtype=np.float32)
    with torch.no_grad():
        dec_t = tm.decode(torch.from_numpy(z), f).numpy()
    # our decode divides by scaling_factor; pre-multiply so inputs align
    dec_j = ours.apply(
        ported, jnp.asarray(z.transpose(0, 2, 3, 1)) * ours.scaling_factor, f,
        method="decode",
    )
    np.testing.assert_allclose(
        np.asarray(dec_j).transpose(0, 3, 1, 2), dec_t, rtol=3e-4, atol=3e-4
    )


# ---------------------------------------------------------------------------
# CogVideoX 3D causal VAE: torch re-implementation (diffusers
# AutoencoderKLCogVideoX structure + key names, reference
# ``cogvideox/module.py:39``) vs ours through port_cogvideox_vae — incl. the
# MOVQ-style zq-conditioned decoder norms (CogVideoXSpatialNorm3D).
# ---------------------------------------------------------------------------


class _TCausalConv3d(torch.nn.Module):
    def __init__(self, in_ch, out_ch, k=3):
        super().__init__()
        kt, kh, kw = (k, k, k) if isinstance(k, int) else k
        self.kt = kt
        self.conv = torch.nn.Conv3d(
            in_ch, out_ch, (kt, kh, kw), padding=(0, (kh - 1) // 2, (kw - 1) // 2)
        )

    def forward(self, x):
        if self.kt > 1:
            first = x[:, :, :1].expand(-1, -1, self.kt - 1, -1, -1)
            x = torch.cat([first, x], dim=2)
        return self.conv(x)


class _TSpatialNorm3D(torch.nn.Module):
    def __init__(self, f_ch, zq_ch):
        super().__init__()
        self.norm_layer = torch.nn.GroupNorm(32, f_ch, eps=1e-6)
        self.conv_y = _TCausalConv3d(zq_ch, f_ch, 1)
        self.conv_b = _TCausalConv3d(zq_ch, f_ch, 1)

    def forward(self, f, zq):
        F = torch.nn.functional
        if f.shape[2] > 1 and f.shape[2] % 2 == 1:
            zf = F.interpolate(zq[:, :, :1], size=(1,) + tuple(f.shape[-2:]))
            zr = F.interpolate(zq[:, :, 1:], size=(f.shape[2] - 1,) + tuple(f.shape[-2:]))
            zq = torch.cat([zf, zr], dim=2)
        else:
            zq = F.interpolate(zq, size=f.shape[-3:])
        return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)


class _TCogRes3D(torch.nn.Module):
    def __init__(self, in_ch, out_ch, zq_ch=None):
        super().__init__()
        nn = torch.nn
        if zq_ch is not None:
            self.norm1 = _TSpatialNorm3D(in_ch, zq_ch)
            self.norm2 = _TSpatialNorm3D(out_ch, zq_ch)
        else:
            self.norm1 = nn.GroupNorm(32, in_ch, eps=1e-6)
            self.norm2 = nn.GroupNorm(32, out_ch, eps=1e-6)
        self.zq = zq_ch is not None
        self.conv1 = _TCausalConv3d(in_ch, out_ch)
        self.conv2 = _TCausalConv3d(out_ch, out_ch)
        self.conv_shortcut = _TCausalConv3d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x, zq=None):
        silu = torch.nn.functional.silu
        h = self.norm1(x, zq) if self.zq else self.norm1(x)
        h = self.conv1(silu(h))
        h = self.norm2(h, zq) if self.zq else self.norm2(h)
        h = self.conv2(silu(h))
        return h + (self.conv_shortcut(x) if self.conv_shortcut is not None else x)


def _t_compress_time(x):
    """CogVideoXDownsample3D temporal pool: first frame kept, rest mean-2."""
    if x.shape[2] % 2 == 1:
        first, rest = x[:, :, :1], x[:, :, 1:]
        if rest.shape[2] > 0:
            b, c, t, h, w = rest.shape
            rest = rest.reshape(b, c, t // 2, 2, h, w).mean(dim=3)
        return torch.cat([first, rest], dim=2)
    b, c, t, h, w = x.shape
    return x.reshape(b, c, t // 2, 2, h, w).mean(dim=3)


def _t_expand_time(x):
    F = torch.nn.functional
    if x.shape[2] > 1 and x.shape[2] % 2 == 1:
        first, rest = x[:, :, :1], x[:, :, 1:]
        rest = F.interpolate(rest, scale_factor=2.0)
        first = F.interpolate(first[:, :, 0], scale_factor=2.0)[:, :, None]
        return torch.cat([first, rest], dim=2)
    if x.shape[2] > 1:
        return F.interpolate(x, scale_factor=2.0)
    return F.interpolate(x[:, :, 0], scale_factor=2.0)[:, :, None]


class _TCogVAE(torch.nn.Module):
    def __init__(self, chans=(32, 32, 64, 64), latent=4, enc_blocks=3, dec_blocks=4,
                 t_compress=2):
        super().__init__()
        nn = torch.nn
        enc = nn.Module()
        enc.conv_in = _TCausalConv3d(3, chans[0])
        enc.down_blocks = nn.ModuleList()
        self._enc_compress = []
        prev = chans[0]
        for i, c in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for j in range(enc_blocks):
                blk.resnets.append(_TCogRes3D(prev if j == 0 else c, c))
                prev = c
            if i < len(chans) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)
                blk.downsamplers = nn.ModuleList([ds])
                self._enc_compress.append(i < t_compress)
            enc.down_blocks.append(blk)
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [_TCogRes3D(chans[-1], chans[-1]), _TCogRes3D(chans[-1], chans[-1])]
        )
        enc.norm_out = nn.GroupNorm(32, chans[-1], eps=1e-6)
        enc.conv_out = _TCausalConv3d(chans[-1], 2 * latent)
        self.encoder = enc

        dec = nn.Module()
        dec.conv_in = _TCausalConv3d(latent, chans[-1])
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList(
            [_TCogRes3D(chans[-1], chans[-1], latent), _TCogRes3D(chans[-1], chans[-1], latent)]
        )
        dec.up_blocks = nn.ModuleList()
        rev = list(reversed(chans))
        self._dec_expand = []
        prev = chans[-1]
        for i, c in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for j in range(dec_blocks):
                blk.resnets.append(_TCogRes3D(prev if j == 0 else c, c, latent))
                prev = c
            if i < len(rev) - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(c, c, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
                self._dec_expand.append(i >= len(rev) - 1 - t_compress)
            dec.up_blocks.append(blk)
        dec.norm_out = _TSpatialNorm3D(chans[0], latent)
        dec.conv_out = _TCausalConv3d(chans[0], 3)
        self.decoder = dec

    def encode_moments(self, x):
        F = torch.nn.functional
        e = self.encoder
        h = e.conv_in(x)
        for i, blk in enumerate(e.down_blocks):
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                if self._enc_compress[i]:
                    h = _t_compress_time(h)
                b, c, t, hh, ww = h.shape
                h2 = F.pad(h.permute(0, 2, 1, 3, 4).reshape(b * t, c, hh, ww), (0, 1, 0, 1))
                h2 = blk.downsamplers[0].conv(h2)
                h = h2.reshape(b, t, *h2.shape[1:]).permute(0, 2, 1, 3, 4)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.resnets[1](h)
        return e.conv_out(F.silu(e.norm_out(h)))

    def decode(self, z):
        F = torch.nn.functional
        d = self.decoder
        zq = z
        h = d.conv_in(z)
        h = d.mid_block.resnets[0](h, zq)
        h = d.mid_block.resnets[1](h, zq)
        for i, blk in enumerate(d.up_blocks):
            for res in blk.resnets:
                h = res(h, zq)
            if hasattr(blk, "upsamplers"):
                # diffusers CogVideoXUpsample3D: compress_time branch is ONE
                # 5-D interpolate doubling (t, h, w) together (first-frame
                # split); the plain branch doubles (h, w) per frame
                if self._dec_expand[i]:
                    h = _t_expand_time(h)
                else:
                    b, c, t, hh, ww = h.shape
                    h = F.interpolate(
                        h.permute(0, 2, 1, 3, 4).reshape(b * t, c, hh, ww),
                        scale_factor=2.0,
                    ).reshape(b, t, c, hh * 2, ww * 2).permute(0, 2, 1, 3, 4)
                b, c, t, hh, ww = h.shape
                h2 = blk.upsamplers[0].conv(h.permute(0, 2, 1, 3, 4).reshape(b * t, c, hh, ww))
                h = h2.reshape(b, t, *h2.shape[1:]).permute(0, 2, 1, 3, 4)
        h = d.norm_out(h, zq)
        return d.conv_out(F.silu(h))


@pytest.mark.slow
def test_cogvideox_vae_activation_parity():
    """Reduced-width AutoencoderKLCogVideoX: torch vs ours via
    port_cogvideox_vae — causal-conv encoder moments and the zq-conditioned
    (spatial-norm) temporal decoder both match."""
    import jax.numpy as jnp

    from motionrag_tpu.models.cogvideox.vae3d import CogVideoXVAE
    from motionrag_tpu.utils.porting_diffusion import port_cogvideox_vae

    chans, latent = (32, 32, 64, 64), 4
    tm = _TCogVAE(chans=chans, latent=latent)
    _randomize(tm, seed=9, scale=0.06)
    ported = port_cogvideox_vae(_sd_numpy(tm), strict=True)

    ours = CogVideoXVAE(
        latent_channels=latent, block_out_channels=chans, dtype=jnp.float32
    )

    rng = np.random.default_rng(3)
    video = rng.standard_normal((1, 5, 3, 16, 16), dtype=np.float32)  # 1+4n frames
    with torch.no_grad():
        mom_t = tm.encode_moments(torch.from_numpy(video.transpose(0, 2, 1, 3, 4)))
    mean_t = mom_t.numpy().transpose(0, 2, 3, 4, 1)[..., :latent]
    enc_j = ours.apply(ported, jnp.asarray(video.transpose(0, 1, 3, 4, 2)), method="encode")
    np.testing.assert_allclose(
        np.asarray(enc_j), mean_t * ours.scaling_factor, rtol=3e-4, atol=3e-4
    )

    z = rng.standard_normal((1, 3, 2, 2, latent), dtype=np.float32)  # 1+2n lat frames
    with torch.no_grad():
        dec_t = tm.decode(torch.from_numpy(z.transpose(0, 4, 1, 2, 3))).numpy()
    dec_j = ours.apply(ported, jnp.asarray(z) * ours.scaling_factor, method="decode")
    np.testing.assert_allclose(
        np.asarray(dec_j).transpose(0, 4, 1, 2, 3), dec_t, rtol=3e-4, atol=3e-4
    )


# ---------------------------------------------------------------------------
# CogVideoX DDIM trajectory: torch mirror of diffusers CogVideoXDDIMScheduler
# (scaled-linear betas, SNR shift 3.0, zero-terminal-SNR with the 2^-24
# floor, trailing spacing, prev = t - T//steps, v-pred, eta=0) vs our
# ddim_sample_loop — identical closed-form denoiser both sides.
# ---------------------------------------------------------------------------


def _t_cog_alphas(T=1000, b0=0.00085, b1=0.012, snr_shift=3.0):
    betas = torch.linspace(b0 ** 0.5, b1 ** 0.5, T, dtype=torch.float64) ** 2
    acp = torch.cumprod(1.0 - betas, dim=0)
    acp = acp / (snr_shift + (1.0 - snr_shift) * acp)
    a = acp.sqrt()
    a = (a - a[-1]) * (a[0] / (a[0] - a[-1]))
    acp = a ** 2
    acp[-1] = 2.0 ** -24
    return acp.float()


@pytest.mark.parametrize("steps", [5, 6])  # 1000/6 non-integer: rounding path
def test_cogvideox_ddim_trajectory_parity(steps):
    import jax.numpy as jnp

    from motionrag_tpu.models.cogvideox.scheduler import (
        CogVideoXSchedule, ddim_sample_loop,
    )

    T, g = 1000, 3.0
    acp = _t_cog_alphas(T)
    ts = torch.from_numpy(
        (np.round(np.arange(T, 0, -T / steps)).astype(np.int64) - 1)[:steps]
    )

    rng = np.random.default_rng(4)
    x0_np = rng.standard_normal((1, 2, 4, 4, 3), dtype=np.float32)
    w = rng.standard_normal((3,), dtype=np.float32) * 0.2

    def v_fn_t(x, t):  # closed-form "denoiser": v as a function of x and t
        tt = t.float() / T
        vc = 0.4 * torch.tanh(x) + tt.reshape(-1, 1, 1, 1, 1) * 0.1 * x + float(w[0])
        vu = 0.3 * torch.tanh(x) + float(w[1])
        return vu, vc

    x = torch.from_numpy(x0_np.copy())
    for i in range(steps):
        t = ts[i]
        a_t = acp[t]
        prev_t = t - T // steps
        a_prev = acp[prev_t] if prev_t >= 0 else torch.tensor(1.0)
        vu, vc = v_fn_t(x, t)
        v = vu + g * (vc - vu)
        x0 = a_t.sqrt() * x - (1 - a_t).sqrt() * v
        eps = a_t.sqrt() * v + (1 - a_t).sqrt() * x
        x = a_prev.sqrt() * x0 + (1 - a_prev).sqrt() * eps
    out_t = x.numpy()

    sched = CogVideoXSchedule()
    np.testing.assert_allclose(  # schedule tables themselves agree
        np.asarray(sched.alphas_cumprod), acp.numpy(), rtol=1e-6, atol=1e-9
    )

    def v_fn_j(x, t):
        tt = jnp.float32(t) / T
        vc = 0.4 * jnp.tanh(x) + tt * 0.1 * x + float(w[0])
        vu = 0.3 * jnp.tanh(x) + float(w[1])
        return vu, vc

    out_j = ddim_sample_loop(
        sched, v_fn_j, jnp.asarray(x0_np), num_inference_steps=steps,
        guidance_scale=g,
    )
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# SVD Euler trajectory: torch mirror of diffusers EulerDiscreteScheduler as
# configured by released SVD (karras sigmas 0.002..700 rho 7, continuous
# c_noise = 0.25*log(sigma), v_prediction denoised, leading-spacing
# init_noise_sigma sqrt(sigma0^2+1)) vs our euler_sample_loop.
# ---------------------------------------------------------------------------


def test_svd_euler_trajectory_parity():
    import jax.numpy as jnp

    from motionrag_tpu.models.svd.sampler import euler_sample_loop, karras_sigmas

    steps, f = 6, 4
    sig = karras_sigmas(steps)  # ours; torch side recomputes independently
    ramp = torch.linspace(0, 1, steps, dtype=torch.float64)
    t_sig = (700.0 ** (1 / 7) + ramp * (0.002 ** (1 / 7) - 700.0 ** (1 / 7))) ** 7
    np.testing.assert_allclose(sig[:-1], t_sig.float().numpy(), rtol=1e-5)

    rng = np.random.default_rng(5)
    noise = rng.standard_normal((1, f, 4, 4, 3), dtype=np.float32)
    w = rng.standard_normal((2,), dtype=np.float32) * 0.3
    gs = np.linspace(1.0, 3.0, f, dtype=np.float32)  # SVD per-frame CFG ramp

    def f_t(x_scaled, c_noise):  # closed-form UNet stand-in (torch)
        fc = 0.5 * torch.tanh(x_scaled) + 0.05 * c_noise * x_scaled + float(w[0])
        fu = 0.4 * torch.tanh(x_scaled) + float(w[1])
        return fu, fc

    x = torch.from_numpy(noise.copy()) * float(np.sqrt(sig[0] ** 2 + 1.0))
    g = torch.from_numpy(gs).reshape(1, f, 1, 1, 1)
    for i in range(steps):
        sigma = float(t_sig[i])
        scaled = x / np.sqrt(sigma ** 2 + 1.0)
        c_noise = 0.25 * np.log(sigma)
        fu, fc = f_t(scaled, c_noise)
        den_u = fu * (-sigma / np.sqrt(sigma ** 2 + 1.0)) + x / (sigma ** 2 + 1.0)
        den_c = fc * (-sigma / np.sqrt(sigma ** 2 + 1.0)) + x / (sigma ** 2 + 1.0)
        denoised = den_u + g * (den_c - den_u)
        d = (x - denoised) / sigma
        sigma_next = float(t_sig[i + 1]) if i + 1 < steps else 0.0
        x = x + d * (sigma_next - sigma)
    out_t = x.numpy()

    def f_j(x_scaled, c_noise, sigma):
        fc = 0.5 * jnp.tanh(x_scaled) + 0.05 * c_noise * x_scaled + float(w[0])
        fu = 0.4 * jnp.tanh(x_scaled) + float(w[1])
        return fu, fc

    lat = jnp.asarray(noise) * jnp.sqrt(sig[0] ** 2 + 1.0)
    out_j = euler_sample_loop(f_j, lat, sig, guidance_scale=jnp.asarray(gs))
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# CAMA core (ActionTransformer, "the heart of MotionRAG"): the REFERENCE's
# own source (/root/reference/src/projects/condition/module.py) runs on CPU
# torch with stub pixel encoders; weights port through utils/porting.py and
# the full batch_forward loss + CFG predict must match our models/cama.py.
# ---------------------------------------------------------------------------


def _import_reference_condition():
    """Import src.projects.condition.module with lightning/diffusers stubs
    (neither is installed; only torch-level math is exercised)."""
    import importlib.machinery

    if "/root/reference" not in sys.path:
        # APPEND (see _import_lvdm): /root/reference/main.py must not shadow
        # the repo's main module for the CLI tests that import it later
        sys.path.append("/root/reference")
    if "lightning" not in sys.modules:
        pl_mod = types.ModuleType("lightning.pytorch")
        pl_mod.LightningModule = torch.nn.Module
        root = types.ModuleType("lightning")
        root.pytorch = pl_mod
        for name, mod in (("lightning", root), ("lightning.pytorch", pl_mod)):
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod

    class _PLModule(torch.nn.Module):
        @property
        def device(self):
            return torch.device("cpu")

        def all_gather(self, x, sync_grads=False):
            # single-process Lightning all_gather: adds a world dim of 1
            return x[None]

    # base_module calls LightningModule APIs (self.device) the bare
    # nn.Module stub lacks; upgrade before src.* imports bind the class
    sys.modules["lightning.pytorch"].LightningModule = _PLModule
    # lightning.pytorch.utilities.types.STEP_OUTPUT
    ut = types.ModuleType("lightning.pytorch.utilities")
    ty = types.ModuleType("lightning.pytorch.utilities.types")
    ty.STEP_OUTPUT = object
    for name, mod in (("lightning.pytorch.utilities", ut),
                      ("lightning.pytorch.utilities.types", ty)):
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules.setdefault(name, mod)
    sys.modules["lightning.pytorch"].utilities = ut
    ut.types = ty
    if "diffusers" not in sys.modules:
        dif = types.ModuleType("diffusers")
        models = types.ModuleType("diffusers.models")
        lora = types.ModuleType("diffusers.models.lora")
        for cls in ("LoRALinearLayer", "LoRAConv2dLayer",
                    "LoRACompatibleConv", "LoRACompatibleLinear"):
            setattr(lora, cls, type(cls, (torch.nn.Module,), {}))
        dif.models = models
        models.lora = lora
        for name, mod in (("diffusers", dif), ("diffusers.models", models),
                          ("diffusers.models.lora", lora)):
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    # encoders/condition.py (pulled in by the package __init__) imports
    # kornia / open_clip / torchvision, none installed — stub the symbols it
    # touches at import time (the test only uses Resampler + the module core)
    for name in ("kornia", "open_clip"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.InterpolationMode = type("InterpolationMode", (), {"BICUBIC": 3, "BILINEAR": 2})
        tv2 = types.ModuleType("torchvision.transforms.v2")
        for cls in ("Compose", "Resize", "CenterCrop", "Normalize"):
            setattr(tv2, cls, type(cls, (), {"__init__": lambda self, *a, **k: None}))
        tv.transforms = tvt
        tvt.v2 = tv2
        for name, mod in (("torchvision", tv), ("torchvision.transforms", tvt),
                          ("torchvision.transforms.v2", tv2)):
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    import src.projects.condition.module as ref_module
    import src.projects.condition.encoders.resampler as ref_resampler

    return ref_module, ref_resampler


class _TVideoStub(torch.nn.Module):
    """[(bk), t, c, h, w] -> [(bk), t, ed]: per-frame flatten + Linear."""

    def __init__(self, in_dim, ed):
        super().__init__()
        self.proj = torch.nn.Linear(in_dim, ed)

    def forward(self, v):
        bk, t = v.shape[:2]
        return self.proj(v.reshape(bk, t, -1))


class _TImageStub(torch.nn.Module):
    """[(bk), c, h, w] -> [(bk), h, ed]: rows as tokens + Linear."""

    def __init__(self, in_dim, ed):
        super().__init__()
        self.proj = torch.nn.Linear(in_dim, ed)

    def forward(self, im):
        bk, c, h, w = im.shape
        return self.proj(im.permute(0, 2, 1, 3).reshape(bk, h, c * w))


@pytest.mark.slow
def test_cama_action_transformer_reference_parity():
    import flax.linen as fnn
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.cama import (
        ActionTransformer, SinusoidPositionalEmbeddings,
    )
    from motionrag_tpu.models.layers import TransformerEncoder
    from motionrag_tpu.models.resampler import Resampler
    from motionrag_tpu.utils.porting import (
        port_resampler, port_torch_transformer_encoder,
    )
    from motionrag_tpu.utils.porting_diffusion import _t

    ref_module, ref_resampler = _import_reference_condition()

    d, heads, ff, depth = 32, 4, 64, 2
    nq, ved, ced = 3, 24, 48
    b, k, t, hh = 2, 2, 2, 8

    tr = torch.nn.TransformerEncoder(
        torch.nn.TransformerEncoderLayer(
            d, heads, ff, dropout=0.0, activation="gelu", batch_first=True
        ),
        depth,
    )
    tm = ref_module.ActionTransformer(
        vision_model=_TVideoStub(3 * hh * hh, ved),
        vision_proj=ref_resampler.Resampler(
            dim=d, depth=1, dim_head=8, heads=4, num_queries=nq,
            embedding_dim=ved, output_dim=d,
        ),
        condition_model=_TImageStub(3 * hh, ced),
        condition_proj=ref_resampler.Resampler(
            dim=d, depth=1, dim_head=8, heads=4, num_queries=nq,
            embedding_dim=ced, output_dim=d,
        ),
        transformer=tr,
        vision_pe=None,
        condition_pe=None,
    )
    _randomize(tm, seed=11, scale=0.1)
    tm.eval()
    sd = _sd_numpy(tm)

    rng = np.random.default_rng(6)
    ref_videos = rng.standard_normal((b, k, t, 3, hh, hh), dtype=np.float32)
    video = rng.standard_normal((b, t, 3, hh, hh), dtype=np.float32)
    batch_t = {"ref_videos": torch.from_numpy(ref_videos),
               "video": torch.from_numpy(video)}

    with torch.no_grad():
        loss_t = tm.batch_forward(batch_t, return_loss=True)
        pred_t = tm.predict(batch_t, do_classifier_free_guidance=True).numpy()

    # ---- ours, weights ported from the reference state_dict --------------
    class JVideoStub(fnn.Module):
        ed: int

        @fnn.compact
        def __call__(self, v):
            bk, tt = v.shape[:2]
            return fnn.Dense(self.ed, name="proj")(v.reshape(bk, tt, -1))

    class JImageStub(fnn.Module):
        ed: int

        @fnn.compact
        def __call__(self, im):
            bk, c, ih, iw = im.shape
            tok = im.transpose(0, 2, 1, 3).reshape(bk, ih, c * iw)
            return fnn.Dense(self.ed, name="proj")(tok)

    ours = ActionTransformer(
        vision_model=JVideoStub(ved),
        vision_proj=Resampler(dim=d, depth=1, dim_head=8, heads=4,
                              num_queries=nq, embedding_dim=ved, output_dim=d),
        condition_model=JImageStub(ced),
        condition_proj=Resampler(dim=d, depth=1, dim_head=8, heads=4,
                                 num_queries=nq, embedding_dim=ced, output_dim=d),
        transformer=TransformerEncoder(num_layers=depth, d_model=d, nhead=heads,
                                       dim_feedforward=ff, activation="gelu"),
        vision_pe=None,
        condition_pe=None,
    )

    def sub(prefix):
        return {kk[len(prefix):]: vv for kk, vv in sd.items() if kk.startswith(prefix)}

    params = {
        "sos_token": sd["sos_token"][0] if sd["sos_token"].shape[0] == 1 else sd["sos_token"],
        "vision_model": {"proj": {"kernel": _t(sd["vision_model.proj.weight"]),
                                  "bias": sd["vision_model.proj.bias"]}},
        "condition_model": {"proj": {"kernel": _t(sd["condition_model.proj.weight"]),
                                     "bias": sd["condition_model.proj.bias"]}},
        "vision_proj": port_resampler(sub("vision_proj."), depth=1)["params"],
        "condition_proj": port_resampler(sub("condition_proj."), depth=1)["params"],
        "transformer": port_torch_transformer_encoder(sub("transformer."), depth=depth)["params"],
    }
    # our sos_token param keeps the [1, nq, d] shape
    params["sos_token"] = sd["sos_token"]

    batch_j = {"ref_videos": jnp.asarray(ref_videos), "video": jnp.asarray(video)}
    loss_j = ours.apply({"params": params}, batch_j, True, False, method="batch_forward")
    np.testing.assert_allclose(float(loss_j.main), float(loss_t.main), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(loss_j.smooth), float(loss_t.smooth), rtol=2e-4, atol=1e-5)

    pred_j = ours.apply(
        {"params": params}, batch_j, True, method="predict"
    )
    np.testing.assert_allclose(np.asarray(pred_j), pred_t, rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_condition_transformer_reference_parity():
    """Reference ConditionTransformer (decoder variant: visions as tgt,
    conditions as memory) + its autoregressive rollout vs ours, weights
    ported via port_torch_transformer_decoder / port_resampler."""
    import flax.linen as fnn
    import jax.numpy as jnp

    from motionrag_tpu.models.cama import ConditionTransformer
    from motionrag_tpu.models.layers import TransformerDecoder
    from motionrag_tpu.models.resampler import Resampler
    from motionrag_tpu.utils.porting import (
        port_resampler, port_torch_transformer_decoder,
    )
    from motionrag_tpu.utils.porting_diffusion import _t

    ref_module, ref_resampler = _import_reference_condition()

    d, heads, ff, depth = 32, 4, 64, 2
    nq, ved, ced = 3, 24, 48
    b, t, hh = 2, 4, 8

    tr = torch.nn.TransformerDecoder(
        torch.nn.TransformerDecoderLayer(
            d, heads, ff, dropout=0.0, activation="gelu", batch_first=True
        ),
        depth,
    )
    tm = ref_module.ConditionTransformer(
        vision_model=_TImageStub(3 * hh, ved),   # per-frame image encoder
        vision_proj=ref_resampler.Resampler(
            dim=d, depth=1, dim_head=8, heads=4, num_queries=nq,
            embedding_dim=ved, output_dim=d,
        ),
        condition_model=_TImageStub(3 * hh, ced),
        condition_proj=ref_resampler.Resampler(
            dim=d, depth=1, dim_head=8, heads=4, num_queries=nq,
            embedding_dim=ced, output_dim=d,
        ),
        transformer=tr,
        vision_pe=None,
        condition_pe=None,
    )
    _randomize(tm, seed=13, scale=0.1)
    tm.eval()
    sd = _sd_numpy(tm)

    rng = np.random.default_rng(7)
    frames = rng.standard_normal((b, t, 3, hh, hh), dtype=np.float32)
    cond = rng.standard_normal((b, 3, hh, hh), dtype=np.float32)

    with torch.no_grad():
        loss_t = float(tm(torch.from_numpy(frames), torch.from_numpy(cond), True))
        roll_t = tm.autoregressive(
            torch.from_numpy(frames), torch.from_numpy(cond), return_loss=False
        ).numpy()

    class JImageStub(fnn.Module):
        ed: int

        @fnn.compact
        def __call__(self, im):
            bk, c, ih, iw = im.shape
            tok = im.transpose(0, 2, 1, 3).reshape(bk, ih, c * iw)
            return fnn.Dense(self.ed, name="proj")(tok)

    ours = ConditionTransformer(
        vision_model=JImageStub(ved),
        vision_proj=Resampler(dim=d, depth=1, dim_head=8, heads=4,
                              num_queries=nq, embedding_dim=ved, output_dim=d),
        condition_model=JImageStub(ced),
        condition_proj=Resampler(dim=d, depth=1, dim_head=8, heads=4,
                                 num_queries=nq, embedding_dim=ced, output_dim=d),
        transformer=TransformerDecoder(num_layers=depth, d_model=d, nhead=heads,
                                       dim_feedforward=ff, activation="gelu"),
        vision_pe=None,
        condition_pe=None,
    )

    def sub(prefix):
        return {kk[len(prefix):]: vv for kk, vv in sd.items() if kk.startswith(prefix)}

    params = {
        "vision_model": {"proj": {"kernel": _t(sd["vision_model.proj.weight"]),
                                  "bias": sd["vision_model.proj.bias"]}},
        "condition_model": {"proj": {"kernel": _t(sd["condition_model.proj.weight"]),
                                     "bias": sd["condition_model.proj.bias"]}},
        "vision_proj": port_resampler(sub("vision_proj."), depth=1)["params"],
        "condition_proj": port_resampler(sub("condition_proj."), depth=1)["params"],
        "transformer": port_torch_transformer_decoder(sub("transformer."), depth=depth)["params"],
    }

    loss_j = ours.apply({"params": params}, jnp.asarray(frames), jnp.asarray(cond), True)
    np.testing.assert_allclose(float(loss_j), loss_t, rtol=2e-4, atol=1e-5)

    roll_j = ours.apply(
        {"params": params}, jnp.asarray(frames), jnp.asarray(cond), False,
        method="autoregressive",
    )
    np.testing.assert_allclose(np.asarray(roll_j), roll_t, rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_ddim_dual_cfg_trajectory_parity():
    """Multi-cond (dual CFG) DDIM: vendored ddim_multiplecond.DDIMSampler vs
    our ddim_sample_dual_cfg — text + image guidance combined as
    e_uc + s_img*(e_img - e_uc) + s_txt*(e_full - e_img), with dynamic
    rescale and guidance rescale, identical closed-form denoiser."""
    import jax.numpy as jnp

    _import_lvdm()
    from DynamiCrafter.lvdm.models.samplers.ddim_multiplecond import DDIMSampler

    from motionrag_tpu.models.dynamicrafter.ddim import (
        LVDMSchedule, ddim_sample_dual_cfg,
    )

    b, c, t, h, w = 1, 3, 2, 4, 4
    rng = np.random.default_rng(8)
    x_T = rng.standard_normal((b, c, t, h, w), dtype=np.float32)
    cond_vec = rng.standard_normal((b, c, t, h, w), dtype=np.float32)
    img_vec = rng.standard_normal((b, c, t, h, w), dtype=np.float32)
    uncond_vec = rng.standard_normal((b, c, t, h, w), dtype=np.float32)

    def denoise_torch(x, tt, cond):
        cv = cond["c_crossattn"]
        tscaled = (tt.float() / 1000.0).reshape(-1, 1, 1, 1, 1)
        return 0.3 * torch.tanh(x) + 0.2 * cv + 0.05 * tscaled * x

    stub = _StubLVDM(denoise_torch)
    DDIMSampler.register_buffer = lambda self, name, attr: setattr(self, name, attr)
    sampler = DDIMSampler(stub)
    with torch.no_grad():
        samples_t, _ = sampler.sample(
            S=6, batch_size=b, shape=(c, t, h, w),
            conditioning={"c_crossattn": torch.from_numpy(cond_vec)},
            unconditional_conditioning={"c_crossattn": torch.from_numpy(uncond_vec)},
            unconditional_guidance_scale=7.5, cfg_img=1.2, guidance_rescale=0.7,
            x_T=torch.from_numpy(x_T), timestep_spacing="uniform_trailing",
            verbose=False, schedule_verbose=False,
            unconditional_conditioning_img_nonetext={
                "c_crossattn": torch.from_numpy(img_vec)
            },
        )
    samples_t = samples_t.numpy()

    schedule = LVDMSchedule(
        rescale_betas_zero_snr=True, use_dynamic_rescale=True, base_scale=0.3
    )

    def to_j(v):
        return jnp.asarray(v.transpose(0, 2, 3, 4, 1))

    def denoise_jax3(x, tt):
        tscaled = (tt.astype(jnp.float32) / 1000.0).reshape(-1, 1, 1, 1, 1)

        def f(cv):
            return 0.3 * jnp.tanh(x) + 0.2 * cv + 0.05 * tscaled * x

        return f(to_j(cond_vec)), f(to_j(img_vec)), f(to_j(uncond_vec))

    samples_j = ddim_sample_dual_cfg(
        schedule, denoise_jax3, to_j(x_T), num_steps=6,
        text_guidance_scale=7.5, image_guidance_scale=1.2, guidance_rescale=0.7,
        timestep_spacing="uniform_trailing",
    )
    samples_j = np.asarray(samples_j).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(samples_j, samples_t, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_action_clip_reference_parity():
    """Reference ActionCLIP symmetric contrastive loss (cls-token resampler,
    learnable logit scale, single-process all_gather) vs ours with ported
    weights and an externally supplied text embedding."""
    import flax.linen as fnn
    import jax.numpy as jnp

    from motionrag_tpu.models.cama import ActionCLIP
    from motionrag_tpu.models.resampler import Resampler
    from motionrag_tpu.utils.porting import port_resampler
    from motionrag_tpu.utils.porting_diffusion import _t

    ref_module, ref_resampler = _import_reference_condition()

    d, nq, ved = 32, 3, 24
    b, t, hh = 4, 2, 8
    rng = np.random.default_rng(9)
    text_emb = rng.standard_normal((b, d), dtype=np.float32)

    class _TTextStub(torch.nn.Module):
        def forward(self, text, return_cls_tokens=False):
            return torch.from_numpy(text_emb), None

    tm = ref_module.ActionCLIP(
        action_model=_TVideoStub(3 * hh * hh, ved),
        text_model=_TTextStub(),
        resampler=ref_resampler.Resampler(
            dim=d, depth=1, dim_head=8, heads=4, num_queries=nq,
            embedding_dim=ved, output_dim=d, with_cls_token=True,
        ),
    )
    # text_model.freeze() etc. live in configure_model_; not needed here
    _randomize(tm, seed=17, scale=0.1)
    tm.eval()
    sd = _sd_numpy(tm)

    video = rng.standard_normal((b, t, 3, hh, hh), dtype=np.float32)
    with torch.no_grad():
        loss_t = float(tm(torch.from_numpy(video), ["x"] * b))

    class JVideoStub2(fnn.Module):
        ed: int

        @fnn.compact
        def __call__(self, v):
            bk, tt = v.shape[:2]
            return fnn.Dense(self.ed, name="proj")(v.reshape(bk, tt, -1))

    ours = ActionCLIP(
        action_model=JVideoStub2(ved),
        text_model=None,
        resampler=Resampler(dim=d, depth=1, dim_head=8, heads=4, num_queries=nq,
                            embedding_dim=ved, output_dim=d, with_cls_token=True),
    )

    def sub(prefix):
        return {kk[len(prefix):]: vv for kk, vv in sd.items() if kk.startswith(prefix)}

    params = {
        "logit_scale": sd["logit_scale"],
        "action_model": {"proj": {"kernel": _t(sd["action_model.proj.weight"]),
                                  "bias": sd["action_model.proj.bias"]}},
        "resampler": port_resampler(sub("resampler."), depth=1)["params"],
    }
    loss_j = ours.apply({"params": params}, jnp.asarray(video), jnp.asarray(text_emb))
    np.testing.assert_allclose(float(loss_j), loss_t, rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_apadapter_attention_reference_parity():
    """Motion-Adapter attention (reference APAdapterAttnProcessor2_0,
    attn_processor.py:10-141): q_ip from POST-attention hidden states, kv
    from action tokens, (b r) CFG broadcast, scale-added before to_out —
    torch mirror of the processor math vs our CrossAttention adapter branch,
    same weights, including the r=2 broadcast path."""
    import jax.numpy as jnp

    from motionrag_tpu.models.diffusion_blocks import CrossAttention
    from motionrag_tpu.utils.porting_diffusion import _t

    d, heads, hd, ctx_d, na = 32, 4, 8, 48, 5
    b, s, sc = 4, 6, 3        # batch 4 vs action batch 2 -> r=2 broadcast
    scale = 0.7

    g = torch.Generator().manual_seed(21)

    def lin(i, o):
        return torch.randn(o, i, generator=g) * 0.1

    w = {
        "to_q": lin(d, heads * hd), "to_k": lin(ctx_d, heads * hd),
        "to_v": lin(ctx_d, heads * hd),
        "to_out_w": lin(heads * hd, d), "to_out_b": torch.randn(d, generator=g) * 0.1,
        "to_q_ip": lin(heads * hd, heads * hd), "to_k_ip": lin(d, heads * hd),
        "to_v_ip": lin(d, heads * hd),
    }

    rng = np.random.default_rng(10)
    x = rng.standard_normal((b, s, d), dtype=np.float32)
    enc = rng.standard_normal((b, sc, ctx_d), dtype=np.float32)
    action = rng.standard_normal((b // 2, na, d), dtype=np.float32)

    def hf(t_):  # heads-first
        return t_.view(t_.shape[0], -1, heads, hd).transpose(1, 2)

    with torch.no_grad():
        xt = torch.from_numpy(x)
        q = hf(xt @ w["to_q"].T)
        k = hf(torch.from_numpy(enc) @ w["to_k"].T)
        v = hf(torch.from_numpy(enc) @ w["to_v"].T)
        hidden = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        hidden = hidden.transpose(1, 2).reshape(b, s, heads * hd)

        ip_q = hf(hidden @ w["to_q_ip"].T)
        at = torch.from_numpy(action)
        ip_k = at @ w["to_k_ip"].T
        ip_v = at @ w["to_v_ip"].T
        ip_k = hf(ip_k.repeat_interleave(2, dim=0))  # (b r) broadcast
        ip_v = hf(ip_v.repeat_interleave(2, dim=0))
        ip_out = torch.nn.functional.scaled_dot_product_attention(ip_q, ip_k, ip_v)
        ip_out = ip_out.transpose(1, 2).reshape(b, s, heads * hd)

        out_t = ((hidden + scale * ip_out) @ w["to_out_w"].T + w["to_out_b"]).numpy()

    ours = CrossAttention(
        query_dim=d, context_dim=ctx_d, heads=heads, dim_head=hd,
        with_adapter=True, adapter_scale=scale,
    )
    params = {
        "to_q": {"kernel": _t(w["to_q"])}, "to_k": {"kernel": _t(w["to_k"])},
        "to_v": {"kernel": _t(w["to_v"])},
        "to_out": {"kernel": _t(w["to_out_w"]), "bias": np.asarray(w["to_out_b"])},
        "to_q_ip": {"kernel": _t(w["to_q_ip"])},
        "to_k_ip": {"kernel": _t(w["to_k_ip"])},
        "to_v_ip": {"kernel": _t(w["to_v_ip"])},
    }
    out_j = ours.apply(
        {"params": params}, jnp.asarray(x), context=jnp.asarray(enc),
        action_emb=jnp.asarray(action),
    )
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# OpenCLIP naming (inside released DynamiCrafter checkpoints:
# cond_stage_model.model.* text tower, embedder.model.visual.* vision tower)
# -> our CLIPTextEncoder / VisionTransformer(clip), via port_openclip_text /
# port_openclip_visual. The V2 image contract (ALL blocks, no ln_post) and
# the penultimate text contract are both asserted.
# ---------------------------------------------------------------------------


class _TOpenCLIPBlock(torch.nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        nn = torch.nn
        self.heads = heads
        self.ln_1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.ModuleDict(dict(c_fc=nn.Linear(d, 4 * d), c_proj=nn.Linear(4 * d, d)))

    def forward(self, x, mask=None):
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, attn_mask=mask, need_weights=False)
        x = x + a
        h = self.ln_2(x)
        return x + self.mlp.c_proj(torch.nn.functional.gelu(self.mlp.c_fc(h)))


class _TOpenCLIPText(torch.nn.Module):
    def __init__(self, vocab, d, depth, heads, max_len, proj_dim):
        super().__init__()
        nn = torch.nn
        self.token_embedding = nn.Embedding(vocab, d)
        self.positional_embedding = nn.Parameter(torch.randn(max_len, d) * 0.01)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [_TOpenCLIPBlock(d, heads) for _ in range(depth)]
        )
        self.ln_final = nn.LayerNorm(d)
        self.text_projection = nn.Parameter(torch.randn(d, proj_dim) * 0.02)

    def forward_penultimate(self, ids):
        s = ids.shape[1]
        x = self.token_embedding(ids) + self.positional_embedding[:s]
        mask = torch.full((s, s), float("-inf")).triu(1)
        for blk in self.transformer.resblocks[:-1]:  # stop 1 before the end
            x = blk(x, mask)
        return self.ln_final(x)


class _TOpenCLIPVisual(torch.nn.Module):
    def __init__(self, d, depth, heads, img, patch):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, d, patch, stride=patch, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(d) * 0.02)
        n = (img // patch) ** 2 + 1
        self.positional_embedding = nn.Parameter(torch.randn(n, d) * 0.02)
        self.ln_pre = nn.LayerNorm(d)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [_TOpenCLIPBlock(d, heads) for _ in range(depth)]
        )

    def forward_v2_tokens(self, img):
        x = self.conv1(img)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        for blk in self.transformer.resblocks:
            x = blk(x)
        return x  # all blocks, NO ln_post (FrozenOpenCLIPImageEmbedderV2)


@pytest.mark.slow
def test_openclip_text_porter_parity():
    import jax.numpy as jnp

    from motionrag_tpu.models.encoders.clip_text import CLIPTextEncoder
    from motionrag_tpu.utils.porting import port_openclip_text

    vocab, d, depth, heads, max_len = 96, 32, 3, 4, 16
    tm = _TOpenCLIPText(vocab, d, depth, heads, max_len, proj_dim=d)
    _randomize(tm, seed=23, scale=0.05)
    ported = port_openclip_text(_sd_numpy(tm), depth=depth)

    ids = np.array([[3, 7, 11, 2, 9, 1, 0, 5]], dtype=np.int64)
    with torch.no_grad():
        out_t = tm.forward_penultimate(torch.from_numpy(ids)).numpy()

    enc = CLIPTextEncoder(vocab_size=vocab, max_length=max_len, dim=d,
                          depth=depth, heads=heads, projection_dim=d)
    out_j = enc.apply(ported, jnp.asarray(ids), penultimate=True)
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_openclip_visual_porter_parity():
    import jax.numpy as jnp

    from motionrag_tpu.models.encoders.vit import VisionTransformer
    from motionrag_tpu.utils.porting import port_openclip_visual

    d, depth, heads, img, patch = 32, 3, 4, 16, 8
    tm = _TOpenCLIPVisual(d, depth, heads, img, patch)
    _randomize(tm, seed=29, scale=0.05)
    ported = port_openclip_visual(_sd_numpy(tm), depth=depth)

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 3, img, img), dtype=np.float32)
    with torch.no_grad():
        out_t = tm.forward_v2_tokens(torch.from_numpy(x)).numpy()

    enc = VisionTransformer(variant="clip", image_size=img, patch_size=patch,
                            dim=d, depth=depth, heads=heads, projection_dim=0)
    out_j = enc.apply(ported, jnp.asarray(x), raw_tokens=True)
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_skill_transformer_reference_parity():
    """Reference SkillTransformer (per-step prompts flattened (b t) before
    encode_condition, context-weighted loss) vs ours with ported weights."""
    import flax.linen as fnn
    import jax.numpy as jnp

    from motionrag_tpu.models.cama import SkillTransformer
    from motionrag_tpu.models.layers import TransformerDecoder
    from motionrag_tpu.models.resampler import Resampler
    from motionrag_tpu.utils.porting import (
        port_resampler, port_torch_transformer_decoder,
    )
    from motionrag_tpu.utils.porting_diffusion import _t

    ref_module, ref_resampler = _import_reference_condition()

    d, heads, ff, depth = 32, 4, 64, 1
    nq, ved, ced = 3, 24, 16
    b, steps, hh = 2, 3, 8

    rng = np.random.default_rng(12)
    # per-(b*t) prompt embeddings the text stub returns, in flatten order
    text_tok = rng.standard_normal((b * steps, 4, ced), dtype=np.float32)

    class _TTextListStub(torch.nn.Module):
        def forward(self, texts):
            assert len(texts) == b * steps
            return torch.from_numpy(text_tok)

    tr = torch.nn.TransformerDecoder(
        torch.nn.TransformerDecoderLayer(
            d, heads, ff, dropout=0.0, activation="gelu", batch_first=True
        ),
        depth,
    )
    tm = ref_module.SkillTransformer(
        vision_model=_TImageStub(3 * hh, ved),
        vision_proj=ref_resampler.Resampler(
            dim=d, depth=1, dim_head=8, heads=4, num_queries=nq,
            embedding_dim=ved, output_dim=d,
        ),
        condition_model=_TTextListStub(),
        condition_proj=ref_resampler.Resampler(
            dim=d, depth=1, dim_head=8, heads=4, num_queries=nq,
            embedding_dim=ced, output_dim=d,
        ),
        transformer=tr,
        context_weight=0.5,
        vision_pe=None,
        condition_pe=None,
    )
    _randomize(tm, seed=31, scale=0.1)
    tm.eval()
    sd = _sd_numpy(tm)

    frames = rng.standard_normal((b, steps, 3, hh, hh), dtype=np.float32)
    prompts = [[f"p{i}{j}" for j in range(steps)] for i in range(b)]
    with torch.no_grad():
        loss_t = float(tm(torch.from_numpy(frames), prompts, True))

    class JImageStub(fnn.Module):
        ed: int

        @fnn.compact
        def __call__(self, im):
            bk, c, ih, iw = im.shape
            tok = im.transpose(0, 2, 1, 3).reshape(bk, ih, c * iw)
            return fnn.Dense(self.ed, name="proj")(tok)

    class JTextIdentity(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            return x

    ours = SkillTransformer(
        vision_model=JImageStub(ved),
        vision_proj=Resampler(dim=d, depth=1, dim_head=8, heads=4,
                              num_queries=nq, embedding_dim=ved, output_dim=d),
        condition_model=JTextIdentity(),
        condition_proj=Resampler(dim=d, depth=1, dim_head=8, heads=4,
                                 num_queries=nq, embedding_dim=ced, output_dim=d),
        transformer=TransformerDecoder(num_layers=depth, d_model=d, nhead=heads,
                                       dim_feedforward=ff, activation="gelu"),
        context_weight=0.5,
        vision_pe=None,
        condition_pe=None,
    )

    def sub(prefix):
        return {kk[len(prefix):]: vv for kk, vv in sd.items() if kk.startswith(prefix)}

    params = {
        "vision_model": {"proj": {"kernel": _t(sd["vision_model.proj.weight"]),
                                  "bias": sd["vision_model.proj.bias"]}},
        "vision_proj": port_resampler(sub("vision_proj."), depth=1)["params"],
        "condition_proj": port_resampler(sub("condition_proj."), depth=1)["params"],
        "transformer": port_torch_transformer_decoder(sub("transformer."), depth=depth)["params"],
    }
    # ours takes the pre-encoded per-step text embedding [b, steps, l, ced]
    cond_j = jnp.asarray(text_tok.reshape(b, steps, 4, ced))
    loss_j = ours.apply({"params": params}, jnp.asarray(frames), cond_j, True)
    np.testing.assert_allclose(float(loss_j), loss_t, rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_port_dynamicrafter_checkpoint_assembles_module_tree():
    """One-call released-checkpoint conversion: a composite tiny lvdm
    state_dict (vendored UNetModel + AutoencoderKL, open_clip text/visual
    towers, image_proj resampler, Motion-Adapter resampler) routes through
    port_dynamicrafter_checkpoint and every produced leaf slots into a
    geometry-matched DynamiCrafterModule init tree with the right shape."""
    import jax
    import jax.numpy as jnp

    _import_lvdm()
    from DynamiCrafter.lvdm.models.autoencoder import AutoencoderKL
    from DynamiCrafter.lvdm.modules.networks.openaimodel3d import UNetModel

    from motionrag_tpu.models.dynamicrafter.module import DynamiCrafterModule
    from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D
    from motionrag_tpu.models.dynamicrafter.vae import AutoencoderKL2D
    from motionrag_tpu.models.encoders.clip_text import CLIPTextEncoder
    from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder
    from motionrag_tpu.models.resampler import Resampler
    from motionrag_tpu.utils.porting_diffusion import port_dynamicrafter_checkpoint

    ref_module, ref_resampler = _import_reference_condition()

    ctx, f, hw = 32, 4, 32
    t_unet = UNetModel(
        in_channels=8, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], channel_mult=[1, 2], context_dim=ctx,
        num_head_channels=16, transformer_depth=1, use_linear=True,
        temporal_conv=True, temporal_attention=True, use_relative_position=False,
        use_causal_attention=False, temporal_length=f, addition_attention=True,
        image_cross_attention=True, fs_condition=True, dropout=0.0,
    )
    t_vae = AutoencoderKL(
        dict(double_z=True, z_channels=4, resolution=hw, in_channels=3, out_ch=3,
             ch=32, ch_mult=[1, 1, 1, 1], num_res_blocks=2, attn_resolutions=[],
             dropout=0.0),
        {"target": "torch.nn.Identity"}, embed_dim=4,
    )
    t_text = _TOpenCLIPText(96, ctx, 3, 4, 16, proj_dim=ctx)
    t_vis = _TOpenCLIPVisual(ctx, 2, 4, hw, 8)
    t_proj = ref_resampler.Resampler(dim=ctx, depth=1, dim_head=8, heads=4,
                                     num_queries=3, embedding_dim=ctx,
                                     output_dim=ctx, video_length=f)
    t_aproj = ref_resampler.Resampler(dim=ctx, depth=1, dim_head=8, heads=4,
                                      num_queries=4, embedding_dim=ctx,
                                      output_dim=ctx)
    for m, seed in ((t_unet, 1), (t_vae, 2), (t_text, 3), (t_vis, 4),
                    (t_proj, 5), (t_aproj, 6)):
        _randomize(m, seed=seed, scale=0.05)

    sd = {}
    for prefix, m in (
        ("model.diffusion_model.", t_unet), ("first_stage_model.", t_vae),
        ("cond_stage_model.model.", t_text), ("embedder.model.visual.", t_vis),
        ("image_proj_model.", t_proj), ("resampler.", t_aproj),
    ):
        for k, v in m.state_dict().items():
            sd[prefix + k] = v.numpy()
    # schedule buffers a real lvdm checkpoint also carries (must be ignored)
    sd["betas"] = np.zeros(1000, np.float32)
    sd["scale_arr"] = np.ones(1000, np.float32)

    ported = port_dynamicrafter_checkpoint(
        sd,
        unet_kwargs=dict(channel_mult=(1, 2), num_res_blocks=1,
                         attention_levels=(0, 1), temporal_attention=True),
        vae_kwargs=dict(n_levels=4, enc_blocks=2, dec_blocks=3),
    )
    assert set(ported) == {"unet", "vae", "text_encoder", "image_encoder",
                           "image_proj", "action_proj"}

    module = DynamiCrafterModule(
        unet=UNet3D(in_channels=8, out_channels=4, model_channels=32,
                    num_res_blocks=1, attention_resolutions=(1, 2),
                    channel_mult=(1, 2), num_head_channels=16,
                    transformer_depth=1, context_dim=ctx, temporal_conv=True,
                    temporal_attention=True, addition_attention=True,
                    image_cross_attention=True, fs_condition=True,
                    dtype=jnp.float32),
        vae=AutoencoderKL2D(latent_channels=4,
                            block_out_channels=(32, 32, 32, 32),
                            dtype=jnp.float32),
        text_encoder=CLIPTextEncoder(vocab_size=96, max_length=16, dim=ctx,
                                     depth=3, heads=4, projection_dim=ctx),
        image_encoder=CLIPImageEmbedder(image_size=hw, patch_size=8, dim=ctx,
                                        depth=2, heads=4, projection_dim=0,
                                        pooled=False, final_tokens=True,
                                        dtype=jnp.float32),
        image_proj=Resampler(dim=ctx, depth=1, dim_head=8, heads=4,
                             num_queries=3, embedding_dim=ctx, output_dim=ctx,
                             video_length=f),
        dtype=jnp.float32,
    )
    batch = {
        "video": jnp.zeros((1, f, 3, hw, hw), jnp.float32),
        "prompt_ids": jnp.zeros((1, 16), jnp.int32),
    }
    ref_tree = module.init_params(jax.random.key(0), batch)

    flat_ref = {
        tuple(str(k) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(ref_tree)[0]
    }
    checked = 0
    for comp in ("unet", "vae", "text_encoder", "image_encoder", "image_proj"):
        for path, leaf in jax.tree_util.tree_flatten_with_path(ported[comp])[0]:
            key = (f"['{comp}']",) + tuple(str(k) for k in path)
            assert key in flat_ref, f"ported {key} not in module tree"
            assert flat_ref[key] == np.shape(leaf), f"shape mismatch at {key}"
            checked += 1
    assert checked > 200  # whole-model coverage, not a few leaves


@pytest.mark.parametrize("steps", [5, 6])
def test_cogvideox_dpm_sde_trajectory_parity(steps):
    """SDE-DPM-Solver++(2M) (the reference protocol sampler — its CogVideoX
    config sets scheduler: 'dpm', i.e. diffusers CogVideoXDPMScheduler):
    torch mirror of the stochastic multistep update vs our dpm_sample_loop,
    fed the identical per-step noise sequence."""
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.cogvideox.scheduler import (
        CogVideoXSchedule, dpm_sample_loop,
    )

    T, g = 1000, 3.0
    acp = _t_cog_alphas(T).double()
    ts = (np.round(np.arange(T, 0, -T / steps)).astype(np.int64) - 1)[:steps]

    rng = np.random.default_rng(13)
    x0_np = rng.standard_normal((1, 2, 4, 4, 3), dtype=np.float32)
    w = rng.standard_normal((2,), dtype=np.float32) * 0.2

    key = jax.random.key(42)
    shape = x0_np.shape
    noises = [np.asarray(jax.random.normal(jax.random.fold_in(key, i), shape,
                                           jnp.float32)) for i in range(steps)]

    def v_t(x, t):
        tt = float(t) / T
        vc = 0.4 * torch.tanh(x) + tt * 0.1 * x + float(w[0])
        vu = 0.3 * torch.tanh(x) + float(w[1])
        return vu, vc

    def lam(a):
        return 0.5 * (np.log(a) - np.log1p(-a))

    x = torch.from_numpy(x0_np.copy()).double()
    old_x0 = None
    for i in range(steps):
        t = int(ts[i])
        a_t = float(acp[t])
        t_prev = t - T // steps
        vu, vc = v_t(x, t)
        v = vu + g * (vc - vu)
        x0 = np.sqrt(a_t) * x - np.sqrt(1 - a_t) * v
        if t_prev < 0:
            x = x0  # a_prev = 1 limit
            old_x0 = x0
            continue
        a_prev = float(acp[t_prev])
        h = lam(a_prev) - lam(a_t)
        m1 = np.sqrt((1 - a_prev) / (1 - a_t)) * np.exp(-h)
        m2 = np.expm1(-2 * h) * np.sqrt(a_prev)
        if old_x0 is None:
            d = x0
        else:
            a_back = float(acp[int(ts[i - 1])])
            r = (lam(a_t) - lam(a_back)) / h
            d = (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * old_x0
        nm = np.sqrt(1 - a_prev) * np.sqrt(-np.expm1(-2 * h))
        x = m1 * x - m2 * d + nm * torch.from_numpy(noises[i]).double()
        old_x0 = x0
    out_t = x.float().numpy()

    sched = CogVideoXSchedule()

    def v_j(x, t):
        tt = jnp.float32(t) / T
        vc = 0.4 * jnp.tanh(x) + tt * 0.1 * x + float(w[0])
        vu = 0.3 * jnp.tanh(x) + float(w[1])
        return vu, vc

    out_j = dpm_sample_loop(
        sched, v_j, jnp.asarray(x0_np), num_inference_steps=steps,
        guidance_scale=g, rng=key,
    )
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_port_checkpoint_cli_motion_transformer(tmp_path):
    """tools/port_checkpoint.py end-to-end on a synthetic MotionRAG
    motion_transformer.ckpt: load -> route -> Orbax save -> restore, and
    the restored tree drives our ActionTransformer."""
    import subprocess

    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.cama import ActionTransformer
    from motionrag_tpu.models.layers import TransformerEncoder
    from motionrag_tpu.models.resampler import Resampler
    from motionrag_tpu.training.checkpoints import restore_checkpoint

    ref_module, rr = _import_reference_condition()

    d, nq, ved, ced = 32, 3, 24, 24
    tr = torch.nn.TransformerEncoder(
        torch.nn.TransformerEncoderLayer(d, 4, 64, dropout=0.0,
                                         activation="gelu", batch_first=True), 2)
    sd = {"sos_token": torch.randn(1, nq, d)}
    for k, v in tr.state_dict().items():
        sd[f"transformer.{k}"] = v
    for name, ed in (("vision_proj", ved), ("condition_proj", ced)):
        rs = rr.Resampler(dim=d, depth=1, dim_head=8, heads=4, num_queries=nq,
                          embedding_dim=ed, output_dim=d)
        for k, v in rs.state_dict().items():
            sd[f"{name}.{k}"] = v
    src = tmp_path / "mt.ckpt"
    torch.save({"state_dict": sd}, src)

    out_dir = tmp_path / "ported"
    r = subprocess.run(
        [sys.executable, "tools/port_checkpoint.py", "--family",
         "motion-transformer", "--src", str(src), "--out", str(out_dir)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-800:]
    assert "ported motion-transformer" in r.stdout

    tree = restore_checkpoint(out_dir)
    p = tree["params"]
    assert set(p) >= {"sos_token", "vision_proj", "condition_proj", "transformer"}
    assert np.shape(p["sos_token"]) == (1, nq, d)

    # the restored subtrees drive our model (stub pixel encoders)
    import flax.linen as fnn

    class JVid(fnn.Module):
        @fnn.compact
        def __call__(self, v):
            bk, t = v.shape[:2]
            return fnn.Dense(ved, name="proj")(v.reshape(bk, t, -1))

    class JImg(fnn.Module):
        @fnn.compact
        def __call__(self, im):
            bk, c, h, w = im.shape
            return fnn.Dense(ced, name="proj")(
                im.transpose(0, 2, 1, 3).reshape(bk, h, c * w))

    ours = ActionTransformer(
        vision_model=JVid(), vision_proj=Resampler(dim=d, depth=1, dim_head=8,
            heads=4, num_queries=nq, embedding_dim=ved, output_dim=d),
        condition_model=JImg(), condition_proj=Resampler(dim=d, depth=1,
            dim_head=8, heads=4, num_queries=nq, embedding_dim=ced, output_dim=d),
        transformer=TransformerEncoder(num_layers=2, d_model=d, nhead=4,
                                       dim_feedforward=64, activation="gelu"),
    )
    batch = {
        "ref_videos": jnp.zeros((1, 2, 2, 3, 8, 8), jnp.float32),
        "video": jnp.zeros((1, 2, 3, 8, 8), jnp.float32),
    }
    init = ours.apply  # build full params: stub encoders random-init + ported
    full = dict(p)
    enc_params = ActionTransformer.init(
        ours, jax.random.key(0),
        jnp.zeros((1, 3, 2, 3, 8, 8)), jnp.zeros((1, 3, 3, 8, 8)),
    )["params"]
    for k in ("vision_model", "condition_model"):
        full[k] = enc_params[k]
    loss = ours.apply({"params": full}, batch, True, False, method="batch_forward")
    assert np.isfinite(float(loss.main))


@pytest.mark.slow
def test_ddim_eta1_trajectory_parity():
    """Ancestral DDIM (eta=1.0, 'uniform' spacing, rescale 0) — the exact
    defaults the reference's DC eval wrapper runs
    (pipelines/pipeline.py:28-34) — vendored sampler vs our ddim_sample with
    an identical injected noise sequence."""
    import jax
    import jax.numpy as jnp

    lvdm = _import_lvdm()
    import DynamiCrafter.lvdm.models.samplers.ddim as vendored_ddim
    from DynamiCrafter.lvdm.models.samplers.ddim import DDIMSampler

    from motionrag_tpu.models.dynamicrafter.ddim import LVDMSchedule, ddim_sample

    b, c, t, h, w = 1, 3, 2, 4, 4
    steps = 6
    rng = np.random.default_rng(14)
    x_T = rng.standard_normal((b, c, t, h, w), dtype=np.float32)
    cond_vec = rng.standard_normal((b, c, t, h, w), dtype=np.float32)
    uncond_vec = rng.standard_normal((b, c, t, h, w), dtype=np.float32)

    key = jax.random.key(77)
    # our loop draws fold_in(key, i) per executed step, jax layout
    jax_noises = [
        np.asarray(jax.random.normal(jax.random.fold_in(key, i),
                                     (b, t, h, w, c), jnp.float32))
        # 'uniform' spacing at 1000/6 yields ceil = 7 schedule entries
        for i in range(steps + 1)
    ]
    torch_noises = iter([n.transpose(0, 4, 1, 2, 3) for n in jax_noises])
    orig_noise_like = vendored_ddim.noise_like
    vendored_ddim.noise_like = (
        lambda shape, device, repeat=False: torch.from_numpy(next(torch_noises))
    )
    try:
        def denoise_torch(x, tt, cond):
            cv = cond["c_crossattn"]
            tscaled = (tt.float() / 1000.0).reshape(-1, 1, 1, 1, 1)
            return 0.3 * torch.tanh(x) + 0.2 * cv + 0.05 * tscaled * x

        stub = _StubLVDM(denoise_torch)
        DDIMSampler.register_buffer = lambda self, name, attr: setattr(self, name, attr)
        sampler = DDIMSampler(stub)
        with torch.no_grad():
            samples_t, _ = sampler.sample(
                S=steps, batch_size=b, shape=(c, t, h, w),
                conditioning={"c_crossattn": torch.from_numpy(cond_vec)},
                unconditional_conditioning={"c_crossattn": torch.from_numpy(uncond_vec)},
                unconditional_guidance_scale=2.0, guidance_rescale=0.0,
                x_T=torch.from_numpy(x_T), timestep_spacing="uniform",
                eta=1.0, verbose=False, schedule_verbose=False,
            )
        samples_t = samples_t.numpy()
    finally:
        vendored_ddim.noise_like = orig_noise_like

    schedule = LVDMSchedule(
        rescale_betas_zero_snr=True, use_dynamic_rescale=True, base_scale=0.3
    )

    def denoise_jax(x, tt):
        tscaled = (tt.astype(jnp.float32) / 1000.0).reshape(-1, 1, 1, 1, 1)

        def f(cv):
            return 0.3 * jnp.tanh(x) + 0.2 * cv + 0.05 * tscaled * x

        return f(jnp.asarray(cond_vec.transpose(0, 2, 3, 4, 1))), f(
            jnp.asarray(uncond_vec.transpose(0, 2, 3, 4, 1))
        )

    samples_j = ddim_sample(
        schedule, denoise_jax, jnp.asarray(x_T.transpose(0, 2, 3, 4, 1)),
        num_steps=steps, guidance_scale=2.0, guidance_rescale=0.0,
        parameterization="v", timestep_spacing="uniform", eta=1.0, rng=key,
    )
    samples_j = np.asarray(samples_j).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(samples_j, samples_t, rtol=2e-4, atol=2e-4)
