"""Structural tests for the diffusion-backbone converters: build a fake
state_dict with the diffusers naming, convert, and check the tree slots into
our module's expected parameter structure (shapes line up with init)."""

import numpy as np
import torch

from motionrag_tpu.utils.porting_diffusion import port_cogvideox_transformer


def test_cogvideox_converter_structural():
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D

    dim, depth, heads, hd, text_d, t_d = 64, 2, 4, 16, 32, 32
    dit = CogVideoXTransformer3D(
        in_channels=8, out_channels=4, dim=dim, depth=depth, heads=heads,
        head_dim=hd, text_embed_dim=text_d, time_embed_dim=t_d, dtype=jnp.float32,
    )
    x = jnp.zeros((1, 2, 4, 4, 8))
    text = jnp.zeros((1, 3, text_d))
    ref = dit.init(jax.random.key(0), x, text, jnp.zeros((1,), jnp.int32))

    # synthesize a diffusers-style state dict with matching shapes
    g = torch.Generator().manual_seed(0)
    def lin(i, o):  # torch [out, in]
        return torch.randn(o, i, generator=g)

    sd = {
        "patch_embed.proj.weight": torch.randn(dim, 8, 2, 2, generator=g),
        "patch_embed.proj.bias": torch.randn(dim, generator=g),
        "patch_embed.text_proj.weight": lin(text_d, dim),
        "patch_embed.text_proj.bias": torch.randn(dim, generator=g),
        "time_embedding.linear_1.weight": lin(dim, t_d),
        "time_embedding.linear_1.bias": torch.randn(t_d, generator=g),
        "time_embedding.linear_2.weight": lin(t_d, t_d),
        "time_embedding.linear_2.bias": torch.randn(t_d, generator=g),
        "norm_final.weight": torch.randn(dim, generator=g),
        "norm_final.bias": torch.randn(dim, generator=g),
        "norm_out.linear.weight": lin(t_d, 2 * dim),
        "norm_out.linear.bias": torch.randn(2 * dim, generator=g),
        "norm_out.norm.weight": torch.randn(dim, generator=g),
        "norm_out.norm.bias": torch.randn(dim, generator=g),
        "proj_out.weight": lin(dim, 2 * 2 * 4),
        "proj_out.bias": torch.randn(2 * 2 * 4, generator=g),
    }
    inner = heads * hd
    for i in range(depth):
        pre = f"transformer_blocks.{i}"
        sd.update({
            f"{pre}.norm1.linear.weight": lin(t_d, 6 * dim),
            f"{pre}.norm1.linear.bias": torch.randn(6 * dim, generator=g),
            f"{pre}.norm1.norm.weight": torch.randn(dim, generator=g),
            f"{pre}.norm1.norm.bias": torch.randn(dim, generator=g),
            f"{pre}.norm2.linear.weight": lin(t_d, 6 * dim),
            f"{pre}.norm2.linear.bias": torch.randn(6 * dim, generator=g),
            f"{pre}.norm2.norm.weight": torch.randn(dim, generator=g),
            f"{pre}.norm2.norm.bias": torch.randn(dim, generator=g),
            f"{pre}.attn1.to_q.weight": lin(dim, inner),
            f"{pre}.attn1.to_q.bias": torch.randn(inner, generator=g),
            f"{pre}.attn1.to_k.weight": lin(dim, inner),
            f"{pre}.attn1.to_k.bias": torch.randn(inner, generator=g),
            f"{pre}.attn1.to_v.weight": lin(dim, inner),
            f"{pre}.attn1.to_v.bias": torch.randn(inner, generator=g),
            f"{pre}.attn1.to_out.0.weight": lin(inner, dim),
            f"{pre}.attn1.to_out.0.bias": torch.randn(dim, generator=g),
            f"{pre}.attn1.norm_q.weight": torch.randn(hd, generator=g),
            f"{pre}.attn1.norm_q.bias": torch.randn(hd, generator=g),
            f"{pre}.attn1.norm_k.weight": torch.randn(hd, generator=g),
            f"{pre}.attn1.norm_k.bias": torch.randn(hd, generator=g),
            f"{pre}.ff.net.0.proj.weight": lin(dim, 4 * dim),
            f"{pre}.ff.net.0.proj.bias": torch.randn(4 * dim, generator=g),
            f"{pre}.ff.net.2.weight": lin(4 * dim, dim),
            f"{pre}.ff.net.2.bias": torch.randn(dim, generator=g),
        })

    ported = port_cogvideox_transformer(sd, depth=depth, strict=True)

    # every ported leaf must slot into the init tree with matching shape
    flat_ref = jax.tree_util.tree_flatten_with_path(ref["params"])[0]
    ref_shapes = {tuple(str(k) for k in path): leaf.shape for path, leaf in flat_ref}
    flat_new = jax.tree_util.tree_flatten_with_path(ported["params"])[0]
    new_keys = set()
    for path, leaf in flat_new:
        key = tuple(str(k) for k in path)
        new_keys.add(key)
        assert key in ref_shapes, f"converter produced unknown param {key}"
        assert ref_shapes[key] == leaf.shape, f"shape mismatch at {key}"
    # and the converter must COVER the whole module tree — a missing mapping
    # (e.g. the norm1.norm affine weights) silently zero-initializes on a
    # strict=False restore and wrecks real-checkpoint activations
    missing = set(ref_shapes) - new_keys
    assert not missing, f"converter leaves {sorted(missing)[:8]} unported"

    # forward runs with the ported tree
    out = dit.apply(ported, x, text, jnp.asarray([100]))
    assert out.shape == (1, 2, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_lvdm_unet3d_converter_roundtrip():
    """Bijection test: walk a tiny UNet3D param tree, emit the lvdm
    state_dict keys via the inverse name map, convert back, require exact
    equality and zero unconsumed keys."""
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D
    from motionrag_tpu.utils.porting_diffusion import port_lvdm_unet3d

    unet = UNet3D(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=2,
        attention_resolutions=(2,), num_head_channels=16, context_dim=48,
        action_cross_attention=True, action_scale_learnable=True,
        image_scale_learnable=True, dtype=jnp.float32,
    )
    # ds starts at 1; attention_resolutions (2,) -> only level 1 has attention
    b, t, h, w = 1, 2, 8, 8
    ctx = {
        "prompt": jnp.ones((b, 5, 48)), "image": jnp.ones((b, t * 3, 48)),
        "action": jnp.ones((b, 4, 48)),
    }
    params = unet.init(jax.random.key(0), jnp.ones((b, t, h, w, 8)),
                       jnp.zeros((b,)), ctx)["params"]
    rng = np.random.default_rng(0)
    params = jax.tree.map(lambda x: rng.standard_normal(x.shape).astype(np.float32), params)

    # ---- inverse map: our flat tree -> lvdm torch keys -------------------
    def inv_linear(sd, pre, leaf):
        sd[f"{pre}.weight"] = leaf["kernel"].T
        if "bias" in leaf:
            sd[f"{pre}.bias"] = leaf["bias"]

    def inv_conv(sd, pre, leaf):
        k = leaf["kernel"]
        dims = list(range(k.ndim))
        sd[f"{pre}.weight"] = k.transpose([dims[-1], dims[-2]] + dims[:-2])
        sd[f"{pre}.bias"] = leaf["bias"]

    def inv_attention(sd, pre, a):
        for nm in ("to_q", "to_k", "to_v", "to_k_ip", "to_v_ip", "to_q_a", "to_k_a", "to_v_a"):
            if nm in a:
                sd[f"{pre}.{nm}.weight"] = a[nm]["kernel"].T
        inv_linear(sd, f"{pre}.to_out.0", a["to_out"])
        for sc in ("alpha", "alpha_action"):
            if sc in a:
                sd[f"{pre}.{sc}"] = a[sc]

    def inv_txblock(sd, pre, blk):
        for n in ("norm1", "norm2", "norm3"):
            sd[f"{pre}.{n}.weight"] = blk[n]["scale"]
            sd[f"{pre}.{n}.bias"] = blk[n]["bias"]
        inv_attention(sd, f"{pre}.attn1", blk["attn1"])
        inv_attention(sd, f"{pre}.attn2", blk["attn2"])
        inv_linear(sd, f"{pre}.ff.net.0.proj", blk["ff"]["net_0_proj"])
        inv_linear(sd, f"{pre}.ff.net.2", blk["ff"]["net_2"])

    def inv_spatial(sd, pre, sp):
        sd[f"{pre}.norm.weight"] = sp["norm_scale"]
        sd[f"{pre}.norm.bias"] = sp["norm_bias"]
        inv_linear(sd, f"{pre}.proj_in", sp["proj_in"])
        inv_linear(sd, f"{pre}.proj_out", sp["proj_out"])
        inv_txblock(sd, f"{pre}.transformer_blocks.0", sp["blocks_0"])

    def inv_temporal(sd, pre, tp):
        sd[f"{pre}.norm.weight"] = tp["norm_scale"]
        sd[f"{pre}.norm.bias"] = tp["norm_bias"]
        inv_linear(sd, f"{pre}.proj_in", tp["proj_in"])
        inv_linear(sd, f"{pre}.proj_out", tp["proj_out"])
        blk = {
            "norm1": tp["blocks_0_norm1"], "norm2": tp["blocks_0_norm2"],
            "norm3": tp["blocks_0_norm3"], "attn1": tp["blocks_0_attn1"],
            "attn2": tp["blocks_0_attn2"], "ff": tp["blocks_0_ff"],
        }
        inv_txblock(sd, f"{pre}.transformer_blocks.0", blk)

    def inv_res(sd, pre, r):
        sd[f"{pre}.in_layers.0.weight"] = r["norm1_scale"]
        sd[f"{pre}.in_layers.0.bias"] = r["norm1_bias"]
        inv_conv(sd, f"{pre}.in_layers.2", r["conv1"])
        inv_linear(sd, f"{pre}.emb_layers.1", r["emb_proj"])
        sd[f"{pre}.out_layers.0.weight"] = r["norm2_scale"]
        sd[f"{pre}.out_layers.0.bias"] = r["norm2_bias"]
        inv_conv(sd, f"{pre}.out_layers.3", r["conv2"])
        if "skip" in r:
            inv_conv(sd, f"{pre}.skip_connection", r["skip"])
        if "temporal" in r:
            tc = r["temporal"]
            for idx, pos in ((1, 2), (2, 3), (3, 3), (4, 3)):
                sd[f"{pre}.temopral_conv.conv{idx}.0.weight"] = tc[f"norm{idx}_scale"]
                sd[f"{pre}.temopral_conv.conv{idx}.0.bias"] = tc[f"norm{idx}_bias"]
                inv_conv(sd, f"{pre}.temopral_conv.conv{idx}.{pos}", tc[f"conv{idx}"])

    sd = {}
    inv_linear(sd, "time_embed.0", params["time_embed"]["linear_1"])
    inv_linear(sd, "time_embed.2", params["time_embed"]["linear_2"])
    inv_linear(sd, "fps_embedding.0", params["fps_embedding"]["linear_1"])
    inv_linear(sd, "fps_embedding.2", params["fps_embedding"]["linear_2"])
    inv_conv(sd, "input_blocks.0.0", params["conv_in"])
    inv_temporal(sd, "init_attn.0", params["init_attn"])

    n = 1
    for level in range(2):
        for i in range(2):
            inv_res(sd, f"input_blocks.{n}.0", params[f"input_{level}_{i}_res"])
            if level == 1:
                inv_spatial(sd, f"input_blocks.{n}.1", params[f"input_{level}_{i}_spatial"])
                inv_temporal(sd, f"input_blocks.{n}.2", params[f"input_{level}_{i}_temporal"])
            n += 1
        if level == 0:
            inv_conv(sd, f"input_blocks.{n}.0.op", params["input_0_down"])
            n += 1

    inv_res(sd, "middle_block.0", params["middle_res_0"])
    inv_spatial(sd, "middle_block.1", params["middle_spatial"])
    inv_temporal(sd, "middle_block.2", params["middle_temporal"])
    inv_res(sd, "middle_block.3", params["middle_res_1"])

    n = 0
    for level in (1, 0):
        for i in range(3):
            inv_res(sd, f"output_blocks.{n}.0", params[f"output_{level}_{i}_res"])
            idx = 1
            if level == 1:
                inv_spatial(sd, f"output_blocks.{n}.{idx}", params[f"output_{level}_{i}_spatial"])
                inv_temporal(sd, f"output_blocks.{n}.{idx+1}", params[f"output_{level}_{i}_temporal"])
                idx += 2
            if level == 1 and i == 2:
                inv_conv(sd, f"output_blocks.{n}.{idx}.conv", params["output_1_up"])
            n += 1

    sd["out.0.weight"] = params["out_norm_scale"]
    sd["out.0.bias"] = params["out_norm_bias"]
    inv_conv(sd, "out.2", params["conv_out"])

    ported = port_lvdm_unet3d(
        sd, channel_mult=(1, 2), num_res_blocks=2, attention_levels=(1,),
        temporal_attention=True, strict=True,
    )["params"]

    a, b_ = _flatten(params), _flatten(ported)
    assert set(a) == set(b_), (
        f"missing: {sorted(set(a) - set(b_))[:5]} extra: {sorted(set(b_) - set(a))[:5]}"
    )
    for k in a:
        np.testing.assert_allclose(a[k], b_[k], err_msg=str(k))


def test_lvdm_init_attn_conv1d_proj():
    """Real DynamiCrafter checkpoints store init_attn's proj_in/proj_out as
    Conv1d weights [out, in, 1] (the reference builds that TemporalTransformer
    without use_linear, openaimodel3d.py:401-413). The converter must squeeze
    the kernel dim; result must match the Linear-stored equivalent."""
    from motionrag_tpu.utils.porting_diffusion import _Consumer, _port_lvdm_temporal

    rng = np.random.default_rng(1)
    d, ctx = 8, 8

    def tx_keys(sd, pre):
        for n in ("norm1", "norm2", "norm3"):
            sd[f"{pre}.{n}.weight"] = rng.standard_normal(d).astype(np.float32)
            sd[f"{pre}.{n}.bias"] = rng.standard_normal(d).astype(np.float32)
        for attn, kdim in (("attn1", d), ("attn2", ctx)):
            for nm, indim in (("to_q", d), ("to_k", kdim), ("to_v", kdim)):
                sd[f"{pre}.{attn}.{nm}.weight"] = rng.standard_normal((d, indim)).astype(np.float32)
            sd[f"{pre}.{attn}.to_out.0.weight"] = rng.standard_normal((d, d)).astype(np.float32)
            sd[f"{pre}.{attn}.to_out.0.bias"] = rng.standard_normal(d).astype(np.float32)
        sd[f"{pre}.ff.net.0.proj.weight"] = rng.standard_normal((2 * d, d)).astype(np.float32)
        sd[f"{pre}.ff.net.0.proj.bias"] = rng.standard_normal(2 * d).astype(np.float32)
        sd[f"{pre}.ff.net.2.weight"] = rng.standard_normal((d, d)).astype(np.float32)
        sd[f"{pre}.ff.net.2.bias"] = rng.standard_normal(d).astype(np.float32)

    def make_sd(conv1d: bool):
        sd = {
            "t.norm.weight": rng.standard_normal(d).astype(np.float32),
            "t.norm.bias": rng.standard_normal(d).astype(np.float32),
        }
        for nm in ("proj_in", "proj_out"):
            w = rng.standard_normal((d, d)).astype(np.float32)
            sd[f"t.{nm}.weight"] = w[:, :, None] if conv1d else w
            sd[f"t.{nm}.bias"] = rng.standard_normal(d).astype(np.float32)
        tx_keys(sd, "t.transformer_blocks.0")
        return sd

    rng = np.random.default_rng(1)
    sd_conv = make_sd(conv1d=True)
    rng = np.random.default_rng(1)
    sd_lin = make_sd(conv1d=False)

    p_conv = _port_lvdm_temporal(_Consumer(sd_conv), "t")
    p_lin = _port_lvdm_temporal(_Consumer(sd_lin), "t")
    for nm in ("proj_in", "proj_out"):
        assert p_conv[nm]["kernel"].ndim == 2
        np.testing.assert_array_equal(p_conv[nm]["kernel"], p_lin[nm]["kernel"])
        np.testing.assert_array_equal(p_conv[nm]["bias"], p_lin[nm]["bias"])


def test_svd_unet_converter_roundtrip():
    """Bijection test for the full SVD UNet converter (resnets + attention
    transformers + adapter processor weights)."""
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.svd.unet import UNetSpatioTemporal
    from motionrag_tpu.utils.porting_diffusion import port_svd_unet

    adapter_sites = ("down_blocks.0.attentions.0.transformer_blocks.0.attn2.processor",)
    unet = UNetSpatioTemporal(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=48, num_attention_heads=(2, 4),
        adapter_sites=adapter_sites, dtype=jnp.float32,
    )
    b, f = 1, 2
    params = unet.init(
        jax.random.key(0), jnp.ones((b, f, 8, 8, 8)), jnp.zeros((b,)),
        jnp.ones((b, 1, 48)), jnp.zeros((b, 3)),
    )["params"]
    rng = np.random.default_rng(1)
    params = jax.tree.map(lambda x: rng.standard_normal(x.shape).astype(np.float32), params)

    def inv_linear(sd, pre, leaf, bias=True):
        sd[f"{pre}.weight"] = leaf["kernel"].T
        if bias and "bias" in leaf:
            sd[f"{pre}.bias"] = leaf["bias"]

    def inv_conv(sd, pre, leaf):
        k = leaf["kernel"]
        dims = list(range(k.ndim))
        sd[f"{pre}.weight"] = k.transpose([dims[-1], dims[-2]] + dims[:-2])
        sd[f"{pre}.bias"] = leaf["bias"]

    def inv_attn(sd, pre, a):
        for nm in ("to_q", "to_k", "to_v"):
            sd[f"{pre}.{nm}.weight"] = a[nm]["kernel"].T
        inv_linear(sd, f"{pre}.to_out.0", a["to_out"])
        for nm in ("to_q_ip", "to_k_ip", "to_v_ip"):
            if nm in a:
                sd[f"{pre}.processor.{nm}.weight"] = a[nm]["kernel"].T

    def inv_ln(sd, pre, leaf):
        sd[f"{pre}.weight"] = leaf["scale"]
        sd[f"{pre}.bias"] = leaf["bias"]

    def inv_ff(sd, pre, leaf):
        inv_linear(sd, f"{pre}.net.0.proj", leaf["net_0_proj"])
        inv_linear(sd, f"{pre}.net.2", leaf["net_2"])

    def inv_basic(sd, pre, blk):
        for n in ("norm1", "norm2", "norm3"):
            inv_ln(sd, f"{pre}.{n}", blk[n])
        inv_attn(sd, f"{pre}.attn1", blk["attn1"])
        inv_attn(sd, f"{pre}.attn2", blk["attn2"])
        inv_ff(sd, f"{pre}.ff", blk["ff"])

    def inv_temporal_blk(sd, pre, blk):
        inv_ln(sd, f"{pre}.norm_in", blk["norm_in"])
        inv_ff(sd, f"{pre}.ff_in", blk["ff_in"])
        inv_ln(sd, f"{pre}.norm1", blk["norm1"])
        inv_attn(sd, f"{pre}.attn1", blk["attn1"])
        if "attn2" in blk:
            inv_ln(sd, f"{pre}.norm2", blk["norm2"])
            inv_attn(sd, f"{pre}.attn2", blk["attn2"])
        inv_ln(sd, f"{pre}.norm3", blk["norm3"])
        inv_ff(sd, f"{pre}.ff", blk["ff"])

    def inv_attention_block(sd, pre, at):
        sd[f"{pre}.norm.weight"] = at["norm_scale"]
        sd[f"{pre}.norm.bias"] = at["norm_bias"]
        inv_linear(sd, f"{pre}.proj_in", at["proj_in"])
        inv_linear(sd, f"{pre}.proj_out", at["proj_out"])
        inv_linear(sd, f"{pre}.time_pos_embed.linear_1", at["time_pos_embed"]["linear_1"])
        inv_linear(sd, f"{pre}.time_pos_embed.linear_2", at["time_pos_embed"]["linear_2"])
        sd[f"{pre}.time_mixer.mix_factor"] = at["time_mixer_0"]["mix_factor"]
        inv_basic(sd, f"{pre}.transformer_blocks.0", at["transformer_blocks_0"])
        inv_temporal_blk(
            sd, f"{pre}.temporal_transformer_blocks.0", at["temporal_transformer_blocks_0"]
        )

    def inv_resnet2d(sd, pre, r):
        sd[f"{pre}.norm1.weight"] = r["norm1_scale"]
        sd[f"{pre}.norm1.bias"] = r["norm1_bias"]
        inv_conv(sd, f"{pre}.conv1", r["conv1"])
        sd[f"{pre}.norm2.weight"] = r["norm2_scale"]
        sd[f"{pre}.norm2.bias"] = r["norm2_bias"]
        inv_conv(sd, f"{pre}.conv2", r["conv2"])
        if "time_emb_proj" in r:
            inv_linear(sd, f"{pre}.time_emb_proj", r["time_emb_proj"])
        if "conv_shortcut" in r:
            inv_conv(sd, f"{pre}.conv_shortcut", r["conv_shortcut"])

    def inv_st_res(sd, pre, r):
        inv_resnet2d(sd, f"{pre}.spatial_res_block", r["spatial_res_block"])
        inv_resnet2d(sd, f"{pre}.temporal_res_block", r["temporal_res_block"])
        sd[f"{pre}.time_mixer.mix_factor"] = r["time_mixer"]["mix_factor"]

    sd = {}
    inv_conv(sd, "conv_in", params["conv_in"])
    inv_conv(sd, "conv_out", params["conv_out"])
    sd["conv_norm_out.weight"] = params["conv_norm_out_scale"]
    sd["conv_norm_out.bias"] = params["conv_norm_out_bias"]
    for emb in ("time_embedding", "add_embedding"):
        inv_linear(sd, f"{emb}.linear_1", params[emb]["linear_1"])
        inv_linear(sd, f"{emb}.linear_2", params[emb]["linear_2"])

    # 2 levels, layers_per_block=1: down 0 (attn), down 1 (final, no attn)
    inv_st_res(sd, "down_blocks.0.resnets.0", params["down_blocks_0_resnets_0"])
    inv_attention_block(sd, "down_blocks.0.attentions.0", params["down_blocks_0_attentions_0"])
    inv_conv(sd, "down_blocks.0.downsamplers.0.conv", params["down_blocks_0_downsample"]["conv"])
    inv_st_res(sd, "down_blocks.1.resnets.0", params["down_blocks_1_resnets_0"])
    inv_st_res(sd, "mid_block.resnets.0", params["mid_block_resnets_0"])
    inv_attention_block(sd, "mid_block.attentions.0", params["mid_block_attentions_0"])
    inv_st_res(sd, "mid_block.resnets.1", params["mid_block_resnets_1"])
    for j in (0, 1):
        inv_st_res(sd, f"up_blocks.0.resnets.{j}", params[f"up_blocks_0_resnets_{j}"])
        inv_st_res(sd, f"up_blocks.1.resnets.{j}", params[f"up_blocks_1_resnets_{j}"])
        inv_attention_block(sd, f"up_blocks.1.attentions.{j}", params[f"up_blocks_1_attentions_{j}"])
    inv_conv(sd, "up_blocks.0.upsamplers.0.conv", params["up_blocks_0_upsample"]["conv"])

    ported = port_svd_unet(sd, layers_per_block=1, strict=True)["params"]

    a, b_ = _flatten(params), _flatten(ported)
    assert set(a) == set(b_), (
        f"missing: {sorted(set(a) - set(b_))[:6]} extra: {sorted(set(b_) - set(a))[:6]}"
    )
    for k in a:
        np.testing.assert_allclose(a[k], b_[k], err_msg=str(k))


def test_autoencoder_kl_converter_roundtrip():
    """Bijection test for the CompVis/lvdm AutoencoderKL converter, including
    the reversed decoder up-list indexing and 1x1-conv attention qkv."""
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.dynamicrafter.vae import AutoencoderKL2D
    from motionrag_tpu.utils.porting_diffusion import port_autoencoder_kl

    vae = AutoencoderKL2D(block_out_channels=(32, 64, 64), dtype=jnp.float32)
    params = vae.init(jax.random.key(0), jnp.ones((1, 32, 32, 3)))["params"]
    rng = np.random.default_rng(2)
    params = jax.tree.map(lambda x: rng.standard_normal(x.shape).astype(np.float32), params)

    def inv_conv(sd, pre, leaf):
        k = leaf["kernel"]
        dims = list(range(k.ndim))
        sd[f"{pre}.weight"] = k.transpose([dims[-1], dims[-2]] + dims[:-2])
        sd[f"{pre}.bias"] = leaf["bias"]

    def inv_res(sd, pre, r):
        sd[f"{pre}.norm1.weight"] = r["norm1_scale"]
        sd[f"{pre}.norm1.bias"] = r["norm1_bias"]
        inv_conv(sd, f"{pre}.conv1", r["conv1"])
        sd[f"{pre}.norm2.weight"] = r["norm2_scale"]
        sd[f"{pre}.norm2.bias"] = r["norm2_bias"]
        inv_conv(sd, f"{pre}.conv2", r["conv2"])
        if "conv_shortcut" in r:
            inv_conv(sd, f"{pre}.nin_shortcut", r["conv_shortcut"])

    def inv_attn(sd, pre, a):
        sd[f"{pre}.norm.weight"] = a["norm_scale"]
        sd[f"{pre}.norm.bias"] = a["norm_bias"]
        for ours, theirs in (("to_q", "q"), ("to_k", "k"), ("to_v", "v"), ("to_out", "proj_out")):
            sd[f"{pre}.{theirs}.weight"] = a[ours]["kernel"].T[:, :, None, None]
            sd[f"{pre}.{theirs}.bias"] = a[ours]["bias"]

    sd = {}
    enc, dec = params["encoder"], params["decoder"]
    inv_conv(sd, "encoder.conv_in", enc["conv_in"])
    n = 3
    for i in range(n):
        for j in range(2):
            inv_res(sd, f"encoder.down.{i}.block.{j}", enc[f"down_{i}_res_{j}"])
        if i < n - 1:
            inv_conv(sd, f"encoder.down.{i}.downsample.conv", enc[f"down_{i}_downsample"]["conv"])
    inv_res(sd, "encoder.mid.block_1", enc["mid_res_0"])
    inv_attn(sd, "encoder.mid.attn_1", enc["mid_attn"])
    inv_res(sd, "encoder.mid.block_2", enc["mid_res_1"])
    sd["encoder.norm_out.weight"] = enc["norm_out_scale"]
    sd["encoder.norm_out.bias"] = enc["norm_out_bias"]
    inv_conv(sd, "encoder.conv_out", enc["conv_out"])
    inv_conv(sd, "quant_conv", enc["quant_conv"])
    inv_conv(sd, "post_quant_conv", params["post_quant_conv"])

    inv_conv(sd, "decoder.conv_in", dec["conv_in"])
    inv_res(sd, "decoder.mid.block_1", dec["mid_res_0"])
    inv_attn(sd, "decoder.mid.attn_1", dec["mid_attn"])
    inv_res(sd, "decoder.mid.block_2", dec["mid_res_1"])
    for i in range(n):
        lvl = n - 1 - i
        for j in range(3):
            inv_res(sd, f"decoder.up.{lvl}.block.{j}", dec[f"up_{i}_res_{j}"])
        if i < n - 1:
            inv_conv(sd, f"decoder.up.{lvl}.upsample.conv", dec[f"up_{i}_upsample"])
    sd["decoder.norm_out.weight"] = dec["norm_out_scale"]
    sd["decoder.norm_out.bias"] = dec["norm_out_bias"]
    inv_conv(sd, "decoder.conv_out", dec["conv_out"])

    ported = port_autoencoder_kl(sd, n_levels=3, strict=True)["params"]
    a, b_ = _flatten(params), _flatten(ported)
    assert set(a) == set(b_), (
        f"missing: {sorted(set(a) - set(b_))[:6]} extra: {sorted(set(b_) - set(a))[:6]}"
    )
    for k in a:
        np.testing.assert_allclose(a[k], b_[k], err_msg=str(k))
