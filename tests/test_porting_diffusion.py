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
        "proj_out.weight": lin(dim, 2 * 2 * 4),
        "proj_out.bias": torch.randn(2 * 2 * 4, generator=g),
    }
    inner = heads * hd
    for i in range(depth):
        pre = f"transformer_blocks.{i}"
        sd.update({
            f"{pre}.norm1.linear.weight": lin(t_d, 6 * dim),
            f"{pre}.norm1.linear.bias": torch.randn(6 * dim, generator=g),
            f"{pre}.norm2.linear.weight": lin(t_d, 6 * dim),
            f"{pre}.norm2.linear.bias": torch.randn(6 * dim, generator=g),
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
    for path, leaf in flat_new:
        key = tuple(str(k) for k in path)
        assert key in ref_shapes, f"converter produced unknown param {key}"
        assert ref_shapes[key] == leaf.shape, f"shape mismatch at {key}"

    # forward runs with the ported tree
    out = dit.apply(ported, x, text, jnp.asarray([100]))
    assert out.shape == (1, 2, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()
