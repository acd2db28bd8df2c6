"""scan_blocks mode of the DC UNet3D: each level's run of structurally
identical blocks compiles as one nn.scan'd cell. Must be numerically
identical to the unrolled loop (params converted by adapt_block_layout),
across channel_mult shapes that exercise every group variety (down run
starting at 0, down run starting at 1 absent, up runs starting at 0 and 1,
attention on/off per level)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D
from motionrag_tpu.training.checkpoints import adapt_block_layout


def _unets(**kw):
    base = dict(in_channels=8, out_channels=4, model_channels=32,
                num_head_channels=16, context_dim=48, dtype=jnp.float32, **kw)
    return UNet3D(**base), UNet3D(scan_blocks=True, **base)


def _inputs(rng, t=4, h=16, w=16):
    x = jnp.asarray(rng.standard_normal((1, t, h, w, 8)), jnp.float32)
    ts = jnp.asarray([3], jnp.int32)
    ctx = {
        "prompt": jnp.asarray(rng.standard_normal((1, 7, 48)), jnp.float32),
        "image": jnp.asarray(rng.standard_normal((1, t * 3, 48)), jnp.float32),
    }
    return x, ts, ctx


@pytest.mark.parametrize("mult,nres", [((1, 2), 2), ((1, 2, 4, 4), 2), ((1, 1), 3)])
def test_unet_scan_matches_loop(rng, mult, nres):
    loop, scan = _unets(channel_mult=mult, num_res_blocks=nres)
    x, ts, ctx = _inputs(rng)
    p_loop = loop.init(jax.random.key(0), x, ts, ctx)
    p_scan = scan.init(jax.random.key(0), x, ts, ctx)
    p_conv = adapt_block_layout(p_scan, jax.tree.map(np.asarray, p_loop))
    shapes_ok = jax.tree.map(lambda a, b: a.shape == b.shape, p_scan, p_conv)
    assert all(jax.tree.leaves(shapes_ok))
    out_loop = loop.apply(p_loop, x, ts, ctx)
    out_scan = scan.apply(p_conv, x, ts, ctx)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               rtol=2e-5, atol=2e-5)


def test_unet_scan_groups_dc1024_structure():
    """At the real DC-1024 structure the groups must be exactly: down L0 x2,
    down L3 x2, up L3 x3, up L2 x2 (its i=2 skip is the 640-ch down1
    output), up L0 x2 (11 of 22 blocks scanned)."""
    unet = UNet3D(scan_blocks=True)
    down, up = unet._groups()
    assert down == [(0, 2), None, None, (0, 2)]
    # up_groups in reversed level order: L3, L2, L1, L0
    assert up == [(0, 3), (0, 2), None, (1, 2)]


def test_unet_scan_action_branch_roundtrip(rng):
    """Grouped layout with the Motion-Adapter action branch: conversion
    keeps the to_q_a/to_k_a/to_v_a adapter params addressable and the
    output identical."""
    loop, scan = _unets(channel_mult=(1, 2), action_cross_attention=True)
    x, ts, ctx = _inputs(rng)
    ctx = dict(ctx, action=jnp.asarray(
        np.random.default_rng(7).standard_normal((1, 5, 48)), np.float32))
    p_loop = loop.init(jax.random.key(0), x, ts, ctx)
    p_conv = adapt_block_layout(
        scan.init(jax.random.key(0), x, ts, ctx),
        jax.tree.map(np.asarray, p_loop))
    out_loop = loop.apply(p_loop, x, ts, ctx)
    out_scan = scan.apply(p_conv, x, ts, ctx)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               rtol=2e-5, atol=2e-5)
