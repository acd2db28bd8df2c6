#!/usr/bin/env python
"""Per-block FLOP counts for the DC UNet3D at the protocol shape (16f
1024x576 -> latent 72x128) via XLA cost analysis on the CPU lowering.

Companion to tools/bench_dc_blocks.py: pairing its measured per-block
wall-clock with these FLOP counts gives per-block MXU utilization, so the
33%-MFU full-forward gap (tools/flops_dc_unet.py) can be attributed to
specific block families instead of guessed at.

Reference protocol shape: configs/dynamicrafter/MotionRAG_open.yml:166-171.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from motionrag_tpu.models.dynamicrafter.unet3d import (
    LVDMResBlock, SpatialTransformer3D, TemporalTransformer3D)

dtype = jnp.bfloat16
t = 16
levels = [(320, 72, 128, 5), (640, 36, 64, 10),
          (1280, 18, 32, 20), (1280, 9, 16, 20)]
ctx_c, temb = 1024, 1280

key = jax.random.key(0)
out = {}
for li, (c, h, w, heads) in enumerate(levels):
    x0 = jnp.zeros((t, h, w, c), dtype)
    emb = jnp.zeros((t, temb), dtype)
    ctx_bt = {"prompt": jnp.zeros((t, 77, ctx_c), dtype),
              "image": jnp.zeros((t, t * 16, ctx_c), dtype)}

    res = LVDMResBlock(c, temb, temporal_conv=True, dtype=dtype)
    p = jax.eval_shape(lambda: res.init(key, x0, emb, t))
    fl = jax.jit(lambda p, x, e: res.apply(p, x, e, t)).lower(
        p, x0, emb).cost_analysis().get("flops", float("nan"))
    out[f"L{li}_resblock_tconv_gflop"] = fl / 1e9

    spat = SpatialTransformer3D(c, heads, 64, ctx_c, image_branch=True, dtype=dtype)
    p = jax.eval_shape(lambda: spat.init(key, x0, context=ctx_bt))
    fl = jax.jit(lambda p, x: spat.apply(p, x, context=ctx_bt)).lower(
        p, x0).cost_analysis().get("flops", float("nan"))
    out[f"L{li}_spatial_xfmr_gflop"] = fl / 1e9

    temp = TemporalTransformer3D(c, heads, 64, dtype=dtype)
    p = jax.eval_shape(lambda: temp.init(key, x0, t))
    fl = jax.jit(lambda p, x: temp.apply(p, x, t)).lower(
        p, x0).cost_analysis().get("flops", float("nan"))
    out[f"L{li}_temporal_xfmr_gflop"] = fl / 1e9
    print(f"L{li} (c={c} {h}x{w}): res={out[f'L{li}_resblock_tconv_gflop']:.1f} "
          f"spat={out[f'L{li}_spatial_xfmr_gflop']:.1f} "
          f"temp={out[f'L{li}_temporal_xfmr_gflop']:.1f} GFLOP",
          file=sys.stderr, flush=True)

# same block-count accounting as bench_dc_blocks.py
acct = 0.0
for li, mult in ((0, 5), (1, 5), (2, 5), (3, 7)):
    acct += mult * out[f"L{li}_resblock_tconv_gflop"]
for li, mult in ((0, 5), (1, 5), (2, 5), (3, 1)):
    acct += mult * (out[f"L{li}_spatial_xfmr_gflop"]
                    + out[f"L{li}_temporal_xfmr_gflop"])
out["accounted_blocks_gflop"] = acct
print(json.dumps({k: round(v, 2) for k, v in out.items()}))
