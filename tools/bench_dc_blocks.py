#!/usr/bin/env python
"""Per-block wall-clock of the DC UNet3D at the protocol shape (16f
1024x576 -> latent 72x128), on one TPU chip.

Motivation: the 31-step dual-CFG sampler measures 49.4 s/video = ~0.80 s
per UNet forward, but XLA cost analysis puts the forward at 52.1 TFLOP
(tools/flops_dc_unet.py) — only ~33% of v5e bf16 peak. This tool times the
constituent blocks in isolation (per level: LVDMResBlock incl. 4-stage
temporal conv, SpatialTransformer3D with the real cross-attn context,
TemporalTransformer3D) plus a full UNet forward in the same process, so the
gap can be attributed and attacked.

Timing per the tunnel rules: each block scans a stack of DISTINCT inputs
inside one launch; per-iteration time is the difference between a large
and a small stack (constant ~43 ms launch overhead cancels). The fused
GroupNorm context (ops.norms.pallas_norms) is active, as in the real
inference pipelines.

Usage: python tools/bench_dc_blocks.py [--small]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def _tick(msg):
    # replaced by the watchdog-feeding tick on real-TPU runs (see main)
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="tiny CPU smoke run")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the full-forward ground truth (it compiles "
                    "the whole UNet)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    else:
        # relay-death protection (ADVICE r4): same stale-progress watchdog
        # as bench.py / bench_cogvideox.py — per-level ticks feed it below
        import os as _os

        from tools.tpu_lock import start_watchdog
        globals()["_tick"] = start_watchdog(
            float(_os.environ.get("MRT_WATCHDOG_S", 1500)))
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from motionrag_tpu.models.dynamicrafter.unet3d import (
        LVDMResBlock, SpatialTransformer3D, TemporalTransformer3D, UNet3D)
    from motionrag_tpu.ops.norms import pallas_norms

    dtype = jnp.bfloat16
    if args.small:
        t, lh, lw = 2, 8, 8
        levels = [(32, 8, 8, 2)]
        ctx_c, temb = 64, 128
    else:
        t, lh, lw = 16, 72, 128
        # (channels, latent_h, latent_w, heads) per UNet level at DC-1024
        levels = [(320, 72, 128, 5), (640, 36, 64, 10),
                  (1280, 18, 32, 20), (1280, 9, 16, 20)]
        ctx_c, temb = 1024, 1280

    n_small, n_large = args.iters, 3 * args.iters

    def timeit(apply_fn, params, make_x, extra=()):
        @jax.jit
        def scan_fn(p, xs, *ex):
            def body(acc, x):
                with pallas_norms():
                    y = apply_fn(p, x, *ex)
                return acc + jnp.sum(y.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
            return acc

        def run(count, salt):
            xs = make_x(count, salt)
            jax.block_until_ready(xs)
            t0 = time.time()
            float(scan_fn(params, xs, *extra))
            return time.time() - t0

        run(n_small, 1)
        run(n_large, 2)
        t_s = run(n_small, 3)
        t_l = run(n_large, 4)
        return max(t_l - t_s, 1e-9) / (n_large - n_small)

    results = {}
    key = jax.random.key(0)

    for li, (c, h, w, heads) in enumerate(levels):
        def mk(count, salt, c=c, h=h, w=w):
            return jax.random.normal(
                jax.random.key(salt), (count, t, h, w, c), dtype)

        x0 = jnp.zeros((t, h, w, c), dtype)
        emb = jax.random.normal(key, (t, temb), dtype)
        ctx = {"prompt": jax.random.normal(key, (1, 77, ctx_c), dtype),
               "image": jax.random.normal(key, (1, t * 16, ctx_c), dtype)}
        ctx_bt = {k: jnp.broadcast_to(v, (t,) + v.shape[1:]) for k, v in ctx.items()}

        res = LVDMResBlock(c, temb, temporal_conv=True, dtype=dtype)
        p = res.init(key, x0, emb, t)
        results[f"L{li}_resblock_tconv_ms"] = 1e3 * timeit(
            lambda p, x, emb: res.apply(p, x, emb, t), p, mk, (emb,))

        spat = SpatialTransformer3D(c, heads, 64, ctx_c, image_branch=True,
                                    dtype=dtype)
        p = spat.init(key, x0, context=ctx_bt)
        results[f"L{li}_spatial_xfmr_ms"] = 1e3 * timeit(
            lambda p, x: spat.apply(p, x, context=ctx_bt), p, mk)

        temp = TemporalTransformer3D(c, heads, 64, dtype=dtype)
        p = temp.init(key, x0, t)
        results[f"L{li}_temporal_xfmr_ms"] = 1e3 * timeit(
            lambda p, x: temp.apply(p, x, t), p, mk)
        _tick(f"L{li} (c={c} {h}x{w}): "
              + ", ".join(f"{k.split('_', 1)[1]}={results[f'L{li}_{k.split(chr(95), 1)[1]}']:.1f}"
                          for k in (f"L{li}_resblock_tconv_ms",
                                    f"L{li}_spatial_xfmr_ms",
                                    f"L{li}_temporal_xfmr_ms")))

    # ---- glue: everything the per-level block table does NOT cover -------
    # (VERDICT r3 #7: ~94 ms/forward unaccounted). init_attn runs at FULL
    # resolution with inner=512 over 320 channels — the single biggest
    # suspect; then the down/up-sample convs and the in/out convs.
    import flax.linen as nn

    ch0 = levels[0][0]
    h0g, w0g = levels[0][1], levels[0][2]

    init_attn = TemporalTransformer3D(ch0, 8 if not args.small else 2, 64,
                                      dtype=dtype)
    p = init_attn.init(key, jnp.zeros((t, h0g, w0g, ch0), dtype), t)
    results["init_attn_ms"] = 1e3 * timeit(
        lambda p, x: init_attn.apply(p, x, t), p,
        lambda n, s: jax.random.normal(jax.random.key(s), (n, t, h0g, w0g, ch0), dtype))

    conv_in = nn.Conv(ch0, (3, 3), padding=1, dtype=dtype)
    cin = 8
    p = conv_in.init(key, jnp.zeros((t, h0g, w0g, cin), dtype))
    results["conv_in_ms"] = 1e3 * timeit(
        lambda p, x: conv_in.apply(p, x), p,
        lambda n, s: jax.random.normal(jax.random.key(s), (n, t, h0g, w0g, cin), dtype))

    glue_down = glue_up = 0.0
    for li in range(len(levels) - 1):
        c, h, w, _ = levels[li]
        down = nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       dtype=dtype)
        p = down.init(key, jnp.zeros((t, h, w, c), dtype))
        ms = 1e3 * timeit(
            lambda p, x: down.apply(p, x), p,
            lambda n, s, h=h, w=w, c=c: jax.random.normal(
                jax.random.key(s), (n, t, h, w, c), dtype))
        results[f"down{li}_ms"] = ms
        glue_down += ms

        cu, hu, wu, _ = levels[li + 1]
        from motionrag_tpu.models.diffusion_blocks import nearest_upsample_2x

        up = nn.Conv(cu, (3, 3), padding=1, dtype=dtype)
        p = up.init(key, jnp.zeros((t, hu * 2, wu * 2, cu), dtype))
        ms = 1e3 * timeit(
            lambda p, x: up.apply(p, nearest_upsample_2x(x)), p,
            lambda n, s, hu=hu, wu=wu, cu=cu: jax.random.normal(
                jax.random.key(s), (n, t, hu, wu, cu), dtype))
        results[f"up{li + 1}_ms"] = ms
        glue_up += ms

    out_conv = nn.Conv(4, (3, 3), padding=1, dtype=dtype)
    p = out_conv.init(key, jnp.zeros((t, h0g, w0g, ch0), dtype))
    from motionrag_tpu.ops.norms import group_norm as _gn

    sc = jnp.ones((ch0,)); bi = jnp.zeros((ch0,))
    results["out_norm_conv_ms"] = 1e3 * timeit(
        lambda p, x: out_conv.apply(p, _gn(x, 32, sc, bi, act="silu")), p,
        lambda n, s: jax.random.normal(jax.random.key(s), (n, t, h0g, w0g, ch0), dtype))

    results["glue_total_ms"] = (results["init_attn_ms"] + results["conv_in_ms"]
                                + glue_down + glue_up
                                + results["out_norm_conv_ms"])
    _tick(f"glue: init_attn={results['init_attn_ms']:.1f} "
          f"conv_in={results['conv_in_ms']:.1f} down={glue_down:.1f} "
          f"up={glue_up:.1f} out={results['out_norm_conv_ms']:.1f} "
          f"total={results['glue_total_ms']:.1f}")

    if not args.skip_full:
        unet = UNet3D(dtype=dtype) if not args.small else UNet3D(
            model_channels=32, channel_mult=(1, 2), num_head_channels=16,
            context_dim=64, dtype=dtype)
        c0, h0, w0 = (8, lh, lw)
        x0 = jnp.zeros((1, t, h0, w0, c0), dtype)
        tz = jnp.zeros((1,), jnp.int32)
        ctx1 = {"prompt": jax.random.normal(key, (1, 77, ctx_c), dtype),
                "image": jax.random.normal(key, (1, t * 16, ctx_c), dtype)}
        p = jax.eval_shape(lambda: unet.init(key, x0, tz, ctx1, tz))
        p = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, dtype), p)

        # direct repeated calls (one compile; the ~43 ms launch overhead is
        # ~5% of a 0.8 s forward — acceptable for the ground-truth anchor)
        @jax.jit
        def fwd(p, x):
            with pallas_norms():
                return jnp.sum(unet.apply(p, x, tz, ctx1, tz).astype(jnp.float32))

        def mk1(salt):
            return jax.random.normal(jax.random.key(salt), (1, t, h0, w0, c0), dtype)

        float(fwd(p, mk1(0)))  # compile
        t0 = time.time()
        reps = 4
        for i in range(1, reps + 1):
            float(fwd(p, mk1(i)))
        results["full_forward_ms"] = 1e3 * (time.time() - t0) / reps
        _tick(f"full forward: {results['full_forward_ms']:.1f} ms")

    # accounting at DC-1024 structure: down 2 / up 3 blocks per level
    # (+1 middle pair at L3); transformers at levels 0-2 and middle
    if not args.small:
        acct = 0.0
        for li, mult in ((0, 5), (1, 5), (2, 5), (3, 7)):
            acct += mult * results[f"L{li}_resblock_tconv_ms"]
        for li, mult in ((0, 5), (1, 5), (2, 5), (3, 1)):
            acct += mult * (results[f"L{li}_spatial_xfmr_ms"]
                            + results[f"L{li}_temporal_xfmr_ms"])
        results["accounted_blocks_ms"] = acct

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.tpu_lock import tpu_lock

    with tpu_lock():
        main()
