#!/usr/bin/env python
"""Per-component attribution of the DC UNet's ``init_attn`` block
(VERDICT r4 #5: 35.4 ms/forward claimed 'architecturally fixed' — prove or
break that). The block is a full-res temporal transformer: tokens =
72x128 spatial positions x 16 frames = 147,456; inner = 512 over c = 320;
per-forward GEMM work ~1.65 TFLOP, so 35.4 ms is only ~46 TFLOP/s — far
under the ~180 TFLOP/s these GEMM shapes sustain (docs/benchmarks.md int8
table, bf16 column). Components timed with the in-launch scan-differencing
harness (overhead-cancelled, tools/bench_attn.py method):

  full        the real TemporalTransformer3D (what the UNet runs)
  gemms       the 4 projection GEMMs + GEGLU FF on the same token count
  attn        the two packed small-seq attentions alone
  norms       GroupNorm (time-spanning) + the 3 fp32 LayerNorms
  reshapes    the [b,t,h,w,c] <-> [(b h w), t, c] transposes + residual add

Usage: python tools/bench_init_attn.py [--small] [--iters 4]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import flax.linen as nn

    from motionrag_tpu.models.dynamicrafter.unet3d import (
        GEGLUFeedForward, LVDMCrossAttention, TemporalTransformer3D)
    from motionrag_tpu.ops.norms import group_norm

    dtype = jnp.bfloat16
    if args.small:
        t, h, w, c, heads = 2, 8, 8, 32, 2
    else:
        t, h, w, c, heads = 16, 72, 128, 320, 8
    inner = heads * 64
    key = jax.random.key(0)
    n_small, n_large = args.iters, 3 * args.iters

    def timeit(apply_fn, params, shape):
        @jax.jit
        def scan_fn(p, xs):
            def body(acc, x):
                return acc + jnp.sum(apply_fn(p, x).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
            return acc

        def run(count, salt):
            xs = jax.random.normal(jax.random.key(salt), (count,) + shape, dtype)
            jax.block_until_ready(xs)
            t0 = time.time()
            float(scan_fn(params, xs))
            return time.time() - t0

        run(n_small, 1)
        run(n_large, 2)
        t_s = run(n_small, 3)
        t_l = run(n_large, 4)
        return 1e3 * max(t_l - t_s, 1e-9) / (n_large - n_small)

    results = {}

    # full block
    full = TemporalTransformer3D(c, heads, 64, dtype=dtype)
    p = full.init(key, jnp.zeros((t, h, w, c), dtype), t)
    results["full_ms"] = timeit(lambda p, x: full.apply(p, x, t), p, (t, h, w, c))

    # GEMMs only: proj_in + 4 attn projections x2 + GEGLU FF + proj_out on
    # the same [(h w), t, *] token layout
    class _Gemms(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Dense(inner, dtype=dtype, name="proj_in")(x)
            for i in range(8):  # 2 attns x (q, k, v, out)
                y = nn.Dense(inner, use_bias=(i % 4 == 3), dtype=dtype,
                             name=f"d{i}")(y)
            y = GEGLUFeedForward(inner, dtype=dtype, name="ff")(y)
            return nn.Dense(c, dtype=dtype, name="proj_out")(y)

    gm = _Gemms()
    p = gm.init(key, jnp.zeros((h * w, t, c), dtype))
    results["gemms_ms"] = timeit(lambda p, x: gm.apply(p, x), p, (h * w, t, c))

    # attention only (the packed small-seq path), two rounds like the block
    class _Attn(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = LVDMCrossAttention(inner, None, heads, 64, dtype=dtype,
                                   name="a1")(x)
            return LVDMCrossAttention(inner, None, heads, 64, dtype=dtype,
                                      name="a2")(x)

    at = _Attn()
    p = at.init(key, jnp.zeros((h * w, t, inner), dtype))
    results["attn_ms"] = timeit(lambda p, x: at.apply(p, x), p, (h * w, t, inner))

    # norms only: the time-spanning GroupNorm + 3 LayerNorms
    class _Norms(nn.Module):
        @nn.compact
        def __call__(self, x):
            s = self.param("s", nn.initializers.ones, (c,))
            b_ = self.param("b", nn.initializers.zeros, (c,))
            y = group_norm(x[None], 32, s, b_, eps=1e-6)[0]
            y = y.reshape(t * h * w, c)
            pad = nn.Dense(inner, dtype=dtype, name="widen")(y)  # carrier
            for i in range(3):
                pad = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=f"ln{i}")(pad)
            return pad

    nm = _Norms()
    p = nm.init(key, jnp.zeros((t, h, w, c), dtype))
    results["norms_ms"] = timeit(lambda p, x: nm.apply(p, x), p, (t, h, w, c))

    # reshapes/transposes + residual
    def reshaper(_, x):
        y = x.reshape(1, t, h * w, c).transpose(0, 2, 1, 3)
        y = y.reshape(h * w, t, c) * 1.0001
        y = y.reshape(1, h * w, t, c).transpose(0, 2, 1, 3).reshape(t, h, w, c)
        return y + x

    results["reshapes_ms"] = timeit(reshaper, {}, (t, h, w, c))

    results = {k: round(v, 2) for k, v in results.items()}
    results["accounted_ms"] = round(
        results["gemms_ms"] + results["attn_ms"] + results["norms_ms"]
        + results["reshapes_ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.tpu_lock import tpu_lock

    with tpu_lock():
        main()
