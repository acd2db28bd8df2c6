#!/usr/bin/env python
"""DynamiCrafter end-to-end benchmark at the reference's published protocol.

Reference `configs/dynamicrafter/MotionRAG_open.yml:166-171`: 16 frames,
1024x576, 30 DDIM steps, unconditional_guidance_scale 2.0, frame_stride 15,
zero-terminal-SNR + dynamic rescale, per-frame VAE decode. The published
wall-clock for this workload is 87.6 s/video (89.4 s with RAG; reference
README.md:49-50, A100-class hardware).

Timing follows the axon-tunnel rules (CLAUDE.md): distinct inputs per run,
completion forced via a scalar checksum fetch.

Usage: python tools/bench_dynamicrafter.py [--small] [--steps N] [--cfg-mode batched|sequential]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import make_params_from_shapes  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cfg-mode", default="sequential", choices=["sequential", "batched"])
    ap.add_argument("--quantize", choices=["int8"], default=None,
                    help="int8 W8A8 UNet serving (ops/quant.py) — reported "
                    "separately, never as the exact-protocol headline")
    ap.add_argument("--cache-threshold", type=float, default=0.0,
                    help="adaptive output caching; 0 = exact protocol")
    ap.add_argument("--qk-int8", action="store_true",
                    help="SageAttention-style int8 QK in the flash kernel "
                    "(MRT_FLASH_QK_INT8) — serving mode, reported separately")
    args = ap.parse_args()
    if args.qk_int8:
        import os as _os
        _os.environ["MRT_FLASH_QK_INT8"] = "1"

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from motionrag_tpu.models.dynamicrafter.module import DynamiCrafterModule
    from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D
    from motionrag_tpu.models.dynamicrafter.vae import AutoencoderKL2D
    from motionrag_tpu.models.encoders.clip_text import CLIPTextEncoder
    from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder
    from motionrag_tpu.models.resampler import Resampler

    dtype = jnp.bfloat16
    if args.small:
        h, w, f, steps = 64, 64, 4, 2
        module = DynamiCrafterModule(
            unet=UNet3D(model_channels=32, channel_mult=(1, 2), num_head_channels=16,
                        context_dim=64, dtype=dtype),
            vae=AutoencoderKL2D(block_out_channels=(32, 32, 32, 32), dtype=dtype),
            text_encoder=CLIPTextEncoder(dim=64, depth=2, heads=2, dtype=dtype),
            image_encoder=CLIPImageEmbedder(image_size=64, patch_size=32, dim=64,
                                            depth=1, heads=2, pooled=False, dtype=dtype),
            image_proj=Resampler(dim=64, depth=1, dim_head=16, heads=4, num_queries=4,
                                 embedding_dim=64, output_dim=64, video_length=4, dtype=dtype),
            dtype=dtype,
        )
    else:
        h, w, f, steps = 576, 1024, 16, args.steps
        module = DynamiCrafterModule(  # DynamiCrafter_1024 scale
            dtype=dtype, cfg_mode=args.cfg_mode, quantize=args.quantize,
            cache_threshold=args.cache_threshold,
        )

    batch = {
        "video": jnp.zeros((1, f, 3, h, w), dtype),
        "prompt_ids": jnp.zeros((1, 77), jnp.int32),
    }

    t0 = time.time()
    # bf16 params: fp32 (5.8 GB for the DC stack) plus the 31-step sampler's
    # activations and executables exceed 16 GB HBM (both dc_int8 and
    # dc_batched OOMed eagerly with native-dtype params; bench.py's DC phase
    # always materialized bf16)
    params = jax.device_put(make_params_from_shapes(
        lambda: module.init_params(jax.random.key(0), batch),
        dtype=jnp.bfloat16))
    jax.block_until_ready(params)
    print(f"params materialized in {time.time()-t0:.1f}s", file=sys.stderr)

    def run(seed):
        out = module.eval_pipeline(
            params, batch, jax.random.key(seed),
            num_frames=f, height=h, width=w, ddim_steps=steps,
            unconditional_guidance_scale=2.0, fs=15,
        )
        return float(jnp.mean(out.astype(jnp.float32)))

    t0 = time.time()
    for attempt in range(3):
        try:
            run(attempt * 100)
            break
        except Exception as e:  # noqa: BLE001
            print(f"compile attempt {attempt} failed: {str(e)[:300]}", file=sys.stderr)
            if attempt == 2:
                raise
    print(f"first run (incl compile): {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(1, 3):
        t0 = time.time()
        run(i)
        times.append(time.time() - t0)
    best = min(times)
    mode = ""
    if args.quantize:
        mode += f" [{args.quantize} serving]"
    if args.qk_int8:
        mode += " [qk_int8]"
    if args.cache_threshold:
        mode += f" [cache_threshold={args.cache_threshold}]"
    print(json.dumps({
        "metric": "DynamiCrafter 16f 1024x576 30-step s/video" + mode,
        "value": round(best, 2),
        "unit": "s/video",
        "vs_baseline": round(87.6 / best, 3),
        "runs": [round(t, 2) for t in times],
    }))


if __name__ == "__main__":
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.tpu_lock import tpu_lock

    with tpu_lock():
        main()
