#!/usr/bin/env python
"""Headline benchmark: end-to-end SVD 25-frame 576x1024 image-to-video on one
TPU chip, plus the RAG retrieval + CAMA overhead (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": <sec/video>, "unit": "s/video", "vs_baseline": R}

``vs_baseline`` is the speedup factor (reference_seconds / ours) against the
closest published per-video wall-clock: 59.4 s/video (CogVideoX on the
reference's 8-GPU A100 setup, README.md:47 — no SVD time is published;
BASELINE.md). Weights are random (timing does not depend on values); shapes,
step counts, and the CFG batch-2 denoise loop match the reference protocol
(25 inference steps, 25 frames, 576x1024, reference ``configs/svd``).

Run with --small for a quick CPU smoke test.
"""

import argparse
import json
import sys
import time

import numpy as np


def make_params_from_shapes(module_init_fn, scale=0.02, seed=0):
    """Build a param tree from eval_shape with small constant values —
    avoids a full fp32 init of billions of parameters (wall-clock timing is
    value-independent on TPU; no denormal/branch effects)."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(module_init_fn)

    def mk(s):
        return jnp.full(s.shape, scale, jax.dtypes.canonicalize_dtype(s.dtype))

    return jax.tree.map(mk, shapes)


def bench_svd(small: bool):
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder
    from motionrag_tpu.models.svd.pipeline import SVDPipeline
    from motionrag_tpu.models.svd.unet import UNetSpatioTemporal
    from motionrag_tpu.models.svd.vae import AutoencoderKLTemporalDecoder

    dtype = jnp.bfloat16
    if small:
        height, width, num_frames, steps = 64, 64, 4, 2
        unet = UNetSpatioTemporal(
            block_out_channels=(32, 64, 64, 64), layers_per_block=1,
            cross_attention_dim=48, num_attention_heads=(1, 2, 2, 2), dtype=dtype,
        )
        vae = AutoencoderKLTemporalDecoder(block_out_channels=(32, 32, 32, 32), dtype=dtype)
        clip = CLIPImageEmbedder(image_size=28, patch_size=14, dim=32, depth=1,
                                 heads=2, projection_dim=48, dtype=dtype)
    else:
        height, width, num_frames, steps = 576, 1024, 25, 25
        unet = UNetSpatioTemporal(dtype=dtype)  # full SVD scale
        vae = AutoencoderKLTemporalDecoder(dtype=dtype)
        clip = CLIPImageEmbedder(dtype=dtype)  # ViT-H/14

    pipe = SVDPipeline(unet, vae, clip, dtype=dtype)

    b = 1
    image = jnp.zeros((b, 3, height, width), dtype)

    def init_all():
        r = jax.random.key(0)
        sample = jnp.zeros((b, num_frames, height // 8, width // 8, 8), dtype)
        ctx = jnp.zeros((b, 1, unet.cross_attention_dim), dtype)
        ids = jnp.zeros((b, 3), jnp.float32)
        frames_nhwc = jnp.zeros((1, height, width, 3), dtype)
        return {
            "unet": unet.init(r, sample, jnp.zeros((b,)), ctx, ids),
            "vae": vae.init(r, frames_nhwc, 1),
            "image_encoder": clip.init(r, image),
        }

    t0 = time.time()
    params = make_params_from_shapes(init_all)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    init_s = time.time() - t0

    # Timing through the axon tunnel: block_until_ready can return before the
    # remote execution completes and identical executions are de-duped, so
    # every timed run uses a distinct seed and forces completion by fetching
    # a scalar checksum of the frames (a full 88MB frame fetch would measure
    # the tunnel's ~4MB/s link, not the TPU — on a real host the DMA to CPU
    # is negligible).
    import jax.numpy as jnp

    def run(seed):
        out = pipe(
            params, image, jax.random.key(seed),
            num_frames=num_frames, height=height, width=width,
            num_inference_steps=steps, decode_chunk_size=8,
        )
        return float(jnp.mean(out.astype(jnp.float32)))

    t0 = time.time()
    for attempt in range(3):
        try:
            run(attempt * 100)
            break
        except Exception as e:  # noqa: BLE001
            # the remote compile service is flaky on very large modules;
            # the persistent cache makes retries cheap
            print(f"compile attempt {attempt} failed: {str(e)[:200]}", file=sys.stderr)
            if attempt == 2:
                raise
    compile_s = time.time() - t0

    t0 = time.time()
    run(1)
    run_s = time.time() - t0
    return {"svd_s_per_video": run_s, "compile_s": compile_s, "init_s": init_s}


def bench_rag_cama(small: bool):
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.cama import ActionTransformer, SinusoidPositionalEmbeddings
    from motionrag_tpu.models.encoders.condition import DINOImageEmbedder, VideoMAEEmbedder
    from motionrag_tpu.models.layers import TransformerEncoder
    from motionrag_tpu.models.resampler import Resampler
    from motionrag_tpu.rag.index import _chunked_topk

    dtype = jnp.bfloat16
    if small:
        n_rows, dim, k = 10_000, 64, 3
        vm = VideoMAEEmbedder(num_frames=4, image_size=32, dim=32, depth=1, heads=2, dtype=dtype)
        dino = DINOImageEmbedder(image_size=28, dim=32, depth=1, heads=2, dtype=dtype)
        rs = lambda ed: Resampler(dim=64, depth=1, dim_head=16, heads=4, num_queries=4,
                                  embedding_dim=ed, output_dim=64)
        ct_trans = TransformerEncoder(num_layers=1, d_model=64, nhead=4, dim_feedforward=128)
        frames = 4
    else:
        n_rows, dim, k = 1_000_000, 768, 9  # OpenVid-1M scale, ref_video_num=9
        vm = VideoMAEEmbedder(dtype=dtype)  # VideoMAE-base, 1568 tokens
        dino = DINOImageEmbedder(dtype=dtype)  # DINOv2-large
        rs = lambda ed: Resampler(dim=1024, depth=4, dim_head=64, heads=12,
                                  num_queries=25, embedding_dim=ed, output_dim=1024)
        ct_trans = TransformerEncoder(num_layers=4, d_model=1024, nhead=16, dim_feedforward=4096)
        frames = 16

    # --- RAG: exact GEMM top-k over HBM-resident embeddings ---------------
    rng = np.random.default_rng(0)
    chunk = min(131072, n_rows)
    n_chunks = (n_rows + chunk - 1) // chunk
    emb = jnp.asarray(
        rng.standard_normal((n_chunks, chunk, dim), dtype=np.float32).astype(np.float16)
    )
    row_ids = jnp.asarray(
        np.arange(n_chunks * chunk, dtype=np.int32).reshape(n_chunks, chunk) % 50000
    )
    q1 = jnp.asarray(rng.standard_normal((1, dim), dtype=np.float32))
    q2 = jnp.asarray(rng.standard_normal((1, dim), dtype=np.float32))
    ex = jnp.asarray([3], np.int32)

    # distinct query + scalar fetch: the tunnel de-dupes identical executions
    fetch = lambda t: float(jnp.sum(t[0].astype(jnp.float32)))
    fetch(_chunked_topk(q1, emb, row_ids, ex, k + 3))
    t0 = time.time()
    fetch(_chunked_topk(q2, emb, row_ids, ex, k + 3))
    rag_s = time.time() - t0

    # --- CAMA: VideoMAE x(K+1) + DINO x(K+1) + CT forward -----------------
    out_dim = 64 if small else 1024
    ct = ActionTransformer(
        vision_model=vm, vision_proj=rs(vm.dim),
        condition_model=dino, condition_proj=rs(dino.dim),
        transformer=ct_trans,
        vision_pe=SinusoidPositionalEmbeddings(out_dim, 2560),
        condition_pe=SinusoidPositionalEmbeddings(out_dim, 2560),
    )
    size = 64 if small else 224

    def make_batch(seed):
        key = jax.random.key(seed)
        return {
            "ref_videos": jax.random.uniform(
                key, (1, k, frames, 3, size, size), dtype, -1, 1
            ),
            "video": jax.random.uniform(key, (1, frames, 3, size, size), dtype, -1, 1),
        }

    batch = make_batch(0)

    def ct_init():
        videos = jnp.concatenate([batch["ref_videos"], batch["video"][:, None]], axis=1)
        return ct.init(jax.random.key(0), videos, videos[:, :, 0])

    ct_params = jax.device_put(make_params_from_shapes(ct_init))

    predict = jax.jit(
        lambda p, b: jnp.mean(ct.apply(p, b, True, method="predict").astype(jnp.float32))
    )
    float(predict(ct_params, batch))  # compile
    t0 = time.time()
    float(predict(ct_params, make_batch(1)))
    cama_s = time.time() - t0
    return {"rag_s": rag_s, "cama_s": cama_s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="tiny CPU smoke sizes")
    args = ap.parse_args()

    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: the big UNet sampler compile (~13 min on
    # the tunneled v5e) is paid once and reused across bench runs
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # noqa: BLE001
        pass

    import gc

    detail = {}
    # SVD first: its sampler needs nearly all of HBM; the RAG/CAMA phase's
    # device residents (1M-row index, encoder params) would otherwise
    # fragment memory under the 16GB budget
    try:
        detail.update(bench_svd(args.small))
    except Exception as e:  # noqa: BLE001
        print(f"svd bench failed: {e}", file=sys.stderr)
        detail.update({"svd_s_per_video": float("nan")})
    gc.collect()
    try:
        detail.update(bench_rag_cama(args.small))
    except Exception as e:  # noqa: BLE001
        print(f"rag/cama bench failed: {e}", file=sys.stderr)
        detail.update({"rag_s": float("nan"), "cama_s": float("nan")})

    total = detail["svd_s_per_video"] + np.nan_to_num(detail.get("rag_s", 0.0)) + np.nan_to_num(
        detail.get("cama_s", 0.0)
    )
    baseline = 59.4  # closest published per-video time (README.md:47)
    print(json.dumps({
        "metric": "sec/video end-to-end I2V (SVD 25f 576x1024) + RAG retrieval/CAMA overhead sec",
        "value": round(float(total), 3),
        "unit": "s/video",
        "vs_baseline": round(baseline / total, 3) if np.isfinite(total) and total > 0 else None,
    }))
    print(json.dumps({"detail": {k: round(float(v), 3) for k, v in detail.items()}}), file=sys.stderr)


if __name__ == "__main__":
    main()
