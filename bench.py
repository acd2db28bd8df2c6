#!/usr/bin/env python
"""Headline benchmark: end-to-end DynamiCrafter image-to-video at the
reference's published eval protocol — 16 frames, 1024x576, 30 DDIM steps,
CFG 2.0 (reference ``configs/dynamicrafter/MotionRAG_open.yml:166-171``) —
plus the RAG retrieval + CAMA adaptation overhead.

Prints ONE JSON line:
  {"metric": ..., "value": <sec/video>, "unit": "s/video", "vs_baseline": R}

``vs_baseline`` = reference_seconds / ours against the reference's own
published number for this exact workload *with* RAG: 89.4 s/video
(87.6 s base + 1.8 s RAG overhead, reference ``README.md:49-50``,
A100-class hardware; BASELINE.md). Weights are random (wall-clock is
value-independent); shapes, step counts, and sampler numerics
(zero-terminal-SNR, dynamic rescale, v-param) match the reference protocol.

If budget remains after the DynamiCrafter headline, a SECOND JSON line
reports CogVideoX-5B-I2V at its exact eval protocol (17f 480x720, 25
DPM-Solver++(SDE) steps, guidance 3 — reference
``configs/cogvideox/MotionRAG_open.yml`` + wrapper defaults) end-to-end
INCLUDING the same measured RAG retrieval + CAMA overhead, against the
reference's published MotionRAG row: **63.0 s/video with RAG**
(``/root/reference/README.md:48``; 59.4 s without, README.md:47).

``--svd`` additionally measures SVD at the reference protocol shape
(16f 576x1024, 25 Euler steps + CFG);
the reference publishes no SVD wall-clock, so it is detail-only.
Run with --small for a quick CPU smoke test.
"""

import argparse
import json
import sys
import time

import numpy as np


def make_params_from_shapes(module_init_fn, scale=0.02, seed=0, dtype=None):
    """Build a param tree from eval_shape with small constant values —
    avoids a full fp32 init of billions of parameters (wall-clock timing is
    value-independent on TPU; no denormal/branch effects). ``dtype``
    overrides the param dtype (bf16 halves the HBM footprint; inference
    computes in bf16 anyway)."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(module_init_fn)

    def mk(s):
        return jnp.full(s.shape, scale, dtype or jax.dtypes.canonicalize_dtype(s.dtype))

    # ONE jitted launch for the whole tree: per-leaf jnp.full dispatches a
    # separate device call through the tunnel (~43 ms x ~1000 leaves = most
    # of the old 51 s init phase)
    return jax.jit(lambda: jax.tree.map(mk, shapes))()


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
        # the reference SVD protocol generates 16 frames
        # (configs/svd/MotionRAG_open.yml:145-149), 25 Euler steps default
        height, width, num_frames, steps = 576, 1024, 16, 25
        unet = UNetSpatioTemporal(dtype=dtype)  # full SVD scale
        vae = AutoencoderKLTemporalDecoder(dtype=dtype)
        clip = CLIPImageEmbedder(dtype=dtype)  # ViT-H/14

    # MRT_QUANTIZE=int8 measures the opt-in W8A8 serving mode (ops/quant.py)
    quantize = __import__("os").environ.get("MRT_QUANTIZE") or None
    pipe = SVDPipeline(unet, vae, clip, dtype=dtype, quantize=quantize)

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
    # bf16 params: the 1.52B-param UNet in fp32 (6.1 GB) plus the f=25
    # sampler activations exceeds 16 GB HBM
    params = make_params_from_shapes(init_all, dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    if quantize:
        from motionrag_tpu.models.svd.module import svd_quant_patterns
        from motionrag_tpu.ops.quant import quantize_dense_tree_lowmem

        include, exclude = svd_quant_patterns()
        params["unet"] = quantize_dense_tree_lowmem(
            params["unet"], include=include, exclude=exclude)
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
    for attempt in range(2):
        try:
            run(attempt * 100)
            break
        except Exception as e:  # noqa: BLE001
            # the remote compile service is flaky on very large modules;
            # the persistent cache makes retries cheap
            print(f"compile attempt {attempt} failed: {str(e)[:200]}", file=sys.stderr)
            if attempt == 1:
                raise
    compile_s = time.time() - t0

    t0 = time.time()
    run(1)
    run_s = time.time() - t0
    return {"svd_s_per_video": run_s, "compile_s": compile_s, "init_s": init_s}


def bench_dynamicrafter(small: bool):
    """Reference protocol: 16f 1024x576, 30 DDIM steps, CFG 2.0, fs=15
    (configs/dynamicrafter/MotionRAG_open.yml:166-171); sequential CFG +
    chunked per-frame VAE decode fit the 16GB-HBM chip."""
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.models.dynamicrafter.module import DynamiCrafterModule
    from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D
    from motionrag_tpu.models.dynamicrafter.vae import AutoencoderKL2D
    from motionrag_tpu.models.encoders.clip_text import CLIPTextEncoder
    from motionrag_tpu.models.encoders.condition import CLIPImageEmbedder
    from motionrag_tpu.models.resampler import Resampler

    dtype = jnp.bfloat16
    if small:
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
        h, w, f, steps = 576, 1024, 16, 30
        # MRT_CACHE_THRESHOLD > 0 measures the opt-in adaptive-caching mode
        # (models/sampler_cache.py); MRT_QUANTIZE=int8 the W8A8 serving mode
        # (ops/quant.py); the default headline stays exact bf16
        env = __import__("os").environ
        module = DynamiCrafterModule(
            # scan_blocks measured cache-cold on the tunnel (r4): compile
            # 522.9 s scanned vs 502.3 s unrolled (s7) — the wall-compile is
            # NOT HLO-size-bound here — while runtime cost 41.37 vs 40.10
            # s/video (~19 ms/forward of stacked-weight slicing). Unrolled
            # is therefore the bench default; scan stays for TRAINING,
            # where the fused fwd+bwd HLO is what blows the remote compile
            # service (1115 s / killed-at-30-min, docs/benchmarks.md).
            # MRT_SCAN_UNET=1 re-enables for experiments.
            unet=UNet3D(scan_blocks=env.get("MRT_SCAN_UNET", "0") == "1",
                        dtype=dtype),
            dtype=dtype,
            cache_threshold=float(env.get("MRT_CACHE_THRESHOLD", 0)),
            quantize=env.get("MRT_QUANTIZE") or None,
        )  # DynamiCrafter_1024 scale

    batch = {
        "video": jnp.zeros((1, f, 3, h, w), dtype),
        "prompt_ids": jnp.zeros((1, 77), jnp.int32),
    }
    t0 = time.time()
    params = make_params_from_shapes(
        lambda: module.init_params(jax.random.key(0), batch), dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    init_s = time.time() - t0

    def run(seed):
        out = module.eval_pipeline(
            params, batch, jax.random.key(seed),
            num_frames=f, height=h, width=w, ddim_steps=steps,
            unconditional_guidance_scale=2.0, fs=15,
        )
        return float(jnp.mean(out.astype(jnp.float32)))

    t0 = time.time()
    for attempt in range(2):
        try:
            run(attempt * 100)
            break
        except Exception as e:  # noqa: BLE001
            print(f"dc compile attempt {attempt} failed: {str(e)[:200]}", file=sys.stderr)
            if attempt == 1:
                raise
    compile_s = time.time() - t0

    t0 = time.time()
    run(1)
    return {
        "dc_s_per_video": time.time() - t0,
        "dc_compile_s": compile_s,
        "dc_init_s": init_s,
    }


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
    # The 1M x 768 fp16 matrix (1.5 GB) is generated ON DEVICE: uploading it
    # through the ~4 MB/s axon tunnel took ~6 min and was the main reason the
    # round-1 driver bench timed out (BENCH_r01 rc=124). GEMM+top-k timing is
    # value-independent, so device-side RNG measures the same thing.
    rng = np.random.default_rng(0)
    chunk = min(131072, n_rows)
    n_chunks = (n_rows + chunk - 1) // chunk
    emb = jax.random.normal(
        jax.random.key(0), (n_chunks, chunk, dim), jnp.float16)
    row_ids = (
        jnp.arange(n_chunks * chunk, dtype=jnp.int32).reshape(n_chunks, chunk) % 50000
    )
    jax.block_until_ready((emb, row_ids))
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


_PHASES = {
    "dc": (bench_dynamicrafter, {"dc_s_per_video": float("nan")}),
    "svd": (bench_svd, {"svd_s_per_video": float("nan")}),
    "ragcama": (bench_rag_cama, {"rag_s": float("nan"), "cama_s": float("nan")}),
}


def _run_cog_subprocess(small: bool, timeout: float) -> dict:
    """CogVideoX exact-protocol e2e via ``tools/bench_cogvideox.py`` (which
    itself phases T5 / sampler / VAE-decode across fresh TPU-client
    processes — loaded sampler executables are only reclaimed at client
    teardown). Never imports jax here; the parent must not hold a TPU
    client while the phased children run. Returns the tool's parsed JSON
    result ({} on failure)."""
    import os
    import subprocess

    # scan-blocks DiT: measured same sampler speed, cold compile 59 s vs
    # 151 s unrolled (docs/benchmarks.md serving table) and numerically
    # identical (tests/test_dit_scan.py) — protects a cache-cold driver run
    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "bench_cogvideox.py"), "--scan-blocks"]
    if small:
        cmd.append("--small")
    env = dict(os.environ, MRT_TPU_LOCK_HELD="1",
               MRT_WATCHDOG_S=str(int(max(120, timeout))))
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, env=env)
    except subprocess.TimeoutExpired as e:
        sys.stderr.write((e.stderr or b"").decode() if isinstance(e.stderr, bytes)
                         else (e.stderr or ""))
        print(f"cog phase timed out after {timeout:.0f}s", file=sys.stderr)
        time.sleep(15)  # let a killed child release HBM (CLAUDE.md)
        return {}
    sys.stderr.write(proc.stderr)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            out = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(out, dict) and out.get("value") is not None \
                and isinstance(out.get("detail"), dict):
            return out
    print(f"cog phase produced no result JSON (exit {proc.returncode})",
          file=sys.stderr)
    return {}


def _run_phase_subprocess(phase: str, small: bool, timeout: float) -> dict:
    """Each phase runs in its own process: clean HBM (no cross-phase
    fragmentation — SVD after the DC sampler OOMs otherwise), and one
    phase's crash cannot poison the device for the rest. Phases run
    strictly sequentially (never two TPU processes at once)."""
    import subprocess

    import os

    cmd = [sys.executable, __file__, "--phase", phase]
    if small:
        cmd.append("--small")
    # the parent holds the cross-process TPU lock for the whole run; the
    # phase children must not try to take it again (flock would deadlock)
    env = dict(os.environ, MRT_TPU_LOCK_HELD="1")
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout,
                              env=env)
    except subprocess.TimeoutExpired as e:
        sys.stderr.write((e.stderr or b"").decode() if isinstance(e.stderr, bytes)
                         else (e.stderr or ""))
        print(f"phase {phase} timed out after {timeout:.0f}s", file=sys.stderr)
        # the killed child (or a forked grandchild) can hold HBM for a few
        # seconds after SIGKILL; launching the next TPU phase immediately
        # hangs it on co-tenancy (CLAUDE.md). Settle before returning.
        time.sleep(15)
        return dict(_PHASES[phase][1])
    sys.stderr.write(proc.stderr)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    print(f"phase {phase} produced no JSON (exit {proc.returncode})", file=sys.stderr)
    return dict(_PHASES[phase][1])


# The reference publishes +1.8 s/video RAG overhead (README.md:50); our
# measured overhead is ~0.2 s (RAG 32 ms + CAMA 144 ms, docs/benchmarks.md).
# When the deadline leaves no room to re-measure it, fold in a CONSERVATIVE
# 1.0 s (5x our measurement) so the headline never understates our time.
_FALLBACK_OVERHEAD_S = 1.0


def _tunnel_relay_alive(timeout_s: float = 3.0) -> bool:
    """Probe the axon tunnel relay (local TCP forward on 127.0.0.1:8082).
    The relay is a driver-attached process that can die mid-session; when it
    is down every jax device call blocks forever (no timeout surfaces), so a
    bench run would burn its whole budget hanging in backend init."""
    import socket

    try:
        with socket.create_connection(("127.0.0.1", 8082), timeout=timeout_s):
            return True
    except OSError:
        return False


def _restore_bench_cache():
    """Hardlink any git-tracked ``bench_cache/`` entries missing from the
    live ``.jax_cache`` (no-op when warm; same-FS links are free)."""
    import os

    snap = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_cache")
    cache = "/root/repo/.jax_cache"
    if not os.path.isdir(snap):
        return
    os.makedirs(cache, exist_ok=True)
    n = 0
    for name in os.listdir(snap):
        src, dst = os.path.join(snap, name), os.path.join(cache, name)
        if not os.path.isfile(src) or os.path.exists(dst):
            continue
        try:
            os.link(src, dst)
        except OSError:
            import shutil

            shutil.copy2(src, dst)
        n += 1
    if n:
        print(f"restored {n} persistent-cache entries from bench_cache/",
              file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="tiny CPU smoke sizes")
    ap.add_argument("--svd", action="store_true",
                    help="also run SVD 25f 576x1024 (detail metric; no "
                    "published reference wall-clock exists for SVD)")
    ap.add_argument("--phase", choices=list(_PHASES), default=None,
                    help="internal: run one phase in-process and print its JSON")
    ap.add_argument("--budget", type=float,
                    default=float(__import__("os").environ.get("MRT_BENCH_BUDGET", 2400)),
                    help="wall-clock budget (s); the headline JSON line is "
                    "guaranteed to print inside it (the DC line lands by "
                    "~1100 s even cache-cold: ragcama 420 cap + DC compile "
                    "~530 + run). 2400 leaves the CogVideoX scoreboard "
                    "line room to survive one cold sampler recompile "
                    "(~325 s) on top of a cold DC phase")
    args = ap.parse_args()
    t_start = time.time()

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
    # session resets wipe .jax_cache; re-seed it from the git-tracked
    # snapshot (tools/snapshot_bench_cache.py) so a from-clean-checkout run
    # pays the ~199 s executable LOAD, not the ~522 s DC sampler compile
    try:
        _restore_bench_cache()
    except Exception as e:  # noqa: BLE001
        print(f"bench_cache restore skipped: {e}", file=sys.stderr)

    if args.phase:
        import contextlib
        import os

        lock = contextlib.nullcontext
        if not args.small and not os.environ.get("MRT_TPU_LOCK_HELD"):
            sys.path.insert(0, os.path.dirname(__file__))
            from tools.tpu_lock import tpu_lock

            lock = tpu_lock
        fn, fallback = _PHASES[args.phase]
        try:
            with lock():
                print(json.dumps(fn(args.small)))
        except Exception as e:  # noqa: BLE001
            print(f"{args.phase} bench failed: {e}", file=sys.stderr)
            print(json.dumps(fallback))
        return

    remaining = lambda: args.budget - (time.time() - t_start)

    if not args.small:
        # wait briefly in case the relay is restarting, then fail fast and
        # legibly instead of hanging phase subprocesses for the whole budget
        deadline = time.time() + min(120, max(0, remaining() - 60))
        while not _tunnel_relay_alive():
            if time.time() > deadline:
                print("TPU tunnel relay (127.0.0.1:8082) is down — cannot "
                      "reach the device; no measurement possible", file=sys.stderr)
                print(json.dumps({
                    "metric": "sec/video end-to-end MotionRAG I2V (DynamiCrafter "
                              "16f 1024x576, 30 DDIM steps + RAG retrieval + CAMA), "
                              "1x TPU v5e vs published A100",
                    "value": None, "unit": "s/video", "vs_baseline": None,
                    "error": "tpu_tunnel_relay_down",
                }))
                sys.exit(1)
            time.sleep(5)

    detail = {}
    # Serialize against any other TPU process for the whole run: a queue job
    # overlapping the driver's bench run caused HBM co-tenancy and poisoned
    # the round-2 measurement (ragcama timeout + 1009 s DC compile).
    import contextlib

    lock = contextlib.nullcontext
    if not args.small and not __import__("os").environ.get("MRT_TPU_LOCK_HELD"):
        sys.path.insert(0, __import__("os").path.dirname(__file__))
        from tools.tpu_lock import tpu_lock

        lock = tpu_lock  # factory: context managers are single-use
    with lock():
        # Small ragcama phase FIRST (seconds warm, bounded cold) so a long DC
        # compile can never starve it into the fallback again (BENCH_r02);
        # always leave the DC headline phase >= 900 s.
        if remaining() > 960:
            detail.update(_run_phase_subprocess(
                "ragcama", args.small, timeout=min(420, remaining() - 900)))
        # Headline phase gets everything that is left.
        detail.update(_run_phase_subprocess("dc", args.small,
                                            timeout=max(60, remaining() - 10)))
        if not any(np.isfinite(detail.get(k, float("nan"))) for k in ("rag_s", "cama_s")) \
                and remaining() > 90:
            # retry the overhead phase only if it failed and time remains
            detail.update(_run_phase_subprocess("ragcama", args.small,
                                                timeout=max(30, remaining() - 15)))
    overhead = np.nan_to_num(detail.get("rag_s", float("nan")), nan=0.0) + np.nan_to_num(
        detail.get("cama_s", float("nan")), nan=0.0
    )
    if overhead == 0.0:
        overhead = _FALLBACK_OVERHEAD_S
        detail["overhead_fallback_s"] = _FALLBACK_OVERHEAD_S

    total = detail["dc_s_per_video"] + overhead
    # the reference's own published wall-clock for this exact workload with
    # RAG: 89.4 s/video (README.md:50, A100-class hardware)
    baseline = 89.4
    ok = np.isfinite(total) and total > 0
    print(json.dumps({
        "metric": "sec/video end-to-end MotionRAG I2V (DynamiCrafter 16f 1024x576, "
                  "30 DDIM steps + RAG retrieval + CAMA), 1x TPU v5e vs published A100",
        # strict JSON: a NaN value (failed phase) serializes as null, not NaN
        "value": round(float(total), 3) if ok else None,
        "unit": "s/video",
        "vs_baseline": round(baseline / total, 3) if ok else None,
    }))
    sys.stdout.flush()
    print(json.dumps({"detail": {k: round(float(v), 3) for k, v in detail.items()}}), file=sys.stderr)

    # --- Second scoreboard line: CogVideoX-5B exact protocol + RAG + CAMA --
    # The reference's flagship MotionRAG row is CogVideoX WITH retrieval:
    # 63.0 s/video (README.md:48). Our cog e2e (T5 + image-latent encode +
    # 25-step DPM-SDE sampler + VAE decode) plus the SAME measured rag_s +
    # cama_s overhead is the honest comparison. Warm-cache cost ≈ 300-450 s;
    # a cache-cold sampler compile adds ~325 s — only attempt what fits.
    if args.small or remaining() > 420:
        with lock():
            cog = _run_cog_subprocess(args.small, timeout=max(120, remaining() - 15))
        cd = cog.get("detail") or {}
        cog_ok = (cog.get("value") is not None
                  and cog.get("vs_baseline") is not None)  # exact + complete
        cog_total = (float(cog["value"]) + overhead) if cog_ok else None
        cog_baseline = 63.0  # README.md:48, A100-class, includes RAG
        print(json.dumps({
            "metric": "sec/video end-to-end MotionRAG I2V (CogVideoX-5B-I2V "
                      "17f 480x720, 25 DPM-SDE steps, guidance 3 + RAG "
                      "retrieval + CAMA), 1x TPU v5e vs published A100",
            "value": round(cog_total, 3) if cog_ok else None,
            "unit": "s/video",
            "vs_baseline": round(cog_baseline / cog_total, 3) if cog_ok else None,
        }))
        sys.stdout.flush()
        if cog_ok:
            cd["rag_cama_overhead_s"] = round(float(overhead), 3)
            cd["vs_59.4_no_rag"] = round(59.4 / float(cog["value"]), 3)
        print(json.dumps({"cog_detail": cd}), file=sys.stderr)

    if args.svd and remaining() > 120:
        with lock():
            svd = _run_phase_subprocess("svd", args.small, timeout=remaining() - 10)
        print(json.dumps({"svd_detail": {k: round(float(v), 3) for k, v in svd.items()}}),
              file=sys.stderr)


if __name__ == "__main__":
    main()
