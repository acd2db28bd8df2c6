"""Offline metric CLI: score a directory of generated mp4s against a
directory of ground-truth mp4s (reference ``src/metrics/main.py:82-137``).

Usage:
    python -m motionrag_tpu.metrics.main \
        --gt_path DIR --generate_path DIR [--num_frames 16] \
        [--metrics fvd motion action dino clip_v2v]

Pairs files by numeric stem sort (reference ``main.py:59-62``).
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

import numpy as np

from motionrag_tpu.data.video_io import read_video


def _numeric_key(p: Path):
    m = re.findall(r"\d+", p.stem)
    return (int(m[0]) if m else 0, p.stem)


def load_videos(path: Path, num_frames: int, size=None) -> list[np.ndarray]:
    files = sorted(
        [p for p in path.iterdir() if p.suffix.lower() in (".mp4", ".avi", ".mkv", ".webm")],
        key=_numeric_key,
    )
    videos = []
    for f in files:
        from motionrag_tpu.data.video_io import probe

        info = probe(f)
        duration = info.num_frames / max(info.frame_rate, 1e-6)
        video, _ = read_video(
            f, 0.0, duration, num_frame=num_frames, resize=size, output_format="TCHW"
        )
        videos.append(video)
    return videos


METRIC_BUILDERS = {
    "fvd": ("real_fake", lambda: __import__(
        "motionrag_tpu.metrics.frechet", fromlist=["FrechetVideoDistance"]
    ).FrechetVideoDistance()),
    "motion": ("pred_gt", lambda: __import__(
        "motionrag_tpu.metrics.motion", fromlist=["MotionDistance"]
    ).MotionDistance()),
    "action": ("pred_gt", lambda: __import__(
        "motionrag_tpu.metrics.action", fromlist=["I3DActionScore"]
    ).I3DActionScore()),
    "mae_action": ("pred_gt", lambda: __import__(
        "motionrag_tpu.metrics.action", fromlist=["MAEActionScore"]
    ).MAEActionScore()),
    "dino": ("pred_gt", lambda: __import__(
        "motionrag_tpu.metrics.dino", fromlist=["DINOScore"]
    ).DINOScore()),
    "clip_v2v": ("pred_gt", lambda: __import__(
        "motionrag_tpu.metrics.clip_score", fromlist=["CLIPScore"]
    ).CLIPScore(mode="v2v")),
}


def calc_metrics(
    gt_path: str, generate_path: str, num_frames: int = 16,
    metrics=("fvd", "motion", "action", "dino", "clip_v2v"), batch_size: int = 4,
) -> dict:
    gt = load_videos(Path(gt_path), num_frames)
    gen = load_videos(Path(generate_path), num_frames)
    n = min(len(gt), len(gen))
    assert n > 0, "no videos found"
    if len(gt) != len(gen):
        print(f"warning: {len(gt)} gt vs {len(gen)} generated; using first {n}")

    # align spatial sizes per pair
    results = {}
    for name in metrics:
        kind, build = METRIC_BUILDERS[name]
        metric = build()
        try:
            for i in range(0, n, batch_size):
                g = np.stack(gen[i : i + batch_size])
                t = np.stack(gt[i : i + batch_size])
                hw = (min(g.shape[-2], t.shape[-2]), min(g.shape[-1], t.shape[-1]))
                g, t = g[..., : hw[0], : hw[1]], t[..., : hw[0], : hw[1]]
                if kind == "real_fake":
                    metric.update(t, real=True)
                    metric.update(g, real=False)
                else:
                    metric.update(g, t)
            results[name] = float(metric.compute())
            # a Farneback-scored motion value is NOT the reference metric —
            # stamp the report so downstream can never mistake it
            if getattr(metric, "flow_kind", None) == "farneback":
                results[f"{name}_flow"] = "farneback_fallback_not_reference_comparable"
        except Exception as e:  # noqa: BLE001
            print(f"metric {name} failed: {e}")
            results[name] = float("nan")
        print(f"{name}: {results[name]}")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt_path", required=True)
    ap.add_argument("--generate_path", required=True)
    ap.add_argument("--num_frames", type=int, default=16)
    ap.add_argument("--metrics", nargs="+", default=["fvd", "motion", "action", "dino", "clip_v2v"])
    ap.add_argument("--output", default=None)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                    help="force the JAX platform (like main.py; the env pins "
                    "the TPU tunnel, which scoring jobs may not want)")
    args = ap.parse_args()

    import os

    platform = args.platform or os.environ.get("MRT_PLATFORM")
    if platform:
        import jax

        if platform == "tpu" and os.environ.get("JAX_PLATFORMS", "") == "axon":
            platform = "axon"
        jax.config.update("jax_platforms", platform)
    results = calc_metrics(args.gt_path, args.generate_path, args.num_frames, args.metrics)
    print(json.dumps(results))
    if args.output:
        Path(args.output).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
