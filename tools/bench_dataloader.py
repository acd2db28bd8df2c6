#!/usr/bin/env python
"""Data-pipeline throughput benchmark (host-side, CPU).

The reference's second-ranked hot loop is the dataloader's K+1 FFmpeg
decodes per sample (SURVEY.md §3 "hot loops"; the reason ``DatasetTimer``
exists). This measures our host pipeline: the native libav decoder vs the
cv2 fallback on raw clip reads, and the full ``VideoDataset`` -> threaded
``DataLoader`` path with K RAG reference videos per sample.

Runs on synthetic videos it writes itself — no TPU, no network.

Usage: python tools/bench_dataloader.py [--videos 8] [--seconds 4]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=6)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--workers", type=int, default=1,
                    help="worker threads; >1 only helps with >1 host core "
                    "(this build VM has one — decode threads just contend)")
    args = ap.parse_args()

    import numpy as np

    from motionrag_tpu.data.video_io import (
        read_video_cv2,
        read_video_native,
        write_video,
    )

    tmp = Path(tempfile.mkdtemp(prefix="bench_loader_"))
    fps, s = 8, args.size
    rng = np.random.default_rng(0)
    paths = []
    for i in range(args.videos):
        frames = rng.integers(0, 255, (int(args.seconds * fps), 3, s, s), dtype=np.uint8)
        p = tmp / f"{i:03d}.mp4"
        write_video(p, frames, fps=fps, input_format="TCHW")
        paths.append(p)

    results = {}
    for name, fn in (("native", read_video_native), ("cv2", read_video_cv2)):
        try:
            fn(str(paths[0]), 0.0, args.seconds, num_frame=16, resize=224)  # warm
            t0 = time.time()
            n = 0
            for i in range(args.iters):
                v, _ = fn(str(paths[i % len(paths)]), 0.0, args.seconds,
                          num_frame=16, resize=224)
                assert v.shape[0] == 16
                n += 1
            dt = time.time() - t0
            results[f"{name}_clips_per_s"] = round(n / dt, 2)
        except Exception as e:  # noqa: BLE001
            results[f"{name}_error"] = str(e)[:120]

    # full dataset+loader path with K=2 refs (3 decodes per sample)
    from motionrag_tpu.data.dataset import VideoDataset, collate_fn
    from motionrag_tpu.data.loader import DataLoader

    annotations = [
        {"video": p.name, "start_sec": 0.0, "end_sec": args.seconds,
         "llm_caption": f"clip {i}", "id": p.stem,
         "ref_videos": [
             {"video": paths[(i + j + 1) % len(paths)].name, "start_sec": 0.0,
              "end_sec": args.seconds, "_distance": 0.1 * (j + 1)}
             for j in range(2)
         ]}
        for i, p in enumerate(paths)
    ]
    ds = VideoDataset(
        annotations, video_dir=str(tmp), video_size=(224, 224), video_length=16,
        ref_video_num=2,
    )
    loader = DataLoader(ds, batch_size=1, num_workers=args.workers,
                        collate_fn=collate_fn)
    next(iter(loader))  # warm
    t0 = time.time()
    n = 0
    for batch in loader:
        assert batch["video"].shape[1] == 16
        n += 1
    dt = time.time() - t0
    results["dataset_samples_per_s"] = round(n / dt, 2)
    results["decodes_per_sample"] = 3  # target + K=2 refs
    results["workers"] = args.workers

    print(json.dumps(results))


if __name__ == "__main__":
    main()
