#!/usr/bin/env python
"""Batch re-encode videos to a target short side for CT training (reference
``tools/resize_video.py``: parallel ffmpeg re-encode to 240p). Uses the
native decoder + cv2 writer; a thread pool overlaps decode/encode."""

import argparse
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def resize_one(src: Path, dst: Path, short_side: int, fps: float | None):
    from motionrag_tpu.data.video_io import probe, read_video, write_video

    info = probe(src)
    duration = info.num_frames / max(info.frame_rate, 1e-6)
    out_fps = fps or info.frame_rate
    n = max(int(round(duration * out_fps)), 1)
    video, vinfo = read_video(src, 0.0, duration, resize=short_side, num_frame=n)
    dst.parent.mkdir(parents=True, exist_ok=True)
    write_video(dst, video, fps=out_fps)
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--short_side", type=int, default=240)
    ap.add_argument("--fps", type=float, default=None)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    src_dir, dst_dir = Path(args.input_dir), Path(args.output_dir)
    files = [p for p in src_dir.rglob("*") if p.suffix.lower() in (".mp4", ".avi", ".mkv", ".webm")]
    print(f"resizing {len(files)} videos to short side {args.short_side}")

    def job(p):
        try:
            return resize_one(p, dst_dir / p.relative_to(src_dir).with_suffix(".mp4"),
                              args.short_side, args.fps)
        except Exception as e:  # noqa: BLE001
            print(f"failed {p}: {e}")
            return None

    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        done = sum(1 for r in pool.map(job, files) if r)
    print(f"done: {done}/{len(files)}")


if __name__ == "__main__":
    main()
