"""Visualization helpers (reference ``src/utils/visualization.py``):
frame grids, HTML video pages, motion-histogram plots."""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["frame_grid", "videos_to_html", "motion_histogram_figure"]


def frame_grid(video: np.ndarray, num_frames: int = 8, pad: int = 2) -> np.ndarray:
    """uint8 [t, c, h, w] -> one [h, n*w, c] grid image of sampled frames."""
    t = video.shape[0]
    idx = np.linspace(0, t - 1, min(num_frames, t)).round().astype(int)
    frames = video[idx].transpose(0, 2, 3, 1)
    n, h, w, c = frames.shape
    grid = np.full((h, n * (w + pad) - pad, c), 255, np.uint8)
    for i, f in enumerate(frames):
        grid[:, i * (w + pad) : i * (w + pad) + w] = f
    return grid


def videos_to_html(video_paths, out_path: str | Path, titles=None, width: int = 320):
    """Write a simple HTML page embedding the given mp4s (the reference's
    wandb-video-log equivalent for local inspection)."""
    titles = titles or [Path(p).stem for p in video_paths]
    rows = "\n".join(
        f'<div style="display:inline-block;margin:4px;text-align:center">'
        f'<video src="{Path(p).resolve()}" width="{width}" controls loop muted></video>'
        f"<div>{t}</div></div>"
        for p, t in zip(video_paths, titles)
    )
    html = f"<!doctype html><html><body><h2>generated videos</h2>{rows}</body></html>"
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(html)
    return out_path


def motion_histogram_figure(hist: np.ndarray, out_path: str | Path | None = None):
    """Plot per-frame motion histograms (reference motion-hist plots)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 3))
    im = ax.imshow(hist.T, aspect="auto", origin="lower", cmap="viridis")
    ax.set_xlabel("frame pair")
    ax.set_ylabel("log2 flow magnitude bin")
    fig.colorbar(im, ax=ax)
    if out_path:
        fig.savefig(out_path, bbox_inches="tight", dpi=100)
        plt.close(fig)
    return fig
