"""Host-side video IO with interchangeable backends.

Port of the reference's reader semantics (``src/utils/video.py``):
pts-targeted uniform frame sampling between [start_sec, end_sec), decoder-
side aspect-preserving short-side resize, RGB24 output, THWC/TCHW formats.

Backends:
  - 'native': our C++ libavformat/libswscale decoder
    (motionrag_tpu/native/videodec.cpp, built on demand) — the hot path,
    K+1 decodes per training sample.
  - 'cv2': OpenCV VideoCapture fallback (frame-index seeking).

``write_video`` (cv2) backs the SaveVideo callback and test fixtures.
"""

from __future__ import annotations

import ctypes
import math
import subprocess
from dataclasses import dataclass
from pathlib import Path
from typing import Literal, Optional, Tuple

import numpy as np

__all__ = ["VideoInfo", "read_video", "read_video_native", "read_video_cv2", "write_video"]

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_INTERP_CODES = {
    "fast_bilinear": 0, "bilinear": 1, "bicubic": 2,
    "nearest": 3, "neighbor": 3, "area": 4, "lanczos": 5,
}


@dataclass
class VideoInfo:
    height: int
    width: int
    frame_rate: float
    num_frames: int


_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    so = _NATIVE_DIR / "libvideodec.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
            )
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(f"failed to build native video decoder: {e}") from e
    lib = ctypes.CDLL(str(so))
    lib.vd_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.vd_probe.restype = ctypes.c_int
    lib.vd_read.argtypes = [
        ctypes.c_char_p, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vd_read.restype = ctypes.c_int
    _lib = lib
    return lib


def _resolve_size(h: int, w: int, resize) -> tuple[int, int]:
    """Aspect-preserving short-side resize (reference video.py:167-172)."""
    if resize is None:
        return h, w
    if isinstance(resize, int):
        resize = (resize, resize)
    factor = min(h / resize[0], w / resize[1])
    return round(h / factor), round(w / factor)


def probe(video_path: str | Path) -> VideoInfo:
    lib = _load_native()
    h, w = ctypes.c_int(), ctypes.c_int()
    fps = ctypes.c_double()
    n = ctypes.c_int64()
    rc = lib.vd_probe(str(video_path).encode(), h, w, fps, n)
    if rc != 0:
        raise ValueError(f"{video_path}   probe failed (rc={rc})")
    return VideoInfo(h.value, w.value, fps.value, int(n.value))


def read_video_native(
    video_path: str | Path,
    start_sec: float,
    end_sec: float,
    resize: Tuple[int, int] | int | None = None,
    interpolation: str = "bicubic",
    threads: int = 1,
    output_format: Literal["THWC", "TCHW"] = "THWC",
    num_frame: Optional[int] = None,
) -> tuple[np.ndarray, VideoInfo]:
    if not Path(video_path).exists():
        raise FileNotFoundError(f"{video_path}   File not found")
    lib = _load_native()
    info = probe(video_path)
    h, w = _resolve_size(info.height, info.width, resize)
    fps = info.frame_rate
    if num_frame is None:
        num_frame = max(round(end_sec * fps) - round(start_sec * fps), 1)

    out = np.empty((num_frame, h, w, 3), dtype=np.uint8)
    rc = lib.vd_read(
        str(video_path).encode(), float(start_sec), float(end_sec), num_frame,
        h, w, _INTERP_CODES.get(interpolation, 2), threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"{video_path}   Read video failed (rc={rc})")
    if output_format == "TCHW":
        out = out.transpose(0, 3, 1, 2)
    return out, VideoInfo(h, w, fps, num_frame)


def read_video_cv2(
    video_path: str | Path,
    start_sec: float,
    end_sec: float,
    resize: Tuple[int, int] | int | None = None,
    interpolation: str = "bicubic",
    threads: int = 1,
    output_format: Literal["THWC", "TCHW"] = "THWC",
    num_frame: Optional[int] = None,
) -> tuple[np.ndarray, VideoInfo]:
    import cv2

    if not Path(video_path).exists():
        raise FileNotFoundError(f"{video_path}   File not found")
    cap = cv2.VideoCapture(str(video_path))
    try:
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        src_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        src_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        h, w = _resolve_size(src_h, src_w, resize)
        if num_frame is None:
            num_frame = max(round(end_sec * fps) - round(start_sec * fps), 1)
        # frame-index uniform sampling (same spacing as the pts targets)
        lo = start_sec * fps
        hi = end_sec * fps - 1
        idxs = np.clip(np.linspace(lo, hi, num_frame).round().astype(int), 0, max(total - 1, 0))
        cv_interp = {
            "bicubic": cv2.INTER_CUBIC, "bilinear": cv2.INTER_LINEAR,
            "nearest": cv2.INTER_NEAREST, "area": cv2.INTER_AREA,
            "lanczos": cv2.INTER_LANCZOS4,
        }.get(interpolation, cv2.INTER_CUBIC)

        out = np.empty((num_frame, h, w, 3), dtype=np.uint8)
        pos = -1
        for i, target in enumerate(idxs):
            if target != pos + 1:
                cap.set(cv2.CAP_PROP_POS_FRAMES, int(target))
            ok, frame = cap.read()
            if not ok:
                raise ValueError(f"{video_path}   Read video failed at frame {target}")
            pos = int(target)
            frame = cv2.resize(frame, (w, h), interpolation=cv_interp)
            out[i] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    finally:
        cap.release()
    if output_format == "TCHW":
        out = out.transpose(0, 3, 1, 2)
    return out, VideoInfo(h, w, fps, num_frame)


def read_video(video_path, *args, backend: str = "auto", **kwargs):
    """Dispatching reader (reference exposes av/ta/tv; here native/cv2)."""
    if backend == "auto":
        try:
            return read_video_native(video_path, *args, **kwargs)
        except (RuntimeError, OSError):
            return read_video_cv2(video_path, *args, **kwargs)
    if backend == "native":
        return read_video_native(video_path, *args, **kwargs)
    if backend == "cv2":
        return read_video_cv2(video_path, *args, **kwargs)
    raise ValueError(f"unknown backend {backend!r}")


def write_video(
    path: str | Path, frames: np.ndarray, fps: float = 8.0, input_format: str = "THWC"
) -> None:
    """uint8 frames -> mp4 (cv2). frames: [t, h, w, c] or [t, c, h, w]."""
    import cv2

    if input_format == "TCHW":
        frames = frames.transpose(0, 2, 3, 1)
    t, h, w, _ = frames.shape
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if not writer.isOpened():
        raise RuntimeError(f"cannot open video writer for {path}")
    try:
        for frame in frames:
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    finally:
        writer.release()
