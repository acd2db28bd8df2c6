"""Video reader tests — the port of the reference's only real unit-test file
(``tests/test_read_video.py``): shape, dtype, resize geometry, frame rate,
uniform sampling, output format, and a content fingerprint, parametrized per
backend. The synthetic test video encodes the frame index in pixel intensity
so sampling correctness is checkable."""

from pathlib import Path

import numpy as np
import pytest

from motionrag_tpu.data.video_io import (
    probe,
    read_video,
    read_video_cv2,
    read_video_native,
    write_video,
)

FPS = 10
N_FRAMES = 50
H, W = 64, 96


@pytest.fixture(scope="module")
def video_path(tmp_path_factory) -> Path:
    """Synthetic video: frame i is filled with intensity ~ 4*i + gradient."""
    path = tmp_path_factory.mktemp("videos") / "synthetic.mp4"
    frames = np.zeros((N_FRAMES, H, W, 3), np.uint8)
    for i in range(N_FRAMES):
        frames[i, :, :, 0] = min(4 * i, 255)  # red channel encodes time
        frames[i, :, :, 1] = np.linspace(0, 255, W, dtype=np.uint8)[None, :]
    write_video(path, frames, fps=FPS)
    return path


BACKENDS = [read_video_native, read_video_cv2]


@pytest.mark.parametrize("reader", BACKENDS)
def test_basic_read(video_path, reader):
    video, info = reader(video_path, 0.0, 2.0)
    assert video.dtype == np.uint8
    assert video.shape == (20, H, W, 3)
    assert info.frame_rate == pytest.approx(FPS, rel=0.01)


@pytest.mark.parametrize("reader", BACKENDS)
def test_resize_short_side(video_path, reader):
    video, info = reader(video_path, 0.0, 1.0, resize=32)
    # short side (H=64) -> 32, aspect preserved: W=96 -> 48
    assert video.shape[1:] == (32, 48, 3)
    assert (info.height, info.width) == (32, 48)


@pytest.mark.parametrize("reader", BACKENDS)
def test_uniform_sampling_content(video_path, reader):
    video, info = reader(video_path, 0.0, 5.0, num_frame=5)
    assert video.shape[0] == 5
    # red channel should increase ~monotonically with sampled time
    reds = video[:, :, :, 0].mean(axis=(1, 2))
    assert np.all(np.diff(reds) > 0), f"non-monotonic time samples: {reds}"
    # first sample is near the start, last near 5s (frame ~49)
    assert reds[0] < 30 and reds[-1] > 150


@pytest.mark.parametrize("reader", BACKENDS)
def test_window_read(video_path, reader):
    video, _ = reader(video_path, 2.0, 3.0, num_frame=4)
    reds = video[:, :, :, 0].mean(axis=(1, 2))
    # 2s at 10fps = frame 20 -> red ~80; 3s -> frame ~29 -> red ~116
    assert 60 < reds[0] < 100
    assert 95 < reds[-1] < 135


@pytest.mark.parametrize("reader", BACKENDS)
def test_output_format(video_path, reader):
    video, _ = reader(video_path, 0.0, 1.0, output_format="TCHW")
    assert video.shape == (10, 3, H, W)


def test_probe(video_path):
    info = probe(video_path)
    assert (info.height, info.width) == (H, W)
    assert info.frame_rate == pytest.approx(FPS, rel=0.01)
    assert abs(info.num_frames - N_FRAMES) <= 2


def test_backends_agree(video_path):
    v1, _ = read_video_native(video_path, 0.0, 3.0, num_frame=6, resize=32)
    v2, _ = read_video_cv2(video_path, 0.0, 3.0, num_frame=6, resize=32)
    assert v1.shape == v2.shape
    # same frames sampled (content fingerprint within codec/resize tolerance)
    d = np.abs(v1.astype(int) - v2.astype(int)).mean()
    assert d < 10, f"backends disagree: mean abs diff {d}"


def test_read_video_dispatch(video_path):
    video, _ = read_video(video_path, 0.0, 1.0, backend="auto")
    assert video.shape[0] == 10
    with pytest.raises(FileNotFoundError):
        read_video("/nonexistent/file.mp4", 0.0, 1.0, backend="native")
