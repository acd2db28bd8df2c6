"""Offline metric CLI e2e (metrics/main.py — reference src/metrics/main.py):
two directories of real encoded videos in, a complete JSON report out."""

import json

import numpy as np
import pytest


@pytest.fixture()
def video_dirs(tmp_path, rng):
    from motionrag_tpu.data.video_io import write_video

    gt_dir = tmp_path / "gt"
    gen_dir = tmp_path / "gen"
    gt_dir.mkdir()
    gen_dir.mkdir()
    for i in range(3):
        base = rng.integers(0, 200, (10, 3, 48, 64), np.uint8)
        drift = base.copy()
        drift[:, :, 8:40, 8:56] = np.roll(drift[:, :, 8:40, 8:56], i + 1, axis=-1)
        write_video(gt_dir / f"{i:03d}.mp4", base, fps=8, input_format="TCHW")
        write_video(gen_dir / f"{i:03d}.mp4", drift, fps=8, input_format="TCHW")
    return gt_dir, gen_dir


def test_calc_metrics_over_directories(video_dirs):
    from motionrag_tpu.metrics.main import calc_metrics

    gt_dir, gen_dir = video_dirs
    results = calc_metrics(str(gt_dir), str(gen_dir), num_frames=8,
                           metrics=("motion",), batch_size=2)
    assert set(results) == {"motion", "motion_flow"}  # fallback marker
    assert np.isfinite(results["motion"])


def test_metrics_cli_main_writes_report(video_dirs, tmp_path, monkeypatch, capsys):
    from motionrag_tpu.metrics import main as metrics_main

    gt_dir, gen_dir = video_dirs
    out = tmp_path / "report.json"
    monkeypatch.setattr(
        "sys.argv",
        ["metrics", "--gt_path", str(gt_dir), "--generate_path", str(gen_dir),
         "--num_frames", "8", "--metrics", "motion", "--output", str(out)],
    )
    metrics_main.main()
    report = json.loads(out.read_text())
    assert "motion" in report and np.isfinite(report["motion"])
    # the last stdout line is the same JSON (scriptable contract)
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(last) == report


def test_all_metric_builders_instantiate_lazily():
    """Every advertised metric name maps to a buildable (arch-complete)
    metric — weight loading is a separate concern (metrics/weights.py)."""
    from motionrag_tpu.metrics.main import METRIC_BUILDERS

    assert set(METRIC_BUILDERS) >= {"fvd", "motion", "action", "mae_action",
                                    "dino", "clip_v2v"}
    kind, build = METRIC_BUILDERS["motion"]
    m = build()
    assert hasattr(m, "update") and hasattr(m, "compute")
