"""Experiment-logger backends (SURVEY §5.5; reference ``src/utils/logger.py``
WandbSaveConfigCallback + lightning WandbLogger, ``training.py:268-300``
WandbVideoLogger). The wandb package is absent in this image, so the
WandbLogger's offline wandb-compatible layout is the path under test."""

import json

import numpy as np

from motionrag_tpu.training.callbacks import WandbVideoLogger
from motionrag_tpu.training.loggers import JSONLLogger, WandbLogger, build_logger


def test_jsonl_logger_roundtrip(tmp_path):
    lg = JSONLLogger(tmp_path)
    lg.log({"loss": 1.5}, 3)
    lg.log_config({"model": {"lr": 1e-4}})
    rows = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert rows == [{"step": 3, "loss": 1.5}]
    assert json.loads((tmp_path / "resolved_config.json").read_text()) == {
        "model": {"lr": 1e-4}
    }


def test_wandb_logger_offline_layout(tmp_path):
    lg = WandbLogger(tmp_path, name="run1")
    assert lg._run is None  # wandb not importable here -> offline fallback
    lg.log({"loss": 0.25}, 7)
    lg.log_config({"seed": 1})
    run_dir = tmp_path / "wandb" / "offline-run-run1"
    hist = [json.loads(l) for l in (run_dir / "wandb-history.jsonl").read_text().splitlines()]
    assert hist == [{"_step": 7, "loss": 0.25}]
    assert json.loads((run_dir / "config.json").read_text()) == {"seed": 1}
    # scalars still mirror into the always-on JSONL stream
    assert (tmp_path / "metrics.jsonl").exists()

    src = tmp_path / "v.mp4"
    src.write_bytes(b"fake")
    lg.log_video("val", [str(src)], 7)
    copied = list((run_dir / "media" / "videos" / "val").iterdir())
    assert len(copied) == 1 and copied[0].name.startswith("step00000007")
    lg.finish()  # no-op offline


def test_build_logger_spec_and_instance(tmp_path):
    default = build_logger(None, tmp_path)
    assert isinstance(default, JSONLLogger)
    spec = {"class_path": "motionrag_tpu.training.loggers.WandbLogger",
            "init_args": {"name": "from-spec"}}
    lg = build_logger(spec, tmp_path)
    assert isinstance(lg, WandbLogger)
    assert lg.path == tmp_path / "metrics.jsonl"  # run dir injected post-init


class _FakeTrainer:
    def __init__(self, logger):
        self.logger = logger
        self._last_step = 5


def test_wandb_video_logger_callback(tmp_path):
    lg = WandbLogger(tmp_path, name="cbrun")
    cb = WandbVideoLogger(save_dir=str(tmp_path / "vids"), video_num=2,
                          remove_after_log=True)
    vids = np.zeros((1, 2, 3, 16, 16), np.uint8)  # [b f c h w]
    cb.on_eval_epoch_end(_FakeTrainer(lg), "test", [vids], [vids], [""])
    logged = list((tmp_path / "wandb" / "offline-run-cbrun" / "media" /
                   "videos" / "test").iterdir())
    assert len(logged) == 1
    # remove_after_log cleaned the local copy
    assert list((tmp_path / "vids" / "test").glob("*.mp4")) == []
