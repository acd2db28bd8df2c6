"""Trainer callback behaviors (reference ``src/utils/training.py``):
telemetry logging, code snapshot, config-level hooks, checkpoint shims."""

from pathlib import Path

import numpy as np

from motionrag_tpu.training import callbacks as cb


class RecordingLogger:
    def __init__(self):
        self.records = []
        self.videos = []

    def log(self, metrics, step):
        self.records.append((step, dict(metrics)))

    def log_video(self, key, paths, step):
        self.videos.append((key, list(paths), step))


class FakeTrainer:
    def __init__(self, tmp_path):
        self.logger = RecordingLogger()
        self.root_dir = Path(tmp_path)
        self.checkpoint_every_n_steps = 0
        self._last_step = 7


def test_dataset_timer_logs_metadata_timings(tmp_path):
    trainer = FakeTrainer(tmp_path)
    timer = cb.DatasetTimer()
    batch = {"metadata": [{"read_video_time": 0.2, "transforms_time": 0.1},
                          {"read_video_time": 0.4, "transforms_time": 0.3}]}
    timer.on_train_batch_start(trainer, None, batch)
    timer.on_train_batch_end(trainer, None, {}, step=5)
    step, metrics = trainer.logger.records[-1]
    assert step == 5
    np.testing.assert_allclose(metrics["data/read_video_time"], 0.3)
    np.testing.assert_allclose(metrics["data/transforms_time"], 0.2)


def test_gradient_monitor(tmp_path):
    trainer = FakeTrainer(tmp_path)
    cb.GradientMonitor().on_train_batch_end(trainer, None, {"grad_norm": 1.5}, 3)
    assert trainer.logger.records[-1][1]["grad/total_norm"] == 1.5
    cb.GradientMonitor().on_train_batch_end(trainer, None, {}, 4)  # no-op
    assert len(trainer.logger.records) == 1


def test_code_snapshot(tmp_path, monkeypatch):
    trainer = FakeTrainer(tmp_path / "run")
    src = tmp_path / "proj"
    (src / "motionrag_tpu").mkdir(parents=True)
    (src / "motionrag_tpu" / "x.py").write_text("a = 1\n")
    (src / "main.py").write_text("b = 2\n")
    monkeypatch.chdir(src)
    cb.CodeSnapshot().on_fit_start(trainer, None)
    assert (trainer.root_dir / "code" / "motionrag_tpu" / "x.py").read_text() == "a = 1\n"
    assert (trainer.root_dir / "code" / "main.py").exists()


def test_fn_call_wrapper_and_command_line(tmp_path):
    hits = []
    fn_cb = cb.FnCallWrapper(lambda tag: hits.append(tag), hook="on_fit_start", tag="x")
    fn_cb.on_fit_start(None, None)
    assert hits == ["x"]

    marker = tmp_path / "ran"
    sh = cb.CommandLineCallback(f"touch {marker}", hook="on_fit_start")
    sh.on_fit_start(None, None)
    assert marker.exists()


def test_model_checkpoint_shim_and_incremental(tmp_path):
    trainer = FakeTrainer(tmp_path)
    cb.ModelCheckpoint(every_n_train_steps=123, save_top_k=-1).on_fit_start(trainer, None)
    assert trainer.checkpoint_every_n_steps == 123
    cb.IncrementalCheckpoint().on_fit_start(trainer, None)
    assert trainer.incremental_checkpoint is True


def test_save_image_and_wandb_video_logger(tmp_path):
    trainer = FakeTrainer(tmp_path)
    videos = [np.random.default_rng(0).integers(0, 255, (2, 4, 3, 8, 8), dtype=np.uint8)]

    img_cb = cb.SaveImage(save_dir=str(tmp_path / "imgs"))
    img_cb.on_eval_epoch_end(trainer, "test", videos, videos, ["p", "q"])
    assert list((tmp_path / "imgs" / "test").glob("*.png"))

    vcb = cb.WandbVideoLogger(save_dir=str(tmp_path / "vids"), video_num=1)
    vcb.on_eval_epoch_end(trainer, "test", videos, videos, ["p", "q"])
    mp4s = sorted((tmp_path / "vids" / "test").glob("*.mp4"))
    assert len(mp4s) == 2  # both written
    assert trainer.logger.videos == [("test", [str(mp4s[0])], 7)]  # capped at 1


def test_wandb_video_logger_logs_only_new_files(tmp_path):
    """Across eval epochs the logger must ship the freshly written videos,
    not re-select the oldest N forever (SaveVideo's filename counter
    accumulates across epochs)."""
    trainer = FakeTrainer(tmp_path)
    videos = [np.random.default_rng(0).integers(0, 255, (1, 4, 3, 8, 8), dtype=np.uint8)]
    vcb = cb.WandbVideoLogger(save_dir=str(tmp_path / "vids"), video_num=4)
    vcb.on_eval_epoch_end(trainer, "val", videos, videos, ["a"])
    vcb.on_eval_epoch_end(trainer, "val", videos, videos, ["b"])
    assert len(trainer.logger.videos) == 2
    first, second = trainer.logger.videos
    assert first[1] and second[1]
    assert not set(first[1]) & set(second[1])  # no re-logged stale files
