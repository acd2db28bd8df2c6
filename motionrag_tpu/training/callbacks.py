"""Trainer callbacks — the reference's callback zoo (``src/utils/training.py``)
re-designed for the JAX trainer's hook surface:

  on_fit_start(trainer, module)
  on_train_batch_end(trainer, module, metrics, step)
  on_eval_epoch_end(trainer, stage, generated, ground_truth, prompts)
"""

from __future__ import annotations

import shutil
import subprocess
import time
from pathlib import Path

import numpy as np

__all__ = [
    "DatasetTimer",
    "GradientMonitor",
    "SaveVideo",
    "WandbVideoLogger",
    "SaveImage",
    "SaveLastFrame",
    "VideoLogger",
    "CodeSnapshot",
    "FnCallWrapper",
    "CommandLineCallback",
    "IncrementalCheckpoint",
    "LearningRateMonitor",
    "ModelSummary",
    "ModelCheckpoint",
]


class DatasetTimer:
    """Logs dataloader read/transform times from sample metadata (reference
    ``training.py:20-72``). The loader attaches them via dataset metadata;
    the trainer forwards metrics here per logged step."""

    def __init__(self, log_every_n_steps: int = 10):
        self.log_every_n_steps = log_every_n_steps
        self._last_batch_meta = None

    def on_train_batch_start(self, trainer, module, batch):
        self._last_batch_meta = batch.get("metadata")

    def on_train_batch_end(self, trainer, module, metrics, step):
        meta = self._last_batch_meta
        if not meta:
            return
        read = float(np.mean([m.get("read_video_time", 0.0) for m in meta]))
        tfm = float(np.mean([m.get("transforms_time", 0.0) for m in meta]))
        trainer.logger.log({"data/read_video_time": read, "data/transforms_time": tfm}, step)


class GradientMonitor:
    """Max/total grad norm logging (reference ``training.py:100-116``). The
    trainer already computes the global norm; this surfaces it explicitly."""

    def on_train_batch_end(self, trainer, module, metrics, step):
        if "grad_norm" in metrics:
            trainer.logger.log({"grad/total_norm": metrics["grad_norm"]}, step)


class SaveVideo:
    """Write generated videos as mp4 (reference ``training.py:119-264``:
    batch writer; here synchronous cv2 writes into version dirs)."""

    def __init__(self, save_dir: str = "outputs/videos", fps: float = 8.0,
                 save_gt: bool = False):
        self.save_dir = Path(save_dir)
        self.fps = fps
        self.save_gt = save_gt
        self._counter = 0

    def on_eval_epoch_end(self, trainer, stage, generated, ground_truth, prompts, **kwargs):
        from motionrag_tpu.data.video_io import write_video

        out = self.save_dir / stage
        out.mkdir(parents=True, exist_ok=True)
        gt_dir = self.save_dir / f"{stage}_gt"
        if self.save_gt:
            gt_dir.mkdir(parents=True, exist_ok=True)
        for batch_i, videos in enumerate(generated):
            gts = ground_truth[batch_i] if batch_i < len(ground_truth) else []
            for j, v in enumerate(videos):
                write_video(out / f"{self._counter:06d}.mp4", v, fps=self.fps,
                            input_format="TCHW")
                if self.save_gt and j < len(gts):
                    write_video(gt_dir / f"{self._counter:06d}.mp4", gts[j],
                                fps=self.fps, input_format="TCHW")
                self._counter += 1
        return {}


class WandbVideoLogger(SaveVideo):
    """SaveVideo that also ships the written mp4s to the trainer's logger
    (reference WandbVideoLogger, ``src/utils/training.py:268-300``: rank-0
    ``logger.log_video`` after validation/test, optional cleanup)."""

    def __init__(self, save_dir: str = "outputs/videos", fps: float = 8.0,
                 save_gt: bool = False, video_num: int = 40,
                 remove_after_log: bool = False):
        super().__init__(save_dir=save_dir, fps=fps, save_gt=save_gt)
        self.video_num = video_num
        self.remove_after_log = remove_after_log
        self._logged: set = set()

    def on_eval_epoch_end(self, trainer, stage, generated, ground_truth, prompts, **kwargs):
        super().on_eval_epoch_end(trainer, stage, generated, ground_truth,
                                  prompts, **kwargs)
        logger = getattr(trainer, "logger", None)
        if logger is None or not hasattr(logger, "log_video"):
            return {}
        # only files written since the last log call: SaveVideo's filename
        # counter accumulates across eval epochs, so a plain sorted()[:N]
        # would re-log the oldest epoch's videos forever
        videos = [v for v in sorted((self.save_dir / stage).rglob("*.mp4"))
                  if v not in self._logged][: self.video_num]
        self._logged.update(videos)
        key = "val" if stage != "test" else "test"
        step = getattr(trainer, "_last_step", 0)
        logger.log_video(key, [str(v) for v in videos], step)
        if self.remove_after_log:
            for v in videos:
                v.unlink(missing_ok=True)
        return {}


class SaveImage:
    """Save first frames as pngs (reference SaveImage)."""

    def __init__(self, save_dir: str = "outputs/images"):
        self.save_dir = Path(save_dir)

    def on_eval_epoch_end(self, trainer, stage, generated, ground_truth, prompts, **kwargs):
        from PIL import Image

        out = self.save_dir / stage
        out.mkdir(parents=True, exist_ok=True)
        i = 0
        for videos in generated:
            for v in videos:
                Image.fromarray(v[0].transpose(1, 2, 0)).save(out / f"{i:06d}.png")
                i += 1
        return {}


class SaveLastFrame:
    """Persist each generated video's last frame for the autoregressive
    skill-image chain (reference ``src/image/autoregress/callback.py``)."""

    def __init__(self, save_dir: str = "outputs/last_frames"):
        self.save_dir = Path(save_dir)

    def on_eval_epoch_end(self, trainer, stage, generated, ground_truth, prompts, **kwargs):
        from PIL import Image

        self.save_dir.mkdir(parents=True, exist_ok=True)
        i = 0
        for videos in generated:
            for v in videos:
                Image.fromarray(v[-1].transpose(1, 2, 0)).save(
                    self.save_dir / f"{i:06d}.png"
                )
                i += 1
        return {}


class VideoLogger:
    """Local stand-in for WandbVideoLogger (reference ``training.py:267-296``):
    copies saved mp4s into the run dir so the artifact layout matches."""

    def __init__(self, source_dir: str = "outputs/videos", max_videos: int = 8):
        self.source_dir = Path(source_dir)
        self.max_videos = max_videos

    def on_eval_epoch_end(self, trainer, stage, generated, ground_truth, prompts, **kwargs):
        src = self.source_dir / stage
        if not src.exists():
            return {}
        dst = trainer.root_dir / "media" / stage
        dst.mkdir(parents=True, exist_ok=True)
        for f in sorted(src.glob("*.mp4"))[: self.max_videos]:
            shutil.copy2(f, dst / f.name)
        return {}


class CodeSnapshot:
    """Snapshot the source tree into the run dir (reference WandbCodeLogger,
    ``training.py:302-311``)."""

    def __init__(self, patterns=("motionrag_tpu/**/*.py", "configs/**/*.yml", "*.py")):
        self.patterns = patterns

    def on_fit_start(self, trainer, module):
        root = Path.cwd()
        dst_root = trainer.root_dir / "code"
        for pattern in self.patterns:
            for f in root.glob(pattern):
                if "runs" in f.parts or not f.is_file():
                    continue
                dst = dst_root / f.relative_to(root)
                dst.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy2(f, dst)


class FnCallWrapper:
    """Config-level "call any function at a hook" escape hatch (reference
    ``training.py:314-339``)."""

    def __init__(self, fn, hook: str = "on_fit_start", **kwargs):
        self.fn = fn
        self.kwargs = kwargs
        setattr(self, hook, lambda *a, **k: self.fn(**self.kwargs))


class CommandLineCallback:
    """Run a shell command at a hook (reference ``training.py:430-458``)."""

    def __init__(self, command: str, hook: str = "on_fit_start"):
        self.command = command
        setattr(self, hook, self._run)

    def _run(self, *args, **kwargs):
        subprocess.run(self.command, shell=True, check=False)


class IncrementalCheckpoint:
    """Marker for config parity: the trainer's ``incremental_checkpoint``
    flag implements trainable-only saving (reference ``training.py:75-97``)."""

    def on_fit_start(self, trainer, module):
        trainer.incremental_checkpoint = True


class LearningRateMonitor:
    def __init__(self, logging_interval: str = "step"):
        pass


class ModelSummary:
    def __init__(self, max_depth: int = 3):
        self.max_depth = max_depth

    def on_fit_start(self, trainer, module):
        pass  # the trainer prints the param summary at setup


class ModelCheckpoint:
    """Config-compat shim: maps Lightning ModelCheckpoint settings onto the
    trainer's checkpoint_every_n_steps."""

    def __init__(self, every_n_train_steps: int = 2000, save_top_k: int = -1,
                 save_last: bool = True, **_):
        self.every_n_train_steps = every_n_train_steps

    def on_fit_start(self, trainer, module):
        trainer.checkpoint_every_n_steps = self.every_n_train_steps


class FindUnusedParameters:
    """Diagnostic counterpart of the reference's DDP FindUnusedParameters
    callback (``training.py:342-347``): after the first step, report
    trainable parameters whose gradient moments never moved — in the masked-
    optimizer design this surfaces mask patterns that matched nothing."""

    def on_fit_start(self, trainer, module):
        import jax

        n_sel = sum(1 for m in jax.tree.leaves(trainer.mask) if m)
        if n_sel == 0:
            print("WARNING: trainable mask selected ZERO parameters — "
                  f"patterns: {module.trainable_patterns}")
        else:
            print(f"trainable mask selected {n_sel} parameter tensors")
