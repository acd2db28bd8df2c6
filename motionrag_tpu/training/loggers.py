"""Experiment loggers (SURVEY.md §5.5; reference ``src/utils/logger.py``
WandbSaveConfigCallback + lightning ``WandbLogger``).

The reference logs scalars, the resolved config, and validation videos to
wandb. Here the same surface is a small protocol — ``log(metrics, step)``,
``log_config(config)``, ``log_video(key, paths, step)``, ``finish()`` — with
two backends:

- :class:`JSONLLogger` (default): one JSON object per log call under the run
  dir, plus a stdout echo. Always available, multihost-safe (process 0 only).
- :class:`WandbLogger`: uses the real ``wandb`` package when importable.
  The package is not baked into this image, so by default it degrades to an
  *offline wandb-compatible layout* (``wandb/offline-run-<name>/`` with
  ``config.json``, ``wandb-history.jsonl``, ``media/videos``) that a later
  ``wandb sync``-style importer can backfill — training never gains a hard
  network dependency.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import jax

__all__ = ["JSONLLogger", "WandbLogger", "build_logger"]


class JSONLLogger:
    """Minimal structured logger (the reference logs scalars to wandb;
    SURVEY.md §5.5). One JSON object per log call, plus stdout echo."""

    def __init__(self, log_dir: str | Path | None = None):
        self.path: Path | None = None
        if log_dir is not None:
            self.setup(log_dir)

    def setup(self, log_dir: str | Path) -> None:
        """Bind to a run directory (called by the Trainer when the logger
        was built from a config spec that doesn't know the run dir)."""
        self.path = Path(log_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, metrics: dict, step: int) -> None:
        record = {"step": int(step), **{k: float(v) for k, v in metrics.items()}}
        if self.path is not None and jax.process_index() == 0:
            with self.path.open("a") as f:
                f.write(json.dumps(record) + "\n")
        printable = ", ".join(f"{k}={v:.5g}" for k, v in record.items() if k != "step")
        print(f"[step {step}] {printable}", flush=True)

    def log_config(self, config: dict) -> None:
        """Snapshot the resolved run config (reference
        WandbSaveConfigCallback.save_config → ``log_hyperparams``)."""
        if self.path is not None and jax.process_index() == 0:
            out = self.path.parent / "resolved_config.json"
            out.write_text(json.dumps(config, indent=2, default=str))

    def log_video(self, key: str, paths: list, step: int) -> None:
        """No-op for the JSONL backend (videos already live on disk)."""

    def finish(self) -> None:
        pass


class WandbLogger(JSONLLogger):
    """wandb-backed logger, reference ``logger.py:4``/lightning WandbLogger.

    With the ``wandb`` package importable, every call forwards to a real
    run (``mode`` passes through, so ``offline`` works without network).
    Without it, the same information lands in a wandb-style offline run
    directory under the run dir — scalars in ``wandb-history.jsonl``,
    config in ``config.json``, videos copied into ``media/videos/``.
    """

    def __init__(self, log_dir: str | Path | None = None, project: str = "motionrag",
                 name: str | None = None, mode: str = "offline", **init_kwargs):
        self.project = project
        self.name = name
        self.mode = mode
        self.init_kwargs = init_kwargs
        self._run = None
        self._dir: Path | None = None
        super().__init__(log_dir)

    def setup(self, log_dir: str | Path) -> None:
        super().setup(log_dir)
        if jax.process_index() != 0:
            return
        try:
            import wandb  # not baked into this image; gate, don't require

            self._run = wandb.init(
                project=self.project, name=self.name, mode=self.mode,
                dir=str(Path(log_dir)), **self.init_kwargs,
            )
        except Exception:
            run_name = self.name or Path(log_dir).name
            self._dir = Path(log_dir) / "wandb" / f"offline-run-{run_name}"
            (self._dir / "media" / "videos").mkdir(parents=True, exist_ok=True)
            print(f"wandb unavailable; logging offline layout to {self._dir}",
                  flush=True)

    def log(self, metrics: dict, step: int) -> None:
        super().log(metrics, step)
        if jax.process_index() != 0:
            return
        if self._run is not None:
            self._run.log(dict(metrics), step=int(step))
        elif self._dir is not None:
            record = {"_step": int(step), **{k: float(v) for k, v in metrics.items()}}
            with (self._dir / "wandb-history.jsonl").open("a") as f:
                f.write(json.dumps(record) + "\n")

    def log_config(self, config: dict) -> None:
        super().log_config(config)
        if jax.process_index() != 0:
            return
        if self._run is not None:
            self._run.config.update(dict(config), allow_val_change=True)
        elif self._dir is not None:
            (self._dir / "config.json").write_text(
                json.dumps(config, indent=2, default=str))

    def log_video(self, key: str, paths: list, step: int) -> None:
        if jax.process_index() != 0:
            return
        if self._run is not None:
            import wandb

            self._run.log({key: [wandb.Video(str(p)) for p in paths]},
                          step=int(step))
        elif self._dir is not None:
            dest = self._dir / "media" / "videos" / key
            dest.mkdir(parents=True, exist_ok=True)
            for p in paths:
                shutil.copy2(p, dest / f"step{int(step):08d}_{Path(p).name}")

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()


def build_logger(spec, root_dir: str | Path):
    """Resolve the Trainer's ``logger`` config: None → JSONLLogger, a
    class_path spec → instantiated (run dir injected), an instance → bound
    to the run dir if it wasn't already."""
    if spec is None or spec is True:
        return JSONLLogger(root_dir)
    if spec is False:
        # Lightning spelling ``logger: false`` — keep the stdout echo but
        # write no files (JSONLLogger with no bound path does exactly that)
        return JSONLLogger(None)
    if isinstance(spec, dict) and "class_path" in spec:
        from motionrag_tpu.config import instantiate

        spec = instantiate(spec)
    if getattr(spec, "path", None) is None and hasattr(spec, "setup"):
        spec.setup(root_dir)
    return spec
