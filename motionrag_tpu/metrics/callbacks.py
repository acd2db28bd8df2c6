"""Metric trainer-callbacks: push generated videos through metrics at eval
epoch end (reference ``src/metrics/callbacks.py:19-77``), per-sample scoring
(``wrapper.py:8-61``), per-sample dumps (``callbacks.py:80-128``), and the
standard metric registry the configs reference."""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Callable, Optional

import numpy as np

__all__ = [
    "MetricLogger",
    "SamplewiseWrapper",
    "SaveSampleMetrics",
    "FVDCallback",
    "MotionCallback",
    "ActionCallback",
    "MAEActionCallback",
    "ClipV2VCallback",
    "DINOCallback",
]


class MetricLogger:
    """Wraps a Metric; at eval epoch end feeds (generated, gt, prompts)
    batches and logs the reduced value. Failures degrade to NaN (reference
    ``callbacks.py:58-60``)."""

    def __init__(self, name: str, metric_factory: Callable, kind: str = "pred_gt"):
        self.name = name
        self.metric_factory = metric_factory
        self.kind = kind  # 'pred_gt' | 'real_fake' | 'text'
        self._metric = None

    def metric(self):
        if self._metric is None:
            self._metric = self.metric_factory()
        return self._metric

    def on_eval_epoch_end(self, trainer, stage, generated, ground_truth, prompts,
                          sample_ids=None):
        metric = self.metric()
        metric.reset()
        try:
            offset = 0
            for gen, gt in zip(generated, ground_truth):
                t = min(gen.shape[1], gt.shape[1])
                gen, gt = gen[:, :t], gt[:, :t]
                if self.kind == "real_fake":
                    metric.update(gt, real=True)
                    metric.update(gen, real=False)
                elif self.kind == "text":
                    metric.update(gen, prompts[offset : offset + len(gen)])
                else:
                    metric.update(gen, gt)
                offset += len(gen)
            metric.sync()
            value = float(metric.compute())
        except Exception as e:  # noqa: BLE001
            print(f"metric {self.name} failed: {e}")
            value = float("nan")
        return {f"{stage}/{self.name}": value}


class SamplewiseWrapper:
    """Per-sample metric scores keyed by sample id (reference
    ``wrapper.py:8-61``): runs the metric per sample and collects
    {id: score}."""

    def __init__(self, metric_factory: Callable, kind: str = "pred_gt"):
        self.metric_factory = metric_factory
        self.kind = kind

    def __call__(self, generated, ground_truth, ids, prompts=None):
        scores = {}
        for i, (gen, gt) in enumerate(zip(generated, ground_truth)):
            metric = self.metric_factory()
            try:
                if self.kind == "real_fake":
                    raise ValueError("distribution metrics have no per-sample score")
                if self.kind == "text":
                    metric.update(gen[None], [prompts[i]])
                else:
                    metric.update(gen[None], gt[None])
                scores[ids[i]] = float(metric.compute())
            except Exception as e:  # noqa: BLE001
                scores[ids[i]] = float("nan")
                print(f"samplewise metric failed for {ids[i]}: {e}")
        return scores


class SaveSampleMetrics:
    """Dump per-sample metric dicts joined with annotations (reference
    ``callbacks.py:80-128`` writes sample_metrics.pt; here a pickle)."""

    def __init__(self, metrics: dict[str, SamplewiseWrapper], save_dir: str = "."):
        self.metrics = metrics
        self.save_dir = Path(save_dir)

    def on_eval_epoch_end(self, trainer, stage, generated, ground_truth, prompts,
                          sample_ids=None):
        gen = np.concatenate(generated, axis=0) if generated else np.empty(0)
        gt = np.concatenate(ground_truth, axis=0) if ground_truth else np.empty(0)
        # key by sample id with dedup, sorted by id (reference wrapper.py:
        # 8-61 cats video_id across ranks and dedups) — a distributed
        # sampler may deliver the same sample twice (padding); last wins
        ids = list(sample_ids) if sample_ids else list(range(len(gen)))
        keep: dict = {}
        for row, sid in enumerate(ids[: len(gen)]):
            keep[sid] = row
        order = sorted(keep)
        rows = [keep[sid] for sid in order]
        gen, gt = gen[rows], gt[rows]
        prompts = [prompts[r] for r in rows] if prompts else prompts
        records: dict = {sid: {} for sid in order}
        for name, wrapper in self.metrics.items():
            for sid, score in wrapper(gen, gt, order, prompts).items():
                records[sid][name] = score
        self.save_dir.mkdir(parents=True, exist_ok=True)
        with (self.save_dir / "sample_metrics.pkl").open("wb") as f:
            pickle.dump(records, f)
        return {}


# -- registry (the names configs instantiate) -------------------------------


def FVDCallback():
    from motionrag_tpu.metrics.frechet import FrechetVideoDistance

    return MetricLogger("fvd", FrechetVideoDistance, kind="real_fake")


def MotionCallback():
    from motionrag_tpu.metrics.motion import MotionDistance

    return MetricLogger("motion_kl", MotionDistance)


def ActionCallback():
    from motionrag_tpu.metrics.action import I3DActionScore

    return MetricLogger("action_score", I3DActionScore)


def MAEActionCallback():
    from motionrag_tpu.metrics.action import MAEActionScore

    return MetricLogger("mae_action_score", MAEActionScore)


def ClipV2VCallback():
    from motionrag_tpu.metrics.clip_score import CLIPScore

    return MetricLogger("clip_v2v", lambda: CLIPScore(mode="v2v"))


def DINOCallback():
    from motionrag_tpu.metrics.dino import DINOScore

    return MetricLogger("dino_score", DINOScore)


def FIDCallback():
    from motionrag_tpu.metrics.frechet import FrechetImageDistance

    return MetricLogger("fid", FrechetImageDistance, kind="real_fake")
