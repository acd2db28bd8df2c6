"""Clip-selection curation library (numpy re-design of the reference's
``src/data/clip_selector.py``): filters/splits raw video annotations into
training clips using per-frame metric arrays (scene/text/motion/clip
scores).

Selector families:
  - trivial: All / Index / Random / Length / Resolution
  - ThresholdSelector: split clips at frames failing a metric threshold
    (reference ``clip_selector.py:89-162``)
  - GaussianFilterSelector: best-window extraction from a gaussian-smoothed
    metric with masking loop (``:165-266``)
  - SubClip / Composition stacks (``:269-325``, ``:439-637``)
  - SkillSelector: groups step annotations per video (``:330-363``)
"""

from __future__ import annotations

import random
from collections import defaultdict
from typing import Iterable, Sequence

import numpy as np
from scipy.ndimage import gaussian_filter1d

__all__ = [
    "BaseSelector", "AllSelector", "IndexSelector", "RandomSelector",
    "LengthSelector", "ResolutionSelector", "ThresholdSelector",
    "GaussianFilterSelector", "SubClipSelector", "CompositionSelector",
    "SkillSelector", "SceneSelector", "TextSelector", "MotionSelector",
    "SemanticsSelector", "SceneMotionSelector",
    "SceneTextMotionSemanticsSelector",
]


def _as_array(v):
    return np.asarray(v) if isinstance(v, (list, tuple, np.ndarray)) else v


class BaseSelector:
    def __call__(self, annotation: list[dict]) -> list[dict]:
        raise NotImplementedError


class AllSelector(BaseSelector):
    def __call__(self, annotation):
        return annotation


class IndexSelector(BaseSelector):
    """Select clips by explicit indices (reference ``clip_selector.py:20-31``).

    Also accepts the ``start``/``end``/``step`` slice spelling as a
    convenience extension beyond the reference signature."""

    def __init__(self, indices=None, start: int = 0, end: int | None = None,
                 step: int = 1):
        self.indices = list(indices) if indices is not None else None
        self.start, self.end, self.step = start, end, step

    def __call__(self, annotation):
        if self.indices is not None:
            return [annotation[i] for i in self.indices]
        return annotation[self.start : self.end : self.step]


class RandomSelector(BaseSelector):
    def __init__(self, num: int, seed: int = 42):
        self.num, self.seed = num, seed

    def __call__(self, annotation):
        rng = random.Random(self.seed)
        return rng.sample(annotation, min(self.num, len(annotation)))


class LengthSelector(BaseSelector):
    def __init__(self, min_len: float = 0.0, max_len: float = float("inf")):
        self.min_len, self.max_len = min_len, max_len

    def __call__(self, annotation):
        return [
            a for a in annotation
            if self.min_len <= a["end_sec"] - a["start_sec"] <= self.max_len
        ]


class ResolutionSelector(BaseSelector):
    def __init__(self, min_height: int = 0, min_width: int = 0):
        self.min_height, self.min_width = min_height, min_width

    def __call__(self, annotation):
        return [
            a for a in annotation
            if a.get("height", 1 << 30) >= self.min_height
            and a.get("width", 1 << 30) >= self.min_width
        ]


class ThresholdSelector(BaseSelector):
    """Split clips at frames whose metric fails the threshold; keep segments
    longer than ``min_clip_len`` (reference ``clip_selector.py:89-162``)."""

    def __init__(self, metric_name: str, goal: str = "min",
                 threshold=1.0, min_clip_len: float = 1.0):
        self.metric_name = metric_name
        self.goal = goal
        self.threshold = _as_array(threshold)
        self.min_clip_len = min_clip_len
        if goal == "max":
            self.is_good_enough = lambda x: x > self.threshold
        elif goal == "min":
            self.is_good_enough = lambda x: x < self.threshold
        elif goal != "custom":
            raise ValueError(f"goal must be max/min/custom, got {goal}")

    def is_invalid_annotation(self, anno: dict) -> bool:
        return anno.get(self.metric_name) is None

    def __call__(self, annotation):
        clips = []
        for anno in annotation:
            if self.is_invalid_annotation(anno):
                continue
            fps = anno["fps"]
            metric = np.asarray(anno[self.metric_name])
            start_sec = round(anno["start_sec"] * fps) / fps
            bad = np.where(~self.is_good_enough(metric))[0]
            bounds = [-1, *bad.tolist(), len(metric)]
            min_frames = round(self.min_clip_len * fps)
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                lo += 1
                if hi - lo >= min_frames:
                    sub = dict(anno)
                    sub.update(
                        start_sec=start_sec + lo / fps,
                        end_sec=start_sec + hi / fps,
                        **{
                            k: np.asarray(v)[lo:hi]
                            for k, v in anno.items()
                            if isinstance(v, np.ndarray) and v.ndim >= 1
                        },
                    )
                    clips.append(sub)
        return clips


class GaussianFilterSelector(ThresholdSelector):
    """Pick up to n_subclips best windows from the gaussian-smoothed metric,
    masking each selected window (reference ``clip_selector.py:165-266``)."""

    def __init__(self, metric_name: str, goal: str = "min", threshold: float = 1.0,
                 subclip_len: float = 1.0, n_subclips: int = 1, sigma_ratio: float = 4.0):
        super().__init__(metric_name, goal, threshold, threshold)
        self.subclip_len = subclip_len
        self.n_subclips = n_subclips
        self.sigma_ratio = sigma_ratio
        if goal == "max":
            self.padding_value = -np.inf
            self.find_best_idx = np.argmax
        else:
            self.padding_value = np.inf
            self.find_best_idx = np.argmin

    def __call__(self, annotation):
        clips = []
        for anno in annotation:
            if self.is_invalid_annotation(anno):
                continue
            fps = anno["fps"]
            start_sec = round(anno["start_sec"] * fps) / fps
            end_sec = round(anno["end_sec"] * fps) / fps
            metric = anno[self.metric_name]

            if end_sec - start_sec <= self.subclip_len:
                mean = float(np.mean(metric))
                if self.is_good_enough(mean):
                    sub = dict(anno)
                    sub.update({self.metric_name: mean,
                                "start_sec": start_sec, "end_sec": end_sec})
                    clips.append(sub)
                continue

            frames = round(self.subclip_len * fps)
            frames = frames - 1 if frames % 2 == 0 else frames
            smoothed = gaussian_filter1d(
                np.asarray(metric, np.float64),
                sigma=max(frames // self.sigma_ratio, 1e-6),
                mode="constant", cval=self.padding_value, radius=frames // 2,
            )
            for _ in range(self.n_subclips):
                best = int(self.find_best_idx(smoothed))
                value = float(smoothed[best])
                if not self.is_good_enough(value):
                    break
                lo, hi = best - frames // 2, best + frames // 2
                sub = dict(anno)
                sub.update(
                    {self.metric_name: value,
                     "start_sec": start_sec + lo / fps,
                     "end_sec": start_sec + hi / fps},
                    **{
                        k: np.asarray(v)[lo:hi]
                        for k, v in anno.items()
                        if isinstance(v, np.ndarray) and v.ndim >= 1 and k != self.metric_name
                    },
                )
                clips.append(sub)
                smoothed[max(lo, 0) : hi] = self.padding_value

        for c in clips:
            assert c["end_sec"] > c["start_sec"]
        return clips


class SubClipSelector(BaseSelector):
    """Keep the top-ranked subclips per original clip id
    (reference ``clip_selector.py:269-303``)."""

    def __init__(self, max_subclips: int = 3):
        self.max_subclips = max_subclips

    def rank_fn(self, x: dict):
        return -x["clip_score"]

    def __call__(self, annotation):
        assert all("id" in a for a in annotation), "annotations need 'id'"
        groups = defaultdict(list)
        for a in annotation:
            groups[a["id"]].append(a)
        out = []
        for _, group in sorted(groups.items()):
            out += sorted(group, key=self.rank_fn)[: self.max_subclips]
        return out


class CompositionSelector(BaseSelector):
    def __init__(self, selectors: Iterable[BaseSelector]):
        self.selectors = tuple(selectors)

    def __call__(self, annotation):
        n0 = len(annotation)
        for sel in self.selectors:
            filtered = sel(annotation)
            if annotation:
                print(f"{type(sel).__name__}: {len(annotation)}->{len(filtered)}")
            annotation = filtered
        if n0:
            print(f"Total: {n0}->{len(annotation)} ({len(annotation)/n0*100:.2f}%)")
        return annotation


class SkillSelector(BaseSelector):
    """Group per-step annotations into skills (reference ``:330-363``)."""

    def __init__(self, min_steps: int = 2, max_steps: int = 7,
                 remove_tensor_attr: bool = True):
        self.min_steps, self.max_steps = min_steps, max_steps
        self.remove_tensor_attr = remove_tensor_attr

    def __call__(self, annotation):
        skills = defaultdict(list)
        for anno in annotation:
            if self.remove_tensor_attr:
                anno = {k: v for k, v in anno.items() if not isinstance(v, np.ndarray)}
            skills[anno["video"]].append(anno)
        out = []
        for _, steps in skills.items():
            if self.min_steps <= len(steps) <= self.max_steps:
                out.append({"steps": sorted(steps, key=lambda x: x["start_sec"])})
        return out


class SceneSelector(ThresholdSelector):
    """Multi-threshold scene-change splitting (reference ``:366-382``):
    a frame is good iff every scene_score component is below its threshold."""

    def __init__(self, scene_threshold=(0.5, 1.5, 2.5), min_subclip_len: float = 1.0):
        super().__init__("scene_score", "custom", np.asarray(scene_threshold), min_subclip_len)

    def is_good_enough(self, metric_value):
        return np.all(np.asarray(metric_value) < self.threshold, axis=-1)


class TextSelector(ThresholdSelector):
    def __init__(self, text_threshold: float = 0.005, min_subclip_len: float = 1.0):
        super().__init__("text_score", "min", text_threshold, min_subclip_len)


class MotionSelector(GaussianFilterSelector):
    def __init__(self, subclip_len: float = 3.0, n_subclip: int = 2, max_kl: float = 4.0):
        super().__init__("motion_score", "min", max_kl, subclip_len, n_subclip)


class SemanticsSelector(GaussianFilterSelector):
    def __init__(self, subclip_len: float = 3.0, n_subclip: int = 2,
                 min_similarity: float = 0.3):
        super().__init__("clip_score", "max", min_similarity, subclip_len, n_subclip)


class SceneMotionSelector(CompositionSelector):
    def __init__(self, scene_threshold=(0.5, 1.5, 2.5), min_subclip_len=1.0,
                 subclip_len=3.0, n_subclip=2, max_kl=4.0):
        sub = SubClipSelector(max_subclips=n_subclip)
        sub.rank_fn = lambda x: x["motion_score"]
        super().__init__((
            SceneSelector(scene_threshold, min_subclip_len),
            MotionSelector(subclip_len, n_subclip, max_kl),
            sub,
        ))


class SceneTextMotionSemanticsSelector(CompositionSelector):
    """The full curation stack used for OpenVid training data
    (reference ``:521-550``)."""

    def __init__(self, scene_threshold=(0.5, 1.5, 2.5), min_subclip_len=1.0,
                 text_threshold=0.005, subclip_len=3.0, n_subclip=2,
                 max_kl=4.0, min_similarity=0.3):
        sub = SubClipSelector(max_subclips=n_subclip)
        sub.rank_fn = lambda x: x["motion_score"]
        super().__init__((
            SceneSelector(scene_threshold, min_subclip_len),
            TextSelector(text_threshold, min_subclip_len),
            MotionSelector(subclip_len, n_subclip, max_kl),
            SemanticsSelector(subclip_len, n_subclip, min_similarity),
            sub,
        ))
