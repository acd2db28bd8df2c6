"""VideoDataset: host-side sample assembly (numpy, no torch).

Port of the reference's dataset semantics (``src/data/dataset.py:43-312``):
  - fps-probability clip sampler bounding the subclip length
    (``dataset.py:118-134``),
  - bicubic short-side resize + center crop + [-1,1] normalize,
  - prompt-type selection llm/image/video/action/llm_plan/mix with
    uncond-text dropout,
  - K reference videos loaded at fixed 8 fps, self-reference reusing the
    target clip, read-failure degrading to zeros + distance 1.0,
  - infinite retry with a random index on any error,
  - rich timing metadata (feeds the DatasetTimer callback).

Outputs are float32 host arrays (cast to bf16 on device by the modules).
"""

from __future__ import annotations

import random
import time
from pathlib import Path
from typing import Callable, Literal, Optional, Sequence, Tuple

import numpy as np

from motionrag_tpu.data.video_io import read_video

__all__ = ["VideoDataset", "SkillImageDataset", "collate_fn", "skill_collate_fn"]


def center_crop(video: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """[..., h, w] center crop (after short-side resize >= size)."""
    h, w = video.shape[-2], video.shape[-1]
    th, tw = size
    top, left = max((h - th) // 2, 0), max((w - tw) // 2, 0)
    return video[..., top : top + th, left : left + tw]


def normalize_video(video_u8: np.ndarray) -> np.ndarray:
    """uint8 -> float32 [-1, 1]."""
    return (video_u8.astype(np.float32) / 255.0 - 0.5) / 0.5


def collate_fn(batch: list[dict]) -> dict:
    """list of samples -> batch dict (reference ``dataset.py:18-40``), plus
    a dense [B, K] ref_video_distance array for the fusion weight path."""
    out = {
        "video": np.concatenate([b["video"] for b in batch], axis=0),
        "ref_frame": np.concatenate([b["ref_frame"] for b in batch], axis=0),
        "ref_videos": np.stack([b["ref_videos"] for b in batch], axis=0),
        "metadata": [b["metadata"] for b in batch],
    }
    prompts = [b["prompt"] for b in batch]
    if isinstance(prompts[0], np.ndarray):
        out["prompt_ids"] = np.concatenate(prompts, axis=0)
        out["prompt"] = [b["metadata"]["raw_prompt"] for b in batch]
    else:
        out["prompt"] = prompts
    k = out["ref_videos"].shape[1]
    dist = np.ones((len(batch), k), np.float32)
    for i, b in enumerate(batch):
        d = b["metadata"].get("ref_video_distance") or []
        dist[i, : len(d)] = d[:k]
    out["ref_video_distance"] = dist
    return out


class VideoDataset:
    def __init__(
        self,
        annotation_path,
        video_size: Tuple[int, int],
        video_length: int,
        video_dir: str,
        extra_transforms: Sequence[Callable] = (),
        read_video_backend: str = "auto",
        tokenizer: Optional[Callable] = None,
        sampling_config: Optional[dict] = None,
        uncond_text_ratio: float = 0.15,
        uncond_video_ratio: float = 0.15,
        use_ref_frame: bool = False,
        ref_frame_dir=None,
        prompt_type: str = "llm",
        ref_video_num: int = 1,
    ):
        self.annotations = self._load(annotation_path)
        self.video_dir = Path(video_dir)
        self.video_size = tuple(video_size)
        self.video_length = video_length
        self.extra_transforms = list(extra_transforms)
        self.read_video_backend = read_video_backend
        self.tokenizer = tokenizer
        self.sampling_config = sampling_config or {8: 1.0}
        self.uncond_text_ratio = uncond_text_ratio
        self.uncond_video_ratio = uncond_video_ratio
        self.use_ref_frame = use_ref_frame
        self.ref_frame_dir = Path(ref_frame_dir) if ref_frame_dir else Path(".")
        self.prompt_type = prompt_type
        self.ref_video_num = ref_video_num

    @staticmethod
    def _load(path):
        if isinstance(path, (list, tuple)):
            return path  # already-loaded records
        path = Path(path)
        if path.suffix == ".pt":
            import torch

            return torch.load(path, map_location="cpu", weights_only=False)
        if path.suffix == ".parquet":
            import pandas as pd

            return pd.read_parquet(path).to_dict("records")
        if path.suffix == ".json":
            import json

            return json.loads(path.read_text())
        if path.suffix == ".npy":
            return list(np.load(path, allow_pickle=True))
        raise ValueError(f"unsupported annotation format: {path.suffix}")

    def __len__(self):
        return len(self.annotations)

    # -- clip sampling -----------------------------------------------------

    def video_clip_sampler(self, start_sec, end_sec, sampling_config=None):
        cfg = sampling_config or self.sampling_config
        fps = np.random.choice(list(cfg.keys()), p=list(cfg.values()))
        clip_max_length = self.video_length / fps
        if end_sec - start_sec > clip_max_length:
            start_sec = random.uniform(start_sec, end_sec - clip_max_length)
            end_sec = start_sec + clip_max_length
        return start_sec, end_sec

    # -- pieces ------------------------------------------------------------

    def get_video(self, video_info: dict, sampling_config=None) -> dict:
        start_sec, end_sec = self.video_clip_sampler(
            video_info["start_sec"], video_info["end_sec"], sampling_config
        )
        t0 = time.time()
        num_frame = 1 if start_sec == end_sec else self.video_length
        video_u8, info = read_video(
            self.video_dir / video_info["video"],
            start_sec=start_sec, end_sec=end_sec,
            resize=self.video_size, interpolation="bicubic",
            output_format="TCHW", num_frame=num_frame,
            backend=self.read_video_backend,
        )
        read_time = time.time() - t0
        t0 = time.time()
        video = normalize_video(center_crop(video_u8, self.video_size))
        for tf in self.extra_transforms:
            video = tf(video)
        transforms_time = time.time() - t0
        return {
            "video": video[None],  # [1, T, C, H, W]
            "start_sec": start_sec,
            "end_sec": end_sec,
            "info": info,
            "read_video_time": read_time,
            "transforms_time": transforms_time,
        }

    def get_prompt(self, video_info: dict):
        pt = self.prompt_type
        if pt == "llm":
            raw = video_info.get("llm_caption")
        elif pt == "image":
            raw = random.choice(video_info["image_caption"])
        elif pt == "video":
            raw = random.choice(video_info["video_caption"])
        elif pt == "action":
            raw = video_info.get("prompt")
        elif pt == "llm_plan":
            raw = video_info.get("step_descriptions")
        elif pt == "mix":
            raw = random.choice(
                [video_info.get("llm_caption"), random.choice(video_info["image_caption"])]
            )
        else:
            raise ValueError(f"Invalid prompt type {pt!r}")
        raw = raw if raw is not None else ""
        prompt = raw if random.random() > self.uncond_text_ratio else ""
        if self.tokenizer is not None:
            ids = np.asarray(self.tokenizer(prompt))
            prompt = ids[None] if ids.ndim == 1 else ids
        return prompt, raw

    def get_ref_frame(self, video: np.ndarray, video_info: dict) -> np.ndarray:
        if self.use_ref_frame and "ref_frame" in video_info:
            from PIL import Image

            ref_file = self.ref_frame_dir / video_info["ref_frame"]
            # autoregressive producer may still be writing (reference
            # dataset.py:266-271 wait loop)
            deadline = time.time() + 60
            while not ref_file.exists() and time.time() < deadline:
                time.sleep(0.5)
            time.sleep(0.3)
            image = Image.open(ref_file).convert("RGB")
            factor = min(image.height / self.video_size[0], image.width / self.video_size[1])
            h, w = round(image.height / factor), round(image.width / factor)
            image = image.resize((w, h), resample=Image.BICUBIC)
            arr = np.asarray(image).transpose(2, 0, 1)[None]
            return normalize_video(center_crop(arr, self.video_size))
        return video[:, 0]

    def get_ref_videos(self, video: np.ndarray, video_info: dict):
        ref_videos = np.zeros(
            (self.ref_video_num, self.video_length) + video.shape[2:], np.float32
        )
        distance = []
        for i, v in enumerate(video_info.get("ref_videos", [])[: self.ref_video_num]):
            if random.random() > self.uncond_video_ratio:
                try:
                    if v["video"] == video_info["video"]:
                        ref_video = video
                    else:
                        ref_video = self.get_video(v, {8: 1.0})["video"]
                    ref_videos[i] = ref_video[0]
                    distance.append(float(v["_distance"]))
                except Exception as e:  # noqa: BLE001
                    print(f"Rag read video Error: {e}")
                    distance.append(1.0)
            else:
                distance.append(1.0)
        return ref_videos, distance

    # -- getitem -----------------------------------------------------------

    def __getitem__(self, idx: int) -> dict:
        for _ in range(100):
            try:
                return self.getitem(idx)
            except Exception as e:  # noqa: BLE001
                print(f"Data Error: {e}   Batch idx:{idx}")
                idx = random.randint(0, len(self) - 1)
        raise RuntimeError("dataset failed 100 consecutive reads")

    def getitem(self, idx: int) -> dict:
        info = self.annotations[idx]
        video_data = self.get_video(info)
        video = video_data["video"]
        prompt, raw_prompt = self.get_prompt(info)
        ref_frame = self.get_ref_frame(video, info)
        ref_videos, ref_dist = self.get_ref_videos(video, info)
        metadata = {
            "raw_prompt": raw_prompt,
            "info": video_data["info"],
            "read_video_time": video_data["read_video_time"],
            "transforms_time": video_data["transforms_time"],
            "clip_length": video_data["end_sec"] - video_data["start_sec"],
            "batch_idx": idx,
            "id": info.get("id", idx),
            "save_name": info.get("save_name", info.get("id", idx)),
            "ref_video_distance": ref_dist,
            "annotation": {
                k: v for k, v in info.items() if not isinstance(v, np.ndarray)
            },
        }
        return {
            "video": video,
            "prompt": prompt,
            "ref_frame": ref_frame,
            "ref_videos": ref_videos,
            "metadata": metadata,
        }


def skill_collate_fn(batch: list[dict]) -> dict:
    """Pads per-sample skill steps to the batch max (reference
    ``dataset.py:456-487``)."""
    max_steps = max(b["images"].shape[0] for b in batch)
    images, prompts = [], []
    for b in batch:
        img = b["images"]
        if img.shape[0] < max_steps:
            pad = np.repeat(img[-1:], max_steps - img.shape[0], axis=0)
            img = np.concatenate([img, pad], axis=0)
        images.append(img)
        p = list(b["prompts"]) + [""] * (max_steps - len(b["prompts"]))
        prompts.append(p)
    return {
        "images": np.stack(images, axis=0),
        "prompts": prompts,
        "max_steps": max_steps,
        "metadata": [b["metadata"] for b in batch],
    }


class SkillImageDataset(VideoDataset):
    """Skill-step variant: each annotation holds N step timestamps; returns
    one keyframe per step + per-step prompts (reference
    ``dataset.py:315-487``)."""

    def getitem(self, idx: int) -> dict:
        info = self.annotations[idx]
        steps = info["steps"]
        frames = []
        for step in steps:
            data = self.get_video(
                {**info, "start_sec": step["start_sec"], "end_sec": step["start_sec"]},
                {8: 1.0},
            )
            frames.append(data["video"][0, 0])
        images = np.stack(frames, axis=0)  # [steps, C, H, W]
        prompts = [s.get("description", "") for s in steps]
        metadata = {
            "batch_idx": idx,
            "id": info.get("id", idx),
            "save_name": info.get("save_name", info.get("id", idx)),
            "raw_prompt": prompts,
            "annotation": {k: v for k, v in info.items() if not isinstance(v, np.ndarray)},
        }
        return {"images": images, "prompts": prompts, "metadata": metadata}
