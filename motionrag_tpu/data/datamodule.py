"""VideoDataModule: annotation preparation (with RAG retrieval) + loaders.

Port of the reference's ``src/data/datamodule.py:21-330`` with the retrieval
redesigned for TPU: instead of a 64-process pool issuing per-sample LanceDB
queries (``datamodule.py:257-262``), all query embeddings go through the
on-device GEMM top-k in large batches — one jitted call per few thousand
samples.

prepare_data semantics preserved:
  - per-split annotation caches keyed by selector + ref_video settings,
  - ``gt`` (ref = target itself), ``rag_text``, ``rag_text_image``,
    ``random`` ref modes (``datamodule.py:222-253``),
  - text embeddings computed once and cached into the annotations,
  - per-sample ``where video != self`` exclusion.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np

from motionrag_tpu.data.dataset import VideoDataset, collate_fn as default_collate
from motionrag_tpu.data.loader import DataLoader

__all__ = ["VideoDataModule"]


class VideoDataModule:
    def __init__(
        self,
        video_size=(480, 720),
        video_length: int = 16,
        video_dir: str = ".",
        train_annotation_path: Sequence[str] = (),
        val_annotation_path: Sequence[str] = (),
        test_annotation_path: Sequence[str] = (),
        train_clip_selector=None,
        val_clip_selector=None,
        test_clip_selector=None,
        train_transforms: Sequence = (),
        uncond_text_ratio: float = 0.0,
        uncond_video_ratio: float = 0.0,
        prompt_type: str = "llm",
        use_ref_frame: bool = False,
        ref_frame_dir=None,
        num_workers: int = 4,
        prefetch_factor: int = 2,
        train_batch_size: int = 1,
        val_batch_size: int = 1,
        test_batch_size: int = 1,
        collate_fn: Optional[Callable] = None,
        tokenizer: Optional[Callable] = None,
        sampling_config: Optional[dict] = None,
        ref_video_type: Optional[str] = None,
        ref_video_num: int = 1,
        rag_prompt_type: str = "motion",
        rag_db_path: Optional[str] = None,
        rag_table_name: str = "motion_caption",
        text_embedder: str = "gte",
        image_embedding_dir: Optional[str] = None,
        cache_dir: str = "cache/annotations",
    ):
        self.video_size = tuple(video_size)
        self.video_length = video_length
        self.video_dir = video_dir
        self.paths = {
            "train": list(train_annotation_path),
            "val": list(val_annotation_path),
            "test": list(test_annotation_path),
        }
        self.selectors = {
            "train": train_clip_selector,
            "val": val_clip_selector,
            "test": test_clip_selector,
        }
        self.train_transforms = list(train_transforms)
        self.uncond_text_ratio = uncond_text_ratio
        self.uncond_video_ratio = uncond_video_ratio
        self.prompt_type = prompt_type
        self.use_ref_frame = use_ref_frame
        self.ref_frame_dir = ref_frame_dir
        self.num_workers = num_workers
        self.prefetch_factor = prefetch_factor
        self.batch_sizes = {
            "train": train_batch_size, "val": val_batch_size, "test": test_batch_size
        }
        self.collate_fn = collate_fn or default_collate
        self.tokenizer = tokenizer
        self.sampling_config = sampling_config
        self.ref_video_type = ref_video_type
        self.ref_video_num = ref_video_num
        self.rag_prompt_type = rag_prompt_type
        self.rag_db_path = rag_db_path
        self.rag_table_name = rag_table_name
        self.text_embedder_name = text_embedder
        self.image_embedding_dir = image_embedding_dir
        self.cache_dir = Path(cache_dir)
        self.datasets: dict = {}

    # -- annotation preparation -------------------------------------------

    def _cache_path(self, split: str) -> Path:
        key = repr(
            (
                self.paths[split], type(self.selectors[split]).__name__,
                self.ref_video_type, self.ref_video_num, self.rag_prompt_type,
                self.image_embedding_dir,
            )
        )
        digest = hashlib.sha256(key.encode()).hexdigest()[:16]
        return self.cache_dir / f"{split}_{digest}.pkl"

    def prepare_annotations(self, split: str) -> list[dict]:
        cache = self._cache_path(split)
        if cache.exists():
            with cache.open("rb") as f:
                return pickle.load(f)

        annotations: list[dict] = []
        for path in self.paths[split]:
            annotations.extend(VideoDataset._load(path))
        selector = self.selectors[split]
        if selector is not None:
            annotations = selector(annotations)

        if self.ref_video_type == "gt":
            assert self.ref_video_num == 1, "ref_video_num must be 1 for gt refs"
            for a in annotations:
                a["ref_videos"] = [
                    {
                        "video": a["video"], "start_sec": a["start_sec"],
                        "end_sec": a["end_sec"], "_distance": 0.0,
                    }
                ]
        elif self.ref_video_type == "random":
            import random as _random

            for a in annotations:
                a["ref_videos"] = [
                    {
                        "video": c["video"], "start_sec": c["start_sec"],
                        "end_sec": c["end_sec"], "_distance": 0.0,
                    }
                    for c in _random.choices(annotations, k=self.ref_video_num + 3)
                ]
        elif self.ref_video_type in ("rag_text", "rag_text_image"):
            self._attach_rag_refs(annotations)
        elif self.ref_video_type is not None:
            raise ValueError(f"Invalid ref_video_type {self.ref_video_type!r}")

        cache.parent.mkdir(parents=True, exist_ok=True)
        with cache.open("wb") as f:
            pickle.dump(annotations, f)
        return annotations

    def _attach_rag_refs(self, annotations: list[dict]) -> None:
        """Batched on-device retrieval: embed all query texts, run the exact
        GEMM top-k in chunks, attach per-sample ref lists. For
        ``rag_text_image`` the text shortlist (ref_video_num*2+3) is re-ranked
        by first-frame image similarity and truncated to ref_video_num
        (reference ``datamodule.py:239-246`` / ``rag.py:101-130``)."""
        from motionrag_tpu.rag.database import RAGDatabase

        db = RAGDatabase(
            self.rag_db_path, self.rag_table_name,
            text_embedder=self.text_embedder_name,
        )
        need = [a for a in annotations if "text_embedding" not in a]
        if need:
            texts = [a.get(self.rag_prompt_type) or "" for a in need]
            emb = db.text_embedder.encode(texts, batch_size=256)
            for a, e in zip(need, emb):
                a["text_embedding"] = e

        text_image = self.ref_video_type == "rag_text_image"
        img_matrix = None
        if text_image:
            self._attach_image_embeddings(annotations)
            img_matrix = db.store.load_embeddings("image_embedding")  # mmap [N, D]

        index = db._index("text_embedding")
        top_k = self.ref_video_num * 2 + 3 if text_image else self.ref_video_num + 3
        meta = db.store.meta
        chunk = 2048
        for start in range(0, len(annotations), chunk):
            group = annotations[start : start + chunk]
            q = np.stack([a["text_embedding"] for a in group])
            exclude = [a.get("video") for a in group]
            dist, idx = index.search(q, top_k, exclude=exclude)
            for a, drow, irow in zip(group, dist, idx):
                pairs = [(float(d), int(i)) for d, i in zip(drow, irow) if i >= 0]
                if text_image and pairs:
                    rows = [i for _, i in pairs]
                    cand = np.asarray(img_matrix[rows], np.float32)
                    cand /= np.maximum(
                        np.linalg.norm(cand, axis=-1, keepdims=True), 1e-8
                    )
                    iq = np.asarray(a["image_embedding"], np.float32)
                    iq /= max(float(np.linalg.norm(iq)), 1e-8)
                    sims = cand @ iq
                    order = np.argsort(-sims)[: self.ref_video_num]
                    pairs = [(1.0 - float(sims[o]), rows[o]) for o in order]
                refs = []
                for d, i in pairs:
                    row = meta.iloc[i]
                    refs.append(
                        {
                            "video": row["video"],
                            "start_sec": float(row["start_sec"]),
                            "end_sec": float(row["end_sec"]),
                            "_distance": d,
                        }
                    )
                a["ref_videos"] = refs

    def _attach_image_embeddings(self, annotations: list[dict]) -> None:
        """First-frame image embeddings for text->image re-rank retrieval.
        The reference loads per-annotation-file sidecars
        ``data/eva_clip/{stem}.pt`` with rows {'video', 'eva_clip_vision'}
        (reference ``datamodule.py:306-315``); here any of .pt/.npz/.pkl under
        ``image_embedding_dir`` works, keyed by video path."""
        if all("image_embedding" in a for a in annotations):
            return
        if self.image_embedding_dir is None:
            raise ValueError(
                "ref_video_type='rag_text_image' needs per-sample "
                "'image_embedding' in the annotations or image_embedding_dir"
            )
        table: dict = {}
        for path in self.paths["train"] + self.paths["val"] + self.paths["test"]:
            stem = Path(path).stem
            for suffix in (".pt", ".npz", ".pkl"):
                side = Path(self.image_embedding_dir) / f"{stem}{suffix}"
                if not side.exists():
                    continue
                if suffix == ".pt":
                    import torch

                    # externally produced sidecars: refuse pickled code by
                    # default; MRT_UNSAFE_PICKLE=1 opts in for legacy files
                    try:
                        rows = torch.load(side, map_location="cpu", weights_only=True)
                    except Exception:  # noqa: BLE001
                        if os.environ.get("MRT_UNSAFE_PICKLE") != "1":
                            raise RuntimeError(
                                f"{side} is not loadable with weights_only=True; "
                                "set MRT_UNSAFE_PICKLE=1 to allow full pickle"
                            )
                        rows = torch.load(side, map_location="cpu", weights_only=False)
                    for r in rows:
                        emb = np.asarray(r["eva_clip_vision"], np.float32)
                        table[r["video"]] = emb[0] if emb.ndim > 1 else emb
                elif suffix == ".npz":
                    data = np.load(side, allow_pickle=True)
                    for v, e in zip(data["video"], data["embedding"]):
                        e = np.asarray(e, np.float32)
                        table[str(v)] = e[0] if e.ndim > 1 else e
                else:
                    with side.open("rb") as f:
                        rows = pickle.load(f)
                    for r in rows:
                        emb = np.asarray(r["eva_clip_vision"], np.float32)
                        table[r["video"]] = emb[0] if emb.ndim > 1 else emb
                break
        missing = 0
        for a in annotations:
            if "image_embedding" in a:
                continue
            emb = table.get(a["video"])
            if emb is None:
                missing += 1
            else:
                a["image_embedding"] = emb
        if missing:
            raise ValueError(
                f"{missing}/{len(annotations)} annotations have no image "
                f"embedding in {self.image_embedding_dir}"
            )

    def prepare_data(self) -> None:
        for split in ("train", "val", "test"):
            if self.paths[split]:
                self.prepare_annotations(split)

    def setup(self, stage: str | None = None) -> None:
        for split in ("train", "val", "test"):
            if not self.paths[split]:
                continue
            annotations = self.prepare_annotations(split)
            self.datasets[split] = VideoDataset(
                annotations,
                video_size=self.video_size,
                video_length=self.video_length,
                video_dir=self.video_dir,
                extra_transforms=self.train_transforms if split == "train" else (),
                tokenizer=self.tokenizer,
                sampling_config=self.sampling_config,
                uncond_text_ratio=self.uncond_text_ratio if split == "train" else 0.0,
                uncond_video_ratio=self.uncond_video_ratio if split == "train" else 0.0,
                use_ref_frame=self.use_ref_frame,
                ref_frame_dir=self.ref_frame_dir,
                prompt_type=self.prompt_type,
                ref_video_num=self.ref_video_num,
            )

    # -- loaders -----------------------------------------------------------

    def _loader(self, split: str, shuffle: bool) -> DataLoader:
        return DataLoader(
            self.datasets[split],
            batch_size=self.batch_sizes[split],
            shuffle=shuffle,
            num_workers=self.num_workers,
            prefetch_factor=self.prefetch_factor,
            collate_fn=self.collate_fn,
            drop_last=split == "train",
        )

    def train_dataloader(self):
        return self._loader("train", shuffle=True)

    def val_dataloader(self):
        return self._loader("val", shuffle=False)

    def test_dataloader(self):
        return self._loader("test", shuffle=False)
