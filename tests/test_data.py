"""Data-layer tests: dataset getitem contract, collate, loader ordering,
clip selectors, and the full datamodule prepare flow with RAG retrieval."""

import numpy as np
import pytest

from motionrag_tpu.data.clip_selector import (
    AllSelector,
    CompositionSelector,
    GaussianFilterSelector,
    LengthSelector,
    SceneSelector,
    SkillSelector,
    ThresholdSelector,
)
from motionrag_tpu.data.dataset import VideoDataset, collate_fn
from motionrag_tpu.data.loader import DataLoader
from motionrag_tpu.data.video_io import write_video


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vids")
    rng = np.random.default_rng(0)
    for name in ("a.mp4", "b.mp4", "c.mp4"):
        frames = rng.integers(0, 255, (40, 48, 64, 3), dtype=np.uint8)
        write_video(d / name, frames, fps=8)
    return d


def make_annotations():
    return [
        {
            "video": v, "start_sec": 0.0, "end_sec": 4.0, "id": i,
            "llm_caption": f"caption {i}",
            "ref_videos": [
                {"video": r, "start_sec": 0.0, "end_sec": 4.0, "_distance": 0.2}
                for r in ("a.mp4", "b.mp4")
            ],
        }
        for i, v in enumerate(["a.mp4", "b.mp4", "c.mp4"])
    ]


@pytest.fixture(scope="module")
def dataset(video_dir):
    return VideoDataset(
        make_annotations(),
        video_size=(32, 48),
        video_length=8,
        video_dir=str(video_dir),
        sampling_config={8: 1.0},
        uncond_text_ratio=0.0,
        uncond_video_ratio=0.0,
        ref_video_num=2,
    )


def test_dataset_getitem_contract(dataset):
    s = dataset[0]
    assert s["video"].shape == (1, 8, 3, 32, 48)
    assert s["video"].dtype == np.float32
    assert -1.0 <= s["video"].min() and s["video"].max() <= 1.0
    assert s["ref_frame"].shape == (1, 3, 32, 48)
    assert s["ref_videos"].shape == (2, 8, 3, 32, 48)
    assert s["metadata"]["raw_prompt"] == "caption 0"
    assert len(s["metadata"]["ref_video_distance"]) == 2
    # self-reference reuses target video
    np.testing.assert_array_equal(s["ref_videos"][0], s["video"][0])


def test_collate(dataset):
    batch = collate_fn([dataset[0], dataset[1]])
    assert batch["video"].shape == (2, 8, 3, 32, 48)
    assert batch["ref_videos"].shape == (2, 2, 8, 3, 32, 48)
    assert batch["ref_video_distance"].shape == (2, 2)
    assert len(batch["metadata"]) == 2


def test_loader_order_and_prefetch(dataset):
    loader = DataLoader(dataset, batch_size=2, shuffle=False, num_workers=3,
                        collate_fn=collate_fn)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["metadata"][0]["batch_idx"] == 0
    assert batches[1]["metadata"][0]["batch_idx"] == 2


def test_threshold_selector_splits_at_bad_frames():
    anno = [{
        "video": "x.mp4", "fps": 10, "start_sec": 0.0, "end_sec": 3.0,
        "score": np.array([0.1] * 10 + [9.0] + [0.1] * 19),
    }]
    sel = ThresholdSelector("score", goal="min", threshold=1.0, min_clip_len=0.5)
    clips = sel(anno)
    assert len(clips) == 2
    assert clips[0]["start_sec"] == pytest.approx(0.0)
    assert clips[0]["end_sec"] == pytest.approx(1.0)
    assert clips[1]["start_sec"] == pytest.approx(1.1)
    assert clips[1]["end_sec"] == pytest.approx(3.0)


def test_gaussian_filter_selector_picks_best_window():
    score = np.ones(100) * 5.0
    score[40:60] = 0.1  # low-motion window in the middle
    anno = [{
        "video": "x.mp4", "fps": 10, "start_sec": 0.0, "end_sec": 10.0,
        "motion": score,
    }]
    sel = GaussianFilterSelector("motion", goal="min", threshold=4.0,
                                 subclip_len=2.0, n_subclips=1)
    clips = sel(anno)
    assert len(clips) == 1
    mid = (clips[0]["start_sec"] + clips[0]["end_sec"]) / 2
    assert 4.0 < mid < 6.0


def test_scene_selector_multi_threshold():
    scores = np.zeros((20, 3))
    scores[10] = [1.0, 2.0, 3.0]  # exceeds all thresholds at frame 10
    anno = [{
        "video": "x.mp4", "fps": 10, "start_sec": 0.0, "end_sec": 2.0,
        "scene_score": scores,
    }]
    clips = SceneSelector(scene_threshold=(0.5, 1.5, 2.5), min_subclip_len=0.5)(anno)
    assert len(clips) == 2


def test_skill_selector_groups_steps():
    annos = [
        {"video": "v1", "start_sec": s, "end_sec": s + 1} for s in (2.0, 0.0, 1.0)
    ] + [{"video": "v2", "start_sec": 0.0, "end_sec": 1.0}]
    out = SkillSelector(min_steps=2, max_steps=7)(annos)
    assert len(out) == 1
    assert [s["start_sec"] for s in out[0]["steps"]] == [0.0, 1.0, 2.0]


def test_datamodule_prepare_with_rag(video_dir, tmp_path):
    from motionrag_tpu.data.datamodule import VideoDataModule
    from motionrag_tpu.rag.build import build_database
    from motionrag_tpu.rag.embedders import HashEmbedder

    # build a tiny rag db over the same videos
    annotations = [
        {"motion_caption": f"motion {i}", "video": v, "start_sec": 0.0, "end_sec": 4.0}
        for i, v in enumerate(["a.mp4", "b.mp4", "c.mp4"] * 5)
    ]
    build_database(annotations, tmp_path / "db", "motion_caption", embedder=HashEmbedder(dim=32))

    import json

    anno_path = tmp_path / "train.json"
    anno_path.write_text(json.dumps(
        [{"video": v, "start_sec": 0.0, "end_sec": 4.0, "id": i,
          "llm_caption": f"caption {i}", "motion": f"motion {i}"}
         for i, v in enumerate(["a.mp4", "b.mp4", "c.mp4"])]
    ))

    dm = VideoDataModule(
        video_size=(32, 48), video_length=4, video_dir=str(video_dir),
        train_annotation_path=[str(anno_path)],
        train_clip_selector=AllSelector(),
        ref_video_type="rag_text", ref_video_num=2,
        rag_prompt_type="motion",
        rag_db_path=str(tmp_path / "db"), rag_table_name="motion_caption",
        text_embedder="hash_32",
        train_batch_size=1, num_workers=1,
        cache_dir=str(tmp_path / "cache"),
    )
    # hash embedder with custom dim
    from motionrag_tpu.rag.embedders import HashEmbedder as HE

    dm.text_embedder_name = HE(dim=32)
    dm.prepare_data()
    dm.setup("fit")
    batch = next(iter(dm.train_dataloader()))
    assert batch["video"].shape[0] == 1
    # retrieval must exclude the sample's own video
    refs = batch["metadata"][0]["annotation"]["ref_videos"]
    own = batch["metadata"][0]["annotation"]["video"]
    assert refs and all(r["video"] != own for r in refs)


def test_datamodule_prepare_rag_text_image(video_dir, tmp_path):
    """rag_text_image: text shortlist (2k+3) re-ranked by first-frame image
    similarity, truncated to ref_video_num (reference datamodule.py:239-246)."""
    from motionrag_tpu.data.datamodule import VideoDataModule
    from motionrag_tpu.rag.build import build_database
    from motionrag_tpu.rag.embedders import HashEmbedder

    rng = np.random.default_rng(3)
    d = 32
    vids = ["a.mp4", "b.mp4", "c.mp4"] * 5
    db_annos = [
        {
            "motion_caption": f"motion {i}", "video": v,
            "start_sec": 0.0, "end_sec": 4.0,
            "image_embedding": rng.standard_normal(d).astype(np.float32),
        }
        for i, v in enumerate(vids)
    ]
    build_database(
        db_annos, tmp_path / "db", "motion_caption",
        embedder=HashEmbedder(dim=d), image_embedding_key="image_embedding",
    )

    import json

    anno_path = tmp_path / "train.json"
    anno_path.write_text(json.dumps(
        [{"video": v, "start_sec": 0.0, "end_sec": 4.0, "id": i,
          "llm_caption": f"caption {i}", "motion": f"motion {i}"}
         for i, v in enumerate(["a.mp4", "b.mp4", "c.mp4"])]
    ))
    # sidecar image embeddings keyed by video (reference eva_clip/{stem}.pt)
    side_dir = tmp_path / "imgemb"
    side_dir.mkdir()
    np.savez(
        side_dir / "train.npz",
        video=np.array(["a.mp4", "b.mp4", "c.mp4"]),
        embedding=rng.standard_normal((3, d)).astype(np.float32),
    )

    dm = VideoDataModule(
        video_size=(32, 48), video_length=4, video_dir=str(video_dir),
        train_annotation_path=[str(anno_path)],
        train_clip_selector=AllSelector(),
        ref_video_type="rag_text_image", ref_video_num=2,
        rag_prompt_type="motion",
        rag_db_path=str(tmp_path / "db"), rag_table_name="motion_caption",
        image_embedding_dir=str(side_dir),
        train_batch_size=1, num_workers=1,
        cache_dir=str(tmp_path / "cache"),
    )
    from motionrag_tpu.rag.embedders import HashEmbedder as HE

    dm.text_embedder_name = HE(dim=d)
    dm.prepare_data()
    annos = dm.prepare_annotations("train")
    for a in annos:
        refs = a["ref_videos"]
        assert len(refs) == 2  # truncated to ref_video_num after re-rank
        assert all(r["video"] != a["video"] for r in refs)
        dists = [r["_distance"] for r in refs]
        assert dists == sorted(dists)  # image-similarity order


def test_datamodule_rag_text_image_missing_embeddings(video_dir, tmp_path):
    from motionrag_tpu.data.datamodule import VideoDataModule
    from motionrag_tpu.rag.build import build_database
    from motionrag_tpu.rag.embedders import HashEmbedder

    build_database(
        [{"motion_caption": "m", "video": "a.mp4", "start_sec": 0.0, "end_sec": 4.0,
          "image_embedding": np.ones(8, np.float32)}],
        tmp_path / "db", "motion_caption",
        embedder=HashEmbedder(dim=8), image_embedding_key="image_embedding",
    )
    import json

    anno_path = tmp_path / "train.json"
    anno_path.write_text(json.dumps(
        [{"video": "a.mp4", "start_sec": 0.0, "end_sec": 4.0, "motion": "m"}]
    ))
    dm = VideoDataModule(
        video_dir=str(video_dir), train_annotation_path=[str(anno_path)],
        train_clip_selector=AllSelector(),
        ref_video_type="rag_text_image", ref_video_num=1,
        rag_prompt_type="motion",
        rag_db_path=str(tmp_path / "db"), rag_table_name="motion_caption",
        cache_dir=str(tmp_path / "cache"),
    )
    from motionrag_tpu.rag.embedders import HashEmbedder as HE

    dm.text_embedder_name = HE(dim=8)
    with pytest.raises(ValueError, match="image_embedding"):
        dm.prepare_annotations("train")
