"""End-to-end integration: synthetic videos + RAG db -> config -> CLI
``fit`` (2 steps) then ``test`` with video generation and metric callbacks —
the automated version of the reference's de-facto integration path
(``train_test.py`` + sanity val, SURVEY.md §4)."""

import json
from pathlib import Path

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("e2e")
    from motionrag_tpu.data.video_io import write_video
    from motionrag_tpu.rag.build import build_database
    from motionrag_tpu.rag.embedders import HashEmbedder

    rng = np.random.default_rng(0)
    (ws / "videos").mkdir()
    names = [f"v{i}.mp4" for i in range(4)]
    for name in names:
        frames = rng.integers(0, 255, (24, 48, 64, 3), dtype=np.uint8)
        write_video(ws / "videos" / name, frames, fps=8)

    annotations = [
        {"video": n, "start_sec": 0.0, "end_sec": 3.0, "id": i,
         "llm_caption": f"clip {i}", "motion": f"motion {i}"}
        for i, n in enumerate(names)
    ]
    (ws / "train.json").write_text(json.dumps(annotations))
    build_database(
        [dict(a, motion_caption=a["motion"]) for a in annotations],
        ws / "rag_db", "motion_caption", embedder=HashEmbedder(dim=32),
    )
    return ws


def make_config(ws: Path) -> Path:
    cfg = {
        "seed_everything": 0,
        "trainer": {
            "max_steps": 2,
            "val_check_interval": 0,
            "log_every_n_steps": 1,
            "checkpoint_every_n_steps": 2,
            "default_root_dir": str(ws / "runs"),
            "mesh_config": {"class_path": "motionrag_tpu.parallel.mesh.MeshConfig",
                            "init_args": {"dp": 1}},
            "limit_test_batches": 1,
            "callbacks": [
                {"class_path": "motionrag_tpu.training.callbacks.SaveVideo",
                 "init_args": {"save_dir": str(ws / "outputs"), "save_gt": True}},
                {"class_path": "motionrag_tpu.training.callbacks.GradientMonitor"},
            ],
        },
        "model": {
            "class_path": "motionrag_tpu.models.svd.module.SVDModule",
            "init_args": {
                "full_trainable_modules": ["unet.conv_out"],
                "eval_pipeline_call_kwargs": {
                    "num_frames": 4, "height": 64, "width": 64,
                    "num_inference_steps": 2, "decode_chunk_size": 4,
                },
                "unet": {
                    "class_path": "motionrag_tpu.models.svd.unet.UNetSpatioTemporal",
                    "init_args": {
                        "block_out_channels": [32, 64, 64, 64],
                        "layers_per_block": 1,
                        "cross_attention_dim": 48,
                        "num_attention_heads": [1, 2, 2, 2],
                        "dtype": "float32",
                    },
                },
                "vae": {
                    "class_path": "motionrag_tpu.models.svd.vae.AutoencoderKLTemporalDecoder",
                    "init_args": {"block_out_channels": [32, 32, 32, 32], "dtype": "float32"},
                },
                "image_encoder": {
                    "class_path": "motionrag_tpu.models.encoders.condition.CLIPImageEmbedder",
                    "init_args": {"image_size": 28, "patch_size": 14, "dim": 32,
                                  "depth": 1, "heads": 2, "projection_dim": 48,
                                  "dtype": "float32"},
                },
                "dtype": "float32",
            },
        },
        "data": {
            "class_path": "motionrag_tpu.data.datamodule.VideoDataModule",
            "init_args": {
                "video_size": [64, 64],
                "video_length": 4,
                "video_dir": str(ws / "videos"),
                "train_annotation_path": [str(ws / "train.json")],
                "val_annotation_path": [str(ws / "train.json")],
                "test_annotation_path": [str(ws / "train.json")],
                "train_clip_selector": {"class_path": "motionrag_tpu.data.clip_selector.AllSelector"},
                "val_clip_selector": {"class_path": "motionrag_tpu.data.clip_selector.AllSelector"},
                "test_clip_selector": {"class_path": "motionrag_tpu.data.clip_selector.AllSelector"},
                "num_workers": 2,
                "train_batch_size": 1,
                "test_batch_size": 1,
                "ref_video_type": "rag_text",
                "ref_video_num": 2,
                "rag_prompt_type": "motion",
                "rag_db_path": str(ws / "rag_db"),
                "rag_table_name": "motion_caption",
                "text_embedder": "hash-32",
                "cache_dir": str(ws / "cache"),
            },
        },
    }
    path = ws / "config.yml"
    path.write_text(yaml.safe_dump(cfg))
    return path


@pytest.mark.slow
def test_cli_fit_then_test(workspace):
    config = make_config(workspace)
    from main import cli_main

    model, data, trainer, ckpt = cli_main(["fit", "-c", str(config)], run=False)
    state = trainer.fit(model, data, ckpt_path=ckpt)
    assert int(np.asarray(state.step)) == 2
    # checkpoint written (incremental)
    ckpts = list((workspace / "runs" / "checkpoints").glob("step_*"))
    assert ckpts, "no checkpoint written"

    trainer._eval_loop(model, state, data, "test", limit=1)
    videos = sorted((workspace / "outputs" / "test").glob("*.mp4"))
    assert videos, "no generated videos saved"
    gt = sorted((workspace / "outputs" / "test_gt").glob("*.mp4"))
    assert gt, "no gt videos saved"
