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


def _base_config(ws: Path, name: str, video_length: int, model: dict,
                 video_size=(32, 32)) -> Path:
    cfg = {
        "seed_everything": 0,
        "trainer": {
            "max_steps": 2,
            "val_check_interval": 0,
            "log_every_n_steps": 1,
            "checkpoint_every_n_steps": 2,
            "default_root_dir": str(ws / f"runs_{name}"),
            "limit_test_batches": 1,
            "mesh_config": {"class_path": "motionrag_tpu.parallel.mesh.MeshConfig",
                            "init_args": {"dp": 1}},
            "callbacks": [
                {"class_path": "motionrag_tpu.training.callbacks.SaveVideo",
                 "init_args": {"save_dir": str(ws / f"outputs_{name}")}},
            ],
        },
        "model": model,
        "data": {
            "class_path": "motionrag_tpu.data.datamodule.VideoDataModule",
            "init_args": {
                "video_size": list(video_size),
                "video_length": video_length,
                "video_dir": str(ws / "videos"),
                "train_annotation_path": [str(ws / "train.json")],
                "test_annotation_path": [str(ws / "train.json")],
                "train_clip_selector": {"class_path": "motionrag_tpu.data.clip_selector.AllSelector"},
                "test_clip_selector": {"class_path": "motionrag_tpu.data.clip_selector.AllSelector"},
                "tokenizer": {"class_path": "motionrag_tpu.data.tokenizers.HashTokenizer",
                              "init_args": {"vocab_size": 100, "max_length": 12}},
                "num_workers": 0,
                "train_batch_size": 1,
                "test_batch_size": 1,
                "cache_dir": str(ws / f"cache_{name}"),
            },
        },
    }
    path = ws / f"config_{name}.yml"
    path.write_text(yaml.safe_dump(cfg))
    return path


def _run_fit_and_test(ws: Path, name: str, config: Path):
    from main import cli_main

    model, data, trainer, ckpt = cli_main(["fit", "-c", str(config)], run=False)
    state = trainer.fit(model, data, ckpt_path=ckpt)
    assert int(np.asarray(state.step)) == 2
    trainer._eval_loop(model, state, data, "test", limit=1)
    videos = sorted((ws / f"outputs_{name}" / "test").glob("*.mp4"))
    assert videos, "no generated videos saved"


@pytest.mark.slow
def test_cli_fit_then_test_dynamicrafter(workspace):
    """Tiny DynamiCrafter config through the full CLI fit+test path
    (reference integration path for configs/dynamicrafter/*, SURVEY §4)."""
    model = {
        "class_path": "motionrag_tpu.models.dynamicrafter.module.DynamiCrafterModule",
        "init_args": {
            "full_trainable_modules": ["unet.conv_out"],
            "null_prompt_ids": [1, 1],
            "eval_pipeline_call_kwargs": {
                "num_frames": 4, "height": 32, "width": 32, "ddim_steps": 2,
                "decode_chunk_size": 4,
            },
            "unet": {
                "class_path": "motionrag_tpu.models.dynamicrafter.unet3d.UNet3D",
                "init_args": {"model_channels": 32, "channel_mult": [1, 2],
                              "num_res_blocks": 1, "attention_resolutions": [1, 2],
                              "num_head_channels": 16, "context_dim": 32,
                              "dtype": "float32"},
            },
            "vae": {
                "class_path": "motionrag_tpu.models.dynamicrafter.vae.AutoencoderKL2D",
                "init_args": {"block_out_channels": [32, 32, 32, 32], "dtype": "float32"},
            },
            "text_encoder": {
                "class_path": "motionrag_tpu.models.encoders.clip_text.CLIPTextEncoder",
                "init_args": {"vocab_size": 100, "max_length": 12, "dim": 32,
                              "depth": 2, "heads": 2, "dtype": "float32"},
            },
            "image_encoder": {
                "class_path": "motionrag_tpu.models.encoders.condition.CLIPImageEmbedder",
                "init_args": {"image_size": 28, "patch_size": 14, "dim": 32,
                              "depth": 1, "heads": 2, "pooled": False,
                              "dtype": "float32"},
            },
            "image_proj": {
                "class_path": "motionrag_tpu.models.resampler.Resampler",
                "init_args": {"dim": 32, "depth": 1, "dim_head": 8, "heads": 4,
                              "num_queries": 3, "embedding_dim": 32,
                              "output_dim": 32, "video_length": 4,
                              "dtype": "float32"},
            },
            "dtype": "float32",
        },
    }
    config = _base_config(workspace, "dc", 4, model)
    _run_fit_and_test(workspace, "dc", config)


@pytest.mark.slow
def test_cli_fit_then_eval_motion_transformer(workspace):
    """Stage-2 CAMA training (reference configs/motion_transformer/*,
    SURVEY §3.2) through the full CLI: fit on RAG-retrieved refs, then the
    loss-based eval path (no eval_pipeline on the module)."""
    import yaml

    enc = {"num_frames": 4, "image_size": 32, "dim": 32, "depth": 1,
           "heads": 2, "dtype": "float32"}
    rs = lambda ed: {"class_path": "motionrag_tpu.models.resampler.Resampler",
                     "init_args": {"dim": 32, "depth": 1, "dim_head": 8,
                                   "heads": 4, "num_queries": 3,
                                   "embedding_dim": ed, "output_dim": 32,
                                   "dtype": "float32"}}
    model = {
        "class_path": "motionrag_tpu.models.cama_module.ActionTransformerModule",
        "init_args": {
            "full_trainable_modules": ["transformer", "condition_proj"],
            "freeze_modules": ["condition_model", "vision_model", "vision_proj"],
            "condition_transformer": {
                "class_path": "motionrag_tpu.models.cama.ActionTransformer",
                "init_args": {
                    "vision_model": {
                        "class_path": "motionrag_tpu.models.encoders.condition.VideoMAEEmbedder",
                        "init_args": enc},
                    "vision_proj": rs(32),
                    "condition_model": {
                        "class_path": "motionrag_tpu.models.encoders.condition.DINOImageEmbedder",
                        "init_args": {"image_size": 28, "dim": 32, "depth": 1,
                                      "heads": 2, "dtype": "float32"}},
                    "condition_proj": rs(32),
                    "condition_pe": {
                        "class_path": "motionrag_tpu.models.cama.SinusoidPositionalEmbeddings",
                        "init_args": {"dim": 32, "max_length": 256}},
                    "vision_pe": {
                        "class_path": "motionrag_tpu.models.cama.SinusoidPositionalEmbeddings",
                        "init_args": {"dim": 32, "max_length": 64}},
                    "transformer": {
                        "class_path": "motionrag_tpu.models.layers.TransformerEncoder",
                        "init_args": {"num_layers": 1, "d_model": 32, "nhead": 4,
                                      "dim_feedforward": 64, "activation": "gelu",
                                      "norm_first": False}},
                },
            },
        },
    }
    config = _base_config(workspace, "mt", 4, model)
    # stage-2 trains on RAG-retrieved reference videos
    cfg = yaml.safe_load(config.read_text())
    cfg["data"]["init_args"].update(
        ref_video_type="rag_text", ref_video_num=2, rag_prompt_type="motion",
        rag_db_path=str(workspace / "rag_db"), rag_table_name="motion_caption",
        text_embedder="hash-32",
    )
    config.write_text(yaml.safe_dump(cfg))

    from main import cli_main

    model_obj, data, trainer, ckpt = cli_main(["fit", "-c", str(config)], run=False)
    state = trainer.fit(model_obj, data, ckpt_path=ckpt)
    assert int(np.asarray(state.step)) == 2
    results = trainer._eval_loop(model_obj, state, data, "test", limit=1)
    assert np.isfinite(results["test/loss"])
    assert "val/main_loss" in results


def _tiny_cog_model() -> dict:
    return {
        "class_path": "motionrag_tpu.models.cogvideox.module.CogVideoX5B",
        "init_args": {
            "full_trainable_modules": ["transformer.proj_out"],
            "eval_pipeline_call_kwargs": {
                "num_frames": 5, "height": 32, "width": 32,
                "num_inference_steps": 2, "steps_per_launch": None,
            },
            "transformer": {
                "class_path": "motionrag_tpu.models.cogvideox.dit.CogVideoXTransformer3D",
                "init_args": {"in_channels": 8, "out_channels": 4, "dim": 64,
                              "depth": 2, "heads": 4, "head_dim": 16,
                              "text_embed_dim": 32, "time_embed_dim": 32,
                              "dtype": "float32"},
            },
            "vae": {
                "class_path": "motionrag_tpu.models.cogvideox.vae3d.CogVideoXVAE",
                "init_args": {"latent_channels": 4,
                              "block_out_channels": [32, 32, 32, 32],
                              "layers_per_block": 1, "dtype": "float32"},
            },
            "text_encoder": {
                "class_path": "motionrag_tpu.models.encoders.t5.T5Encoder",
                "init_args": {"vocab_size": 100, "dim": 32, "depth": 1,
                              "heads": 2, "head_dim": 16, "ff_dim": 64,
                              "dtype": "float32"},
            },
            "dtype": "float32",
        },
    }


@pytest.mark.slow
def test_cli_fit_then_test_cogvideox(workspace):
    """Tiny CogVideoX config through the full CLI fit+test path."""
    config = _base_config(workspace, "cog", 5, _tiny_cog_model())
    _run_fit_and_test(workspace, "cog", config)


@pytest.mark.slow
def test_cli_fit_cogvideox_tensor_parallel(workspace):
    """The TP execution path runnable purely via config (the
    MotionRAG_open_tp.yml pattern): dp=1 x tp=2 mesh + the DiT partition
    rules, full CLI fit+test on the virtual CPU mesh."""
    config = _base_config(workspace, "cogtp", 5, _tiny_cog_model())
    cfg = yaml.safe_load(config.read_text())
    cfg["trainer"]["mesh_config"] = {
        "class_path": "motionrag_tpu.parallel.mesh.MeshConfig",
        "init_args": {"dp": 1, "tp": 2},
    }
    cfg["trainer"]["partition_rules"] = {
        "class_path": "motionrag_tpu.models.cogvideox.dit.tp_partition_rules",
    }
    config.write_text(yaml.safe_dump(cfg))
    _run_fit_and_test(workspace, "cogtp", config)


@pytest.mark.slow
def test_cli_fit_cogvideox_sequence_parallel(workspace):
    """Sequence-parallel execution runnable purely via config: dp=1 x sp=2
    mesh + DiT sequence_parallel=true (token-axis sharding constraints;
    the flash q-seq rule makes this all-gather-KV seq parallelism on TPU).
    Full CLI fit+test on the virtual CPU mesh."""
    config = _base_config(workspace, "cogsp", 5, _tiny_cog_model())
    cfg = yaml.safe_load(config.read_text())
    cfg["trainer"]["mesh_config"] = {
        "class_path": "motionrag_tpu.parallel.mesh.MeshConfig",
        "init_args": {"dp": 1, "sp": 2},
    }
    cfg["model"]["init_args"]["transformer"]["init_args"]["sequence_parallel"] = True
    config.write_text(yaml.safe_dump(cfg))
    _run_fit_and_test(workspace, "cogsp", config)
