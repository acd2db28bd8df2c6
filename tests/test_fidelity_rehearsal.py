"""One-command fidelity rehearsal: port -> generate -> score, end to end.

The day real released checkpoints arrive, the scoring run must be a no-op:
this test rehearses the EXACT surfaces with a synthetic (random-weight)
DynamiCrafter checkpoint in the released lvdm layout —

  1. ``tools/port_checkpoint.py --family dynamicrafter`` converts a
     Lightning-style ``model.ckpt`` (model.diffusion_model.* /
     first_stage_model.* / cond_stage_model.model.* /
     embedder.model.visual.* / image_proj_model.*) to Orbax,
  2. ``main.py test -c <cfg> --ckpt_path <orbax>`` restores it through the
     real CLI and generates videos (SaveVideo gt + samples),
  3. ``metrics/main.py`` scores the two directories into a JSON report

(reference eval protocol ``src/metrics/main.py:82-137``)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import torch
import yaml

sys.path.insert(0, "/root/repo/tests")

REPO = Path("/root/repo")


def _synthetic_dc_checkpoint(path: Path):
    """Random-weight tiny DC model in the released single-file layout."""
    from test_activation_parity import (
        _TOpenCLIPText, _TOpenCLIPVisual, _import_lvdm, _randomize)

    _import_lvdm()
    from DynamiCrafter.lvdm.models.autoencoder import AutoencoderKL
    from DynamiCrafter.lvdm.modules.encoders.resampler import Resampler as TRes
    from DynamiCrafter.lvdm.modules.networks.openaimodel3d import UNetModel

    unet = UNetModel(
        in_channels=8, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], channel_mult=[1, 2], context_dim=32,
        num_head_channels=16, transformer_depth=1, use_linear=True,
        temporal_conv=True, temporal_attention=True, use_relative_position=False,
        use_causal_attention=False, temporal_length=4, addition_attention=True,
        image_cross_attention=True, fs_condition=True, dropout=0.0,
    )
    vae = AutoencoderKL(
        dict(double_z=True, z_channels=4, resolution=32, in_channels=3,
             out_ch=3, ch=32, ch_mult=[1, 1, 2, 2], num_res_blocks=2,
             attn_resolutions=[], dropout=0.0),
        {"target": "torch.nn.Identity"}, embed_dim=4,
    )
    text = _TOpenCLIPText(vocab=100, d=32, depth=2, heads=2, max_len=12, proj_dim=32)
    visual = _TOpenCLIPVisual(d=32, depth=2, heads=2, img=28, patch=14)
    proj = TRes(dim=32, depth=1, dim_head=8, heads=4, num_queries=3,
                embedding_dim=32, output_dim=32, ff_mult=4, video_length=4)
    sd = {}
    for prefix, mod in (
        ("model.diffusion_model.", unet),
        ("first_stage_model.", vae),
        ("cond_stage_model.model.", text),
        ("embedder.model.visual.", visual),
        ("image_proj_model.", proj),
    ):
        _randomize(mod, seed=len(prefix), scale=0.05)
        for k, v in mod.state_dict().items():
            sd[prefix + k] = v
    torch.save({"state_dict": sd}, path)


def _write_config(ws: Path) -> Path:
    from motionrag_tpu.data.video_io import write_video

    rng = np.random.default_rng(0)
    (ws / "videos").mkdir()
    annotations = []
    for i in range(2):
        frames = rng.integers(0, 255, (24, 48, 64, 3), dtype=np.uint8)
        write_video(ws / "videos" / f"v{i}.mp4", frames, fps=8)
        annotations.append({"video": f"v{i}.mp4", "start_sec": 0.0,
                            "end_sec": 3.0, "id": i, "llm_caption": f"clip {i}"})
    (ws / "train.json").write_text(json.dumps(annotations))

    cfg = {
        "seed_everything": 0,
        "trainer": {
            "max_steps": 1, "val_check_interval": 0, "log_every_n_steps": 1,
            "checkpoint_every_n_steps": 0, "limit_test_batches": 2,
            "default_root_dir": str(ws / "runs"),
            "callbacks": [
                {"class_path": "motionrag_tpu.training.callbacks.SaveVideo",
                 "init_args": {"save_dir": str(ws / "outputs"), "save_gt": True}},
            ],
        },
        "model": {
            "class_path": "motionrag_tpu.models.dynamicrafter.module.DynamiCrafterModule",
            "init_args": {
                "full_trainable_modules": ["unet.conv_out"],
                "null_prompt_ids": [1, 1],
                "eval_pipeline_call_kwargs": {
                    "num_frames": 4, "height": 32, "width": 32,
                    "ddim_steps": 2, "decode_chunk_size": 8,
                },
                "unet": {"class_path": "motionrag_tpu.models.dynamicrafter.unet3d.UNet3D",
                         "init_args": {"model_channels": 32, "channel_mult": [1, 2],
                                       "num_res_blocks": 1,
                                       "attention_resolutions": [1, 2],
                                       "num_head_channels": 16, "context_dim": 32,
                                       "dtype": "float32"}},
                "vae": {"class_path": "motionrag_tpu.models.dynamicrafter.vae.AutoencoderKL2D",
                        "init_args": {"block_out_channels": [32, 32, 64, 64],
                                      "dtype": "float32"}},
                "text_encoder": {
                    "class_path": "motionrag_tpu.models.encoders.clip_text.CLIPTextEncoder",
                    "init_args": {"vocab_size": 100, "max_length": 12, "dim": 32,
                                  "depth": 2, "heads": 2, "dtype": "float32"}},
                "image_encoder": {
                    "class_path": "motionrag_tpu.models.encoders.condition.CLIPImageEmbedder",
                    "init_args": {"image_size": 28, "patch_size": 14, "dim": 32,
                                  "depth": 2, "heads": 2, "pooled": False,
                                  "final_tokens": True, "dtype": "float32"}},
                "image_proj": {
                    "class_path": "motionrag_tpu.models.resampler.Resampler",
                    "init_args": {"dim": 32, "depth": 1, "dim_head": 8, "heads": 4,
                                  "num_queries": 3, "embedding_dim": 32,
                                  "output_dim": 32, "video_length": 4,
                                  "dtype": "float32"}},
                "dtype": "float32",
            },
        },
        "data": {
            "class_path": "motionrag_tpu.data.datamodule.VideoDataModule",
            "init_args": {
                "video_size": [32, 32], "video_length": 4,
                "video_dir": str(ws / "videos"),
                "train_annotation_path": [str(ws / "train.json")],
                "test_annotation_path": [str(ws / "train.json")],
                "train_clip_selector": {"class_path": "motionrag_tpu.data.clip_selector.AllSelector"},
                "test_clip_selector": {"class_path": "motionrag_tpu.data.clip_selector.AllSelector"},
                "tokenizer": {"class_path": "motionrag_tpu.data.tokenizers.HashTokenizer",
                              "init_args": {"vocab_size": 100, "max_length": 12}},
                "num_workers": 0, "train_batch_size": 1, "test_batch_size": 1,
                "cache_dir": str(ws / "cache"),
            },
        },
    }
    path = ws / "config.yml"
    path.write_text(yaml.safe_dump(cfg))
    return path


def _run(cmd, **kw):
    env = dict(os.environ, JAX_PLATFORMS="")
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1200,
                          cwd=str(REPO), env=env, **kw)
    assert proc.returncode == 0, (
        f"{' '.join(map(str, cmd))} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-3000:]}")
    return proc


@pytest.mark.slow
def test_port_generate_score_rehearsal(tmp_path):
    ws = tmp_path
    _synthetic_dc_checkpoint(ws / "model.ckpt")
    config = _write_config(ws)

    # 1. port: released layout -> Orbax (real CLI)
    _run([sys.executable, "tools/port_checkpoint.py", "--family", "dynamicrafter",
          "--src", str(ws / "model.ckpt"), "--out", str(ws / "ported"),
          "--channel-mult", "1", "2", "--num-res-blocks", "1",
          "--attention-levels", "0", "1"])

    # 2. generate: real CLI test run restoring the ported params
    _run([sys.executable, "main.py", "test", "-c", str(config),
          "--ckpt_path", str(ws / "ported"), "--platform", "cpu"])
    gen = sorted((ws / "outputs" / "test").glob("*.mp4"))
    gt = sorted((ws / "outputs" / "test_gt").glob("*.mp4"))
    assert gen and gt, f"missing outputs: gen={gen} gt={gt}"

    # 3. score: offline metric CLI -> JSON report
    report_path = ws / "report.json"
    _run([sys.executable, "-m", "motionrag_tpu.metrics.main",
          "--gt_path", str(ws / "outputs" / "test_gt"),
          "--generate_path", str(ws / "outputs" / "test"),
          "--num_frames", "4", "--metrics", "motion",
          "--output", str(report_path), "--platform", "cpu"])
    report = json.loads(report_path.read_text())
    assert "motion" in report and np.isfinite(report["motion"])
