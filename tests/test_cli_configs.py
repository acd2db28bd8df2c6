"""Config/CLI integration: every shipped config must instantiate into live
model/data/trainer objects through the class_path resolver (no heavy param
init — constructors are lazy)."""

from pathlib import Path

import pytest

CONFIG_DIR = Path(__file__).parent.parent / "configs"
ALL_CONFIGS = sorted(str(p.relative_to(CONFIG_DIR.parent)) for p in CONFIG_DIR.rglob("*.yml"))


@pytest.mark.parametrize("config", ALL_CONFIGS)
def test_config_instantiates(config):
    from main import cli_main

    model, data, trainer, ckpt = cli_main(["fit", "-c", config], run=False)
    assert model is not None
    assert hasattr(model, "init_params") or hasattr(model, "loss")
    assert hasattr(data, "train_dataloader")
    assert trainer is not None


def test_cli_overrides():
    from main import cli_main

    model, data, trainer, _ = cli_main(
        ["fit", "-c", "configs/svd/action_injection.yml",
         "--data.train_batch_size=7", "--trainer.max_steps=3"],
        run=False,
    )
    assert data.batch_sizes["train"] == 7
    assert trainer.max_steps == 3


def test_wildcard_pattern_selects_action_branches():
    from motionrag_tpu.training.optim import pattern_matches

    path = ["unet", "input_0_0_spatial", "blocks_0", "attn2", "to_q_a", "kernel"]
    # path_tokens would split input_0_0_spatial; simulate canonical form
    path = ["unet", "input", "0", "0", "spatial", "blocks", "0", "attn2", "to_q_a", "kernel"]
    assert pattern_matches(path, "unet.*.to_q_a")
    assert not pattern_matches(path, "unet.*.to_k_a")
    assert pattern_matches(path, "unet")
    assert not pattern_matches(path, "vae.*.to_q_a")
