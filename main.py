#!/usr/bin/env python
"""CLI entry: ``python main.py {fit,test} -c configs/<family>/<name>.yml``
with dotted overrides (``--data.train_batch_size=2``) — the same public
surface as the reference's LightningCLI (reference ``main.py:7-16``),
resolved by our class_path instantiation layer (motionrag_tpu/config.py).
"""

from __future__ import annotations

import argparse
import sys


def build_from_config(cfg: dict):
    from motionrag_tpu.config import instantiate, instantiate_tree

    model = instantiate(cfg["model"])
    data = instantiate(cfg["data"])

    trainer_cfg = dict(cfg.get("trainer") or {})
    callbacks = [instantiate_tree(cb) if isinstance(cb, dict) else cb
                 for cb in (trainer_cfg.pop("callbacks", None) or [])]
    trainer_cfg = {k: instantiate_tree(v) for k, v in trainer_cfg.items()}
    from motionrag_tpu.training.trainer import Trainer

    trainer = Trainer(callbacks=callbacks, **trainer_cfg)
    return model, data, trainer


def cli_main(argv=None, run: bool = True):
    ap = argparse.ArgumentParser(description="motionrag-tpu")
    ap.add_argument("subcommand", choices=["fit", "test", "validate"], nargs="?")
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--ckpt_path", default=None)
    ap.add_argument(
        "--platform", default=None, choices=["cpu", "tpu", "axon"],
        help="force the JAX platform (the JAX_PLATFORMS env var is re-pinned "
        "by the TPU-tunnel plugin, so an explicit flag is the reliable path "
        "to a CPU run; must take effect before first backend use)",
    )
    ap.add_argument(
        "--coordinator", default=None,
        help="multi-host: coordinator address host:port for "
        "jax.distributed.initialize (or MRT_COORDINATOR env); on TPU pods "
        "leave unset — topology is auto-discovered",
    )
    ap.add_argument("--num-processes", type=int, default=None,
                    help="multi-host: total process count (or MRT_NUM_PROCESSES)")
    ap.add_argument("--process-id", type=int, default=None,
                    help="multi-host: this process's index (or MRT_PROCESS_ID)")
    args, overrides = ap.parse_known_args(argv)

    import os

    platform = args.platform or os.environ.get("MRT_PLATFORM")
    if platform:
        import jax

        if platform == "tpu" and os.environ.get("JAX_PLATFORMS", "") == "axon":
            # the tunnel plugin registers the TPU backend under the name
            # 'axon'; accept the natural 'tpu' spelling in that environment
            platform = "axon"
        jax.config.update("jax_platforms", platform)

    # multi-host bootstrap (no-op single-process; see parallel/distributed.py)
    # — must run after platform pinning and before the first device query
    from motionrag_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    from motionrag_tpu.config import apply_overrides, load_yaml

    cfg = load_yaml(args.config)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    seed = cfg.get("seed_everything")
    if seed is not None:
        import random

        import numpy as np

        random.seed(seed)
        np.random.seed(seed)

    model, data, trainer = build_from_config(cfg)
    ckpt = args.ckpt_path or cfg.get("ckpt_path")
    # save the resolved config into the run dir (reference
    # WandbSaveConfigCallback, src/utils/logger.py:8-50)
    try:
        import yaml as _yaml

        trainer.root_dir.mkdir(parents=True, exist_ok=True)
        (trainer.root_dir / "config.yml").write_text(_yaml.safe_dump(cfg))
        trainer.logger.log_config(cfg)
    except Exception:  # noqa: BLE001
        pass
    if not run:
        return model, data, trainer, ckpt

    if args.subcommand == "fit":
        trainer.fit(model, data, ckpt_path=ckpt)
    elif args.subcommand in ("test", "validate"):
        trainer.test(model, data, ckpt_path=ckpt)
    else:
        ap.error("subcommand required (fit/test)")


if __name__ == "__main__":
    cli_main(sys.argv[1:])
