#!/usr/bin/env python
"""Training-step benchmark on one TPU chip, through the REAL Trainer path
(Trainer.setup + the jitted donated train_step — identical to `main.py fit`
minus the data loader).

Workloads (the reference's five training stages, config-exact scales — see
tools/train_workloads.py for the per-stage wiring and provenance):

- ``cama``: stage-2 Motion Context Transformer training
- ``dc_adapter``: stage-1 DynamiCrafter Motion-Adapter training
- ``svd_adapter``: stage-1 SVD Motion-Adapter training
- ``cog_adapter``: stage-1 CogVideoX Motion-Adapter training
- ``action_clip``: ActionCLIP contrastive pretraining

Timing per the tunnel rules: distinct batches per step (the tunnel de-dupes
identical executions), completion forced via the scalar loss fetch that the
fit loop itself does at log steps.

Usage: python tools/bench_train.py [--workload NAME] [--small]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    from tools.train_workloads import WORKLOADS, build_workload

    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=WORKLOADS, default="cama")
    ap.add_argument("--small", action="store_true", help="tiny CPU smoke run")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--fresh-cache", action="store_true",
                    help="bypass the persistent compile cache so "
                    "first_step_incl_compile_s measures a TRUE cold compile "
                    "(not a cached-executable load)")
    ap.add_argument("--batch", type=int, default=0,
                    help="override the per-chip batch (0 = config-exact). "
                    "A reduced value is the per-chip MICROBATCH: the "
                    "config-exact global batch is reached by gradient "
                    "accumulation (accumulate_grad_batches in the trainer), "
                    "so a b=1 measurement x accum factor is the honest "
                    "single-16GB-chip read of the reference's per-80GB-GPU "
                    "batch")
    args = ap.parse_args()

    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    if not args.fresh_cache:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from motionrag_tpu.parallel.mesh import MeshConfig
    from motionrag_tpu.training.trainer import Trainer

    module, make_batch, metric, lr = build_workload(
        args.workload, args.small, args.batch)

    trainer = Trainer(
        max_steps=args.steps,
        mesh_config=MeshConfig(dp=1),
        optimizer_config={"learning_rate": lr},
        default_root_dir="/tmp/bench_train_runs",
        checkpoint_every_n_steps=0,
        val_check_interval=0,
        log_every_n_steps=10_000,
        # every reference training config sets precision: bf16-true
        # (configs/*/action_injection.yml:8) — params AND Adam moments in
        # bf16, Lightning bf16-true semantics
        precision="bf16-true",
    )
    batch = make_batch(0)
    t0 = time.time()
    state = trainer.setup(module, batch)
    init_s = time.time() - t0
    print(f"setup (init + optimizer) in {init_s:.1f}s", file=sys.stderr,
          flush=True)

    step_fn = trainer._make_train_step(module)

    def run(seed, state):
        state, metrics = step_fn(state, trainer._shard_batch(make_batch(seed)))
        # force completion the way the fit loop's log step does
        loss = float(jax.device_get(metrics["train/main_loss"]))
        return state, loss

    t0 = time.time()
    state, loss = run(1, state)
    compile_s = time.time() - t0
    print(f"first step (incl compile): {compile_s:.1f}s loss={loss:.4f}",
          file=sys.stderr, flush=True)

    times = []
    for i in range(2, 2 + args.steps):
        t0 = time.time()
        state, loss = run(i, state)
        times.append(time.time() - t0)
        print(f"step {i}: {times[-1]:.2f}s loss={loss:.4f}", file=sys.stderr,
              flush=True)

    best = min(times)
    print(json.dumps({
        "metric": metric,
        "value": round(best, 3),
        "unit": "s/step",
        "vs_baseline": None,
        "detail": {"steps_per_sec": round(1.0 / best, 4),
                   "first_step_incl_compile_s": round(compile_s, 1),
                   "setup_s": round(init_s, 1)},
    }))


if __name__ == "__main__":
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.tpu_lock import tpu_lock

    # tpu_lock itself skips the flock for --small CPU smoke runs
    with tpu_lock():
        main()
