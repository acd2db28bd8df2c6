#!/usr/bin/env python
"""Learning-dynamics evidence: overfit a FIXED tiny synthetic batch through
the REAL Trainer path (bf16-true + remat + scan + masked optimizer — exactly
the tools/bench_train.py configuration) and record the loss curve.

Why: every fit test asserts finiteness over <=2 steps; s/step benches measure
speed. Neither would catch a sign/masking/LR-plumbing bug. This harness shows
the masked-adapter training signal actually DESCENDS, per stage, matching the
reference's training loops (src/projects/cogvideox/module.py:82-143,
src/projects/svd/module.py:130-224, condition/module.py:15-85,278-290).

Protocol: the train step is the Trainer's own jitted donated step, fed the
SAME host batch every step (state.rng advances, so diffusion stages see fresh
noise/sigma draws each step — the honest stochastic objective; it also keeps
the tunnel from de-duping executions, since the state input changes).
Progress is measured by a FIXED-rng evaluation loss (deterministic: same
batch, same noise, same sigma) every ``eval_every`` steps — descent of that
deterministic loss is the learning evidence, unpolluted by per-step noise
resampling.

Usage: python tools/overfit_train.py --workload cama --steps 300
Writes bench_results/overfit_<workload>.json.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")


def run_overfit(workload: str, small: bool, steps: int, lr: float | None,
                eval_every: int = 10, batch: int = 0, log=print):
    """Returns the result dict (also what gets written to JSON)."""
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.parallel.mesh import MeshConfig
    from motionrag_tpu.training.trainer import Trainer
    from tools.train_workloads import build_workload

    # overfit=True zeroes the CFG drop probabilities so the fixed-rng eval
    # loss always sees the adapter branch (see train_workloads.build_workload)
    module, make_batch, metric, cfg_lr = build_workload(
        workload, small, batch, overfit=True)
    lr = cfg_lr if lr is None else lr

    trainer = Trainer(
        max_steps=steps,
        mesh_config=MeshConfig(dp=1),
        optimizer_config={"learning_rate": lr},
        default_root_dir="/tmp/overfit_runs",
        checkpoint_every_n_steps=0,
        val_check_interval=0,
        log_every_n_steps=10_000,
        precision="bf16-true",
    )
    host_batch = make_batch(0)  # the one fixed batch being overfit
    t0 = time.time()
    state = trainer.setup(module, host_batch)
    setup_s = time.time() - t0

    # Stand in for a pretrained backbone: the lvdm zero_module idiom
    # (reference openaimodel3d.py zero-inits conv_out / proj_out / resblock
    # conv2) makes a RANDOM-init frozen backbone block all gradient flow to
    # the trainable adapters (a frozen all-zero conv_out multiplies every
    # upstream cotangent by zero — forever, since the mask keeps it zero).
    # Real training loads pretrained (nonzero) weights there; the overfit
    # protocol replaces frozen all-zero kernels with small noise instead.
    zero_flags = jax.device_get(jax.jit(
        lambda p: jax.tree.map(lambda x: jnp.all(x == 0), p))(state.params))
    host_rng = __import__("numpy").random.default_rng(0)
    n_fixed = [0]

    def _fix(leaf, m, z):
        if m or leaf.ndim < 2 or not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        if not bool(z):
            return leaf
        n_fixed[0] += 1
        # lecun-normal scale (std = fan_in^-1/2): the magnitude a trained
        # nonzero layer would have. A flat small sd leaves adaLN-zero gates
        # nearly dead and hides the adapters' influence on the loss.
        fan_in = 1
        for d in leaf.shape[:-1]:
            fan_in *= d
        noise = host_rng.normal(0.0, fan_in ** -0.5, leaf.shape)
        return jax.device_put(jnp.asarray(noise, leaf.dtype), leaf.sharding)

    state = state.replace(params=jax.tree.map(
        _fix, state.params, trainer.mask, zero_flags))
    if n_fixed[0]:
        log(f"[{workload}] randomized {n_fixed[0]} frozen zero-init kernels "
            "(pretrained-backbone stand-in)")

    step_fn = trainer._make_train_step(module)
    sharded = trainer._shard_batch(host_batch)
    merged = trainer._merged_params
    eval_rng = jax.random.key(1234)

    @jax.jit
    def eval_loss(params, batch, rng):
        # deterministic: fixed batch + fixed rng -> descent == learning.
        # batch/rng MUST be arguments, not closed-over: jit embeds closed-over
        # device arrays as HLO constants, and the CAMA batch (b=8 K=9 16f
        # 224px) pushed the remote-compile upload over the relay's body limit
        # (HTTP 413, deterministic — observed round 5).
        loss, _ = module.loss(merged(params), batch, rng)
        return loss

    def _with_compile_retries(fn, what, tries=3):
        # the remote compile service is flaky for big modules (CLAUDE.md:
        # broken-pipe / RESOURCE_EXHAUSTED are compile-side); retry the
        # compile-triggering first calls the way bench.py does
        for attempt in range(tries):
            try:
                return fn()
            except jax.errors.JaxRuntimeError as e:
                if attempt == tries - 1:
                    raise
                log(f"[{workload}] {what} compile attempt {attempt + 1} "
                    f"failed ({str(e)[:120]}); retrying in 30s")
                time.sleep(30)

    curve = []  # (step, fixed-rng eval loss)
    t0 = time.time()
    with trainer.mesh:
        curve.append((0, float(jax.device_get(_with_compile_retries(
            lambda: eval_loss(state.params, sharded, eval_rng), "eval")))))
        log(f"[{workload}] step 0: eval_loss={curve[-1][1]:.6f} "
            f"(setup {setup_s:.1f}s)")
        for step in range(1, steps + 1):
            if step == 1:
                state, metrics = _with_compile_retries(
                    lambda: step_fn(state, sharded), "train-step")
            else:
                state, metrics = step_fn(state, sharded)
            if step % eval_every == 0 or step == steps:
                el = float(jax.device_get(
                    eval_loss(state.params, sharded, eval_rng)))
                tl = float(jax.device_get(metrics["train/main_loss"]))
                curve.append((step, el))
                log(f"[{workload}] step {step}: eval_loss={el:.6f} "
                    f"train_loss={tl:.6f}")
    total_s = time.time() - t0

    first = curve[0][1]
    last = curve[-1][1]
    best = min(v for _, v in curve)
    result = {
        "metric": f"overfit: {metric}",
        "workload": workload,
        "small": small,
        "steps": steps,
        "learning_rate": lr,
        "eval_rng_fixed": True,
        "first_eval_loss": first,
        "final_eval_loss": last,
        "best_eval_loss": best,
        "reduction_factor": first / max(best, 1e-12),
        "wall_s": round(total_s, 1),
        "curve": [[s, round(v, 8)] for s, v in curve],
    }
    return result


def main():
    from tools.train_workloads import WORKLOADS

    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=WORKLOADS, default="cama")
    ap.add_argument("--small", action="store_true", help="tiny CPU run")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--lr", type=float, default=None,
                    help="override the config-exact learning rate (an overfit "
                    "protocol knob; the default is the shipped config's LR)")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    result = run_overfit(args.workload, args.small, args.steps, args.lr,
                         args.eval_every, args.batch,
                         log=lambda m: print(m, file=sys.stderr, flush=True))
    out = args.out or f"/root/repo/bench_results/overfit_{args.workload}.json"
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    Path(out).write_text(json.dumps(result, indent=1))
    print(json.dumps({k: v for k, v in result.items() if k != "curve"}))


if __name__ == "__main__":
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.tpu_lock import tpu_lock

    with tpu_lock():
        main()
