"""Learning-dynamics regression guards (VERDICT r4 #1): the REAL Trainer
path (bf16-true + masked optimizer + remat/scan where configured) must make
the fixed-rng evaluation loss DESCEND when overfitting one fixed batch —
finiteness alone would not catch a sign/masking/LR-plumbing bug.

Small-scale CPU counterparts of the on-TPU runs in
``bench_results/overfit_*.json`` (tools/overfit_train.py). Thresholds sit
well below the observed descent (e.g. cama reaches 0.83x in 30 steps;
asserting <=0.90x) so they fail on broken plumbing, not on noise — the rng
stream is fully deterministic, so these are stable.

The diffusion-adapter stages train only the action branches against a
frozen backbone; descent there is real but bounded by adapter capacity
(a few percent on a random backbone stand-in). cog_adapter's reachable
slice at toy scale is <0.5% — below a robust descent threshold — so it
gets a gradient-flow guard instead: every trainable leaf class must
receive nonzero gradient through remat+scan.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from tools.overfit_train import run_overfit


def _run(workload, steps, lr):
    return run_overfit(workload, small=True, steps=steps, lr=lr,
                       eval_every=steps, log=lambda m: None)


def test_cama_overfits():
    r = _run("cama", steps=30, lr=1e-4)
    assert r["final_eval_loss"] <= 0.90 * r["first_eval_loss"], r


def test_action_clip_overfits():
    r = _run("action_clip", steps=30, lr=1e-4)
    assert r["final_eval_loss"] <= 0.50 * r["first_eval_loss"], r


def test_dc_adapter_learns():
    r = _run("dc_adapter", steps=40, lr=1e-3)
    assert r["final_eval_loss"] <= 0.97 * r["first_eval_loss"], r


def test_svd_adapter_learns():
    # observed: 2.7% descent in 80 steps (the 16 attn2.processor adapters
    # reach the loss only through the frozen random backbone stand-in)
    r = _run("svd_adapter", steps=80, lr=3e-3)
    assert r["final_eval_loss"] <= 0.985 * r["first_eval_loss"], r


def test_cog_adapter_gradients_flow():
    """Every trainable leaf (action_proj_model + the attn1.processor
    adapters inside the remat+scan DiT) receives gradient."""
    from motionrag_tpu.training.optim import build_optimizer
    from tools.train_workloads import build_workload

    module, make_batch, _, _ = build_workload(
        "cog_adapter", small=True, overfit=True)
    batch = make_batch(0)
    params = module.init_params(jax.random.key(0), batch)
    _, mask = build_optimizer(params, list(module.trainable_patterns))
    grads = jax.grad(lambda p: module.loss(p, batch, jax.random.key(1))[0])(
        params)
    n_trainable = n_nonzero = 0
    for (path, g), m in zip(
            jax.tree_util.tree_flatten_with_path(grads)[0],
            jax.tree.leaves(mask)):
        if not m:
            continue
        n_trainable += 1
        if float(jnp.linalg.norm(g.astype(jnp.float32))) > 0:
            n_nonzero += 1
    assert n_trainable > 0
    # kernels all get gradient; a couple of scale/bias leaves can be
    # legitimately zero at a zero-init point, hence the >= 90% bar
    assert n_nonzero >= 0.9 * n_trainable, (n_nonzero, n_trainable)
