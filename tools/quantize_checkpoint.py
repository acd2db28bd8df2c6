#!/usr/bin/env python
"""Offline checkpoint quantizer for int8 W8A8 serving.

Converts an Orbax checkpoint's frozen-backbone Dense kernels to
``{kernel: int8, kernel_scale: fp32}`` (``ops/quant.py``) and writes a new
Orbax checkpoint, so serving deployments load the halved-size artifact
directly instead of re-transforming bf16 weights at startup (the bf16
CogVideoX DiT is 11.1 GB; the int8 artifact 5.6 GB). Pipelines run it
unchanged — any Dense whose params carry a ``kernel_scale`` leaf takes the
int8 path under ``quantize: int8``.

The reference has no counterpart (it serves torch bf16,
``cogvideox/module.py:25``); extraction-tool precedent is
``tools/extract_action_proj.py``.

Usage:
  python tools/quantize_checkpoint.py --ckpt CKPT_DIR --out OUT_DIR \
      --family cogvideox [--subtree transformer] [--platform cpu]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

_FAMILIES = {
    # family -> (default subtree under the checkpoint root, patterns fn)
    "cogvideox": ("transformer", "motionrag_tpu.models.cogvideox.module:cogvideox_quant_patterns"),
    "dynamicrafter": ("unet", "motionrag_tpu.models.dynamicrafter.module:dynamicrafter_quant_patterns"),
    "svd": ("unet", "motionrag_tpu.models.svd.module:svd_quant_patterns"),
}


def _resolve(spec: str):
    mod_name, fn_name = spec.split(":")
    import importlib

    return getattr(importlib.import_module(mod_name), fn_name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="source Orbax checkpoint dir")
    ap.add_argument("--out", required=True, help="destination checkpoint dir")
    ap.add_argument("--family", required=True, choices=list(_FAMILIES))
    ap.add_argument("--subtree", default=None,
                    help="checkpoint key holding the frozen backbone "
                    "(default per family); '' = quantize the whole tree")
    ap.add_argument("--platform", default="cpu",
                    help="force the JAX platform (offline conversion should "
                    "not land on a tunneled TPU)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from motionrag_tpu.ops.quant import dense_quant_bytes, quantize_dense_tree
    from motionrag_tpu.training.checkpoints import restore_checkpoint, save_checkpoint

    default_subtree, patterns_spec = _FAMILIES[args.family]
    subtree = default_subtree if args.subtree is None else args.subtree
    include, exclude = _resolve(patterns_spec)()

    tree = restore_checkpoint(args.ckpt)
    if isinstance(tree, dict) and "opt_state" in tree and "params" in tree:
        # full-train-state checkpoint (trainer.save_checkpoint): the serving
        # artifact carries only the model params
        tree = tree["params"]
    target = tree[subtree] if subtree else tree
    q = quantize_dense_tree(target, include=include, exclude=exclude)
    out_tree = {**tree, subtree: q} if subtree else q

    qb, tb = dense_quant_bytes(out_tree)
    _, tb0 = dense_quant_bytes(tree)
    print(f"quantized {qb/2**20:.1f} MiB int8; artifact {tb/2**20:.1f} MiB "
          f"(was {tb0/2**20:.1f} MiB)", file=sys.stderr)
    if qb == 0:
        print("WARNING: no kernels matched the quantization patterns",
              file=sys.stderr)

    save_checkpoint(args.out, out_tree)
    print(args.out)


if __name__ == "__main__":
    main()
