#!/usr/bin/env python
"""Extract the motion-projector (Resampler) subtree from a trained
checkpoint into a standalone file (reference ``tools/extract_action_proj.py``
+ ``condition/utils.py:39-84`` extract_resampler_weights)."""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_ckpt", required=True)
    ap.add_argument("--output_ckpt", required=True)
    ap.add_argument("--prefix", default="action_proj_model",
                    help="top-level key or dotted path of the resampler subtree")
    args = ap.parse_args()

    from motionrag_tpu.training.checkpoints import restore_checkpoint, save_checkpoint

    tree = restore_checkpoint(args.input_ckpt)
    node = tree
    for part in args.prefix.split("."):
        if part not in node:
            raise KeyError(f"{part!r} not found; available: {list(node)}")
        node = node[part]
    save_checkpoint(args.output_ckpt, node)
    print(f"extracted {args.prefix} -> {args.output_ckpt}")


if __name__ == "__main__":
    main()
