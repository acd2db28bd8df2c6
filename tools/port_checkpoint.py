#!/usr/bin/env python
"""Turnkey released-checkpoint conversion: torch state_dicts -> Orbax.

One CLI over every converter in ``utils/porting_diffusion.py`` /
``utils/porting.py`` so a user coming from the reference can transform the
exact files its docs point at (reference ``docs/model.md``; HF / released
lvdm checkpoints) into artifacts this framework restores directly
(``training/checkpoints.restore_checkpoint`` / the module ``ckpt_path``
config fields).

Families:
  dynamicrafter       full lvdm model.ckpt -> {unet, vae, text_encoder,
                      image_encoder, image_proj[, action_proj]} module tree
  lvdm-unet           the model.diffusion_model subtree only
  sd-vae              CompVis AutoencoderKL (first_stage_model)
  svd-unet            diffusers UNetSpatioTemporalConditionModel
  svd-vae             diffusers AutoencoderKLTemporalDecoder
  cogvideox-dit       diffusers CogVideoXTransformer3DModel (depth 42)
  cogvideox-vae       diffusers AutoencoderKLCogVideoX
  motion-transformer  MotionRAG CAMA checkpoint (sos_token, vision_proj,
                      condition_proj, transformer) -> models/cama tree
  resampler           a bare Resampler state_dict (motion_proj /
                      Motion-Adapter extraction files)

Sources: .ckpt/.pt/.pth/.bin via torch.load (weights_only first), or
.safetensors. A Lightning-style {'state_dict': ...} wrapper and an optional
``--strip-prefix`` (e.g. 'model.' or 'module.') are handled before routing.

Usage:
  python tools/port_checkpoint.py --family dynamicrafter \
      --src ~/ckpts/dynamicrafter_1024/model.ckpt --out ckpts/dc1024
  python tools/port_checkpoint.py --family cogvideox-dit \
      --src cogvideox-5b-i2v/transformer/*.safetensors --out ckpts/cog_dit
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _load_state_dict(paths: list[str]):
    sd: dict = {}
    for path in paths:
        p = Path(path)
        if p.suffix == ".safetensors":
            from safetensors import safe_open

            with safe_open(str(p), framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        else:
            import torch

            try:
                obj = torch.load(str(p), map_location="cpu", weights_only=True)
            except Exception:  # noqa: BLE001 - older pickled checkpoints
                obj = torch.load(str(p), map_location="cpu", weights_only=False)
            if isinstance(obj, dict) and "state_dict" in obj:
                obj = obj["state_dict"]
            for k, v in obj.items():
                sd[k] = v.numpy() if hasattr(v, "numpy") else v
    return sd


def _infer_depth(sd: dict, pat: str) -> int:
    rex = re.compile(pat)
    mx = -1
    for k in sd:
        m = rex.match(k)
        if m:
            mx = max(mx, int(m.group(1)))
    return mx + 1


def _strip(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _port_motion_transformer(sd: dict) -> dict:
    """MotionRAG motion_transformer.ckpt (IncrementalCheckpoint output over
    the reference ActionTransformer) -> our models/cama param tree."""
    from motionrag_tpu.utils.porting import (
        port_resampler,
        port_torch_transformer_encoder,
    )

    import numpy as np

    p: dict = {}
    if "sos_token" in sd:
        p["sos_token"] = np.asarray(sd["sos_token"])
    for name in ("vision_proj", "condition_proj"):
        sub = _strip(sd, f"{name}.")
        if sub:
            p[name] = port_resampler(
                sub, depth=_infer_depth(sub, r"layers\.(\d+)\.")
            )["params"]
    tr = _strip(sd, "transformer.")
    if tr:
        p["transformer"] = port_torch_transformer_encoder(
            tr, depth=_infer_depth(tr, r"layers\.(\d+)\.")
        )["params"]
    return {"params": p}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=[
        "dynamicrafter", "lvdm-unet", "sd-vae", "svd-unet", "svd-vae",
        "cogvideox-dit", "cogvideox-vae", "motion-transformer", "resampler",
    ])
    ap.add_argument("--src", required=True, nargs="+",
                    help="checkpoint file(s); multiple safetensors shards merge")
    ap.add_argument("--out", required=True, help="destination Orbax dir")
    ap.add_argument("--strip-prefix", default="",
                    help="strip this prefix from every key before routing")
    ap.add_argument("--depth", type=int, default=None,
                    help="override block depth (default: family-specific or "
                    "inferred from the key layout)")
    ap.add_argument("--channel-mult", type=int, nargs="+", default=None,
                    help="dynamicrafter/lvdm-unet: UNet channel_mult "
                    "(default 1 2 4 4 = DC-1024)")
    ap.add_argument("--num-res-blocks", type=int, default=None,
                    help="dynamicrafter/lvdm-unet: res blocks per level "
                    "(default 2)")
    ap.add_argument("--attention-levels", type=int, nargs="+", default=None,
                    help="dynamicrafter/lvdm-unet: levels with attention "
                    "(default 0 1 2)")
    ap.add_argument("--no-strict", action="store_true",
                    help="skip the unconsumed-key report")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # conversion is host-side

    from motionrag_tpu.training.checkpoints import save_checkpoint
    from motionrag_tpu.utils import porting, porting_diffusion as pd

    sd = _load_state_dict(args.src)
    if args.strip_prefix:
        sd = _strip(sd, args.strip_prefix)
    strict = not args.no_strict

    unet_kwargs = {}
    if args.channel_mult is not None:
        unet_kwargs["channel_mult"] = tuple(args.channel_mult)
    if args.num_res_blocks is not None:
        unet_kwargs["num_res_blocks"] = args.num_res_blocks
    if args.attention_levels is not None:
        unet_kwargs["attention_levels"] = tuple(args.attention_levels)

    fam = args.family
    if fam == "dynamicrafter":
        tree = pd.port_dynamicrafter_checkpoint(
            sd, strict=strict, unet_kwargs=unet_kwargs or None)
    elif fam == "lvdm-unet":
        if any(k.startswith("model.diffusion_model.") for k in sd):
            sd = _strip(sd, "model.diffusion_model.")
        tree = pd.port_lvdm_unet3d(sd, strict=strict, **unet_kwargs)
    elif fam == "sd-vae":
        if any(k.startswith("first_stage_model.") for k in sd):
            sd = _strip(sd, "first_stage_model.")
        tree = pd.port_autoencoder_kl(sd, strict=strict)
    elif fam == "svd-unet":
        tree = pd.port_svd_unet(sd, strict=strict)
    elif fam == "svd-vae":
        tree = pd.port_svd_vae(sd, strict=strict)
    elif fam == "cogvideox-dit":
        tree = pd.port_cogvideox_transformer(
            sd, depth=args.depth or 42, strict=strict
        )
    elif fam == "cogvideox-vae":
        tree = pd.port_cogvideox_vae(sd, strict=strict)
    elif fam == "motion-transformer":
        tree = _port_motion_transformer(sd)
    elif fam == "resampler":
        tree = porting.port_resampler(
            sd, depth=args.depth or _infer_depth(sd, r"layers\.(\d+)\.")
        )
    else:  # pragma: no cover
        raise SystemExit(f"unknown family {fam}")

    n = sum(
        int(__import__("numpy").prod(__import__("numpy").shape(leaf)))
        for leaf in jax.tree.leaves(tree)
    )
    save_checkpoint(args.out, tree)
    print(f"ported {fam}: {n:,} params -> {args.out}")


if __name__ == "__main__":
    main()
