"""Metric-backbone checkpoint converters (torch state_dicts -> Flax trees).

Covers the scorer networks the reference downloads at metric time
(reference ``src/metrics/models.py:10-69``, ``motion.py:9-72``):

  - I3D Kinetics-400 (the torchscript ``flateon/FVD-I3D-torchscript`` is the
    standard piergiaj InceptionI3d; its state_dict uses the
    ``Mixed_3b.Branch_0.Conv3d_0a_1x1.conv3d.weight`` naming)  -> metrics/i3d.py
  - torchvision InceptionV3 (FID pool3 features)               -> metrics/inception.py
  - torchvision raft_large (Motion-KL optical flow)            -> metrics/raft.py

Conventions follow utils/porting.py: Linear transpose; Conv
[out, in, *k] -> [*k, in, out]; BatchNorm running stats land in the
``batch_stats`` collection.
"""

from __future__ import annotations

import numpy as np

__all__ = ["port_i3d", "port_inception_v3", "port_raft"]


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


def _unit3d(c, pre, use_bn=True, bias=False):
    """piergiaj Unit3D: .conv3d (+optional bias) and .bn running stats."""
    params = {"conv3d": {"kernel": _conv(c(f"{pre}.conv3d.weight"))}}
    if bias or c.has(f"{pre}.conv3d.bias"):
        params["conv3d"]["bias"] = c(f"{pre}.conv3d.bias")
    stats = {}
    if use_bn:
        params["bn"] = {
            "scale": c(f"{pre}.bn.weight"),
            "bias": c(f"{pre}.bn.bias"),
        }
        stats["bn"] = {
            "mean": c(f"{pre}.bn.running_mean"),
            "var": c(f"{pre}.bn.running_var"),
        }
    return params, stats


_I3D_MIXED = {
    "b0": "Branch_0.Conv3d_0a_1x1",
    "b1a": "Branch_1.Conv3d_0a_1x1",
    "b1b": "Branch_1.Conv3d_0b_3x3",
    "b2a": "Branch_2.Conv3d_0a_1x1",
    "b2b": "Branch_2.Conv3d_0b_3x3",
    "b3b": "Branch_3.Conv3d_0b_1x1",
}

_I3D_STEM = {
    "conv1a": "Conv3d_1a_7x7",
    "conv2b": "Conv3d_2b_1x1",
    "conv2c": "Conv3d_2c_3x3",
}


def port_i3d(sd: dict, strict: bool = True) -> dict:
    """piergiaj InceptionI3d state_dict -> our I3D variables
    ({'params', 'batch_stats'})."""
    c = _Consumer(sd)
    params: dict = {}
    stats: dict = {}
    for ours, theirs in _I3D_STEM.items():
        params[ours], stats[ours] = _unit3d(c, theirs)
    for blk in ("3b", "3c", "4b", "4c", "4d", "4e", "4f", "5b", "5c"):
        p_blk, s_blk = {}, {}
        for ours, theirs in _I3D_MIXED.items():
            p_blk[ours], s_blk[ours] = _unit3d(c, f"Mixed_{blk}.{theirs}")
        params[f"mixed_{blk}"] = p_blk
        stats[f"mixed_{blk}"] = s_blk
    params["logits"], _ = _unit3d(c, "logits", use_bn=False, bias=True)
    if strict:
        left = [k for k in c.unconsumed() if "num_batches_tracked" not in k]
        assert not left, f"unconsumed I3D keys: {left[:8]}"
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# torchvision InceptionV3 (FID features)
# ---------------------------------------------------------------------------


def _basic_conv(c, pre):
    params = {
        "conv": {"kernel": _conv(c(f"{pre}.conv.weight"))},
        "bn": {"scale": c(f"{pre}.bn.weight"), "bias": c(f"{pre}.bn.bias")},
    }
    stats = {
        "bn": {"mean": c(f"{pre}.bn.running_mean"), "var": c(f"{pre}.bn.running_var")}
    }
    return params, stats


def port_inception_v3(sd: dict, strict: bool = True) -> dict:
    """torchvision inception_v3 state_dict -> our InceptionV3 variables.

    Our module names equal torchvision's (Conv2d_1a_3x3, Mixed_5b.branch1x1,
    ...), so the mapping is positional: every ``*.conv.weight`` /
    ``*.bn.{weight,bias,running_mean,running_var}`` lands at the same nested
    path. fc / AuxLogits heads are unused for FID pool3 features."""
    c = _Consumer(sd)
    params: dict = {}
    stats: dict = {}

    def ensure(tree, parts):
        node = tree
        for part in parts:
            node = node.setdefault(part, {})
        return node

    for key in list(c.sd):
        if key.startswith(("fc.", "AuxLogits.")) or "num_batches_tracked" in key:
            c.used.add(key)
            continue
        *mods, leaf = key.split(".")
        if mods[-1] == "conv" and leaf == "weight":
            ensure(params, mods)["kernel"] = _conv(c(key))
        elif mods[-1] == "bn":
            if leaf == "weight":
                ensure(params, mods)["scale"] = c(key)
            elif leaf == "bias":
                ensure(params, mods)["bias"] = c(key)
            elif leaf == "running_mean":
                ensure(stats, mods)["mean"] = c(key)
            elif leaf == "running_var":
                ensure(stats, mods)["var"] = c(key)
    if strict:
        left = c.unconsumed()
        assert not left, f"unconsumed InceptionV3 keys: {left[:8]}"
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# torchvision raft_large (Motion-KL flow)
# ---------------------------------------------------------------------------


def _fold_bn(c, pre, eps=1e-5):
    """BatchNorm (inference) -> affine scale'/bias' with running stats folded."""
    w = c(f"{pre}.weight")
    b = c(f"{pre}.bias")
    mean = c(f"{pre}.running_mean")
    var = c(f"{pre}.running_var")
    scale = w / np.sqrt(var + eps)
    return scale.astype(np.float32), (b - mean * scale).astype(np.float32)


def _raft_norm(c, pre, folded: bool):
    if folded:
        return _fold_bn(c, pre)
    return c(f"{pre}.weight"), c(f"{pre}.bias")


def _raft_resblock(c, pre, folded: bool):
    """torchvision ResidualBlock -> our ResUnit leaf names."""
    p = {
        "conv1": {"kernel": _conv(c(f"{pre}.convnormrelu1.0.weight")),
                  "bias": c(f"{pre}.convnormrelu1.0.bias")},
        "conv2": {"kernel": _conv(c(f"{pre}.convnormrelu2.0.weight")),
                  "bias": c(f"{pre}.convnormrelu2.0.bias")},
    }
    p["norm1_scale"], p["norm1_bias"] = _raft_norm(c, f"{pre}.convnormrelu1.1", folded)
    p["norm2_scale"], p["norm2_bias"] = _raft_norm(c, f"{pre}.convnormrelu2.1", folded)
    if c.has(f"{pre}.downsample.0.weight"):
        p["downsample"] = {"kernel": _conv(c(f"{pre}.downsample.0.weight")),
                           "bias": c(f"{pre}.downsample.0.bias")}
        p["down_scale"], p["down_bias"] = _raft_norm(c, f"{pre}.downsample.1", folded)
    return p


def port_raft(sd: dict, strict: bool = True) -> dict:
    """torchvision raft_large state_dict -> our RAFT params tree
    (metrics/raft.py: fnet/cnet FeatureEncoders + update_block). The BN
    context encoder's running stats are folded into affine scale/bias
    (RAFT.cnet runs with norm='affine')."""
    c = _Consumer(sd)

    def encoder(pre, folded):
        p: dict = {
            "conv1": {"kernel": _conv(c(f"{pre}.convnormrelu.0.weight")),
                      "bias": c(f"{pre}.convnormrelu.0.bias")},
            "conv2": {"kernel": _conv(c(f"{pre}.conv.weight")),
                      "bias": c(f"{pre}.conv.bias")},
        }
        p["norm1_scale"], p["norm1_bias"] = _raft_norm(c, f"{pre}.convnormrelu.1", folded)
        for li, layer in enumerate(("layer1", "layer2", "layer3")):
            for ui in range(2):
                p[f"layer{li + 1}_{ui}"] = _raft_resblock(c, f"{pre}.{layer}.{ui}", folded)
        return p

    params: dict = {
        "fnet": encoder("feature_encoder", folded=False),
        "cnet": encoder("context_encoder", folded=True),
    }

    ub: dict = {}
    me = "update_block.motion_encoder"
    for ours, theirs in (("convc1", "convcorr1"), ("convc2", "convcorr2"),
                         ("convf1", "convflow1"), ("convf2", "convflow2"),
                         ("conv", "conv")):
        ub[ours] = {"kernel": _conv(c(f"{me}.{theirs}.0.weight")),
                    "bias": c(f"{me}.{theirs}.0.bias")}
    gru: dict = {}
    # module leaf names are conv{z,r,q}_{h,v} (metrics/raft.py SepConvGRU);
    # an earlier draft emitted _horizontal/_vertical, which the round-trip
    # test (tests/test_raft_porting.py) caught as a load failure
    for suffix, theirs in (("h", "convgru1"), ("v", "convgru2")):
        for g in ("z", "r", "q"):
            gru[f"conv{g}_{suffix}"] = {
                "kernel": _conv(c(f"update_block.recurrent_block.{theirs}.conv{g}.weight")),
                "bias": c(f"update_block.recurrent_block.{theirs}.conv{g}.bias"),
            }
    ub["gru"] = gru
    ub["flow_head1"] = {"kernel": _conv(c("update_block.flow_head.conv1.weight")),
                        "bias": c("update_block.flow_head.conv1.bias")}
    ub["flow_head2"] = {"kernel": _conv(c("update_block.flow_head.conv2.weight")),
                        "bias": c("update_block.flow_head.conv2.bias")}
    ub["mask1"] = {"kernel": _conv(c("mask_predictor.convrelu.0.weight")),
                   "bias": c("mask_predictor.convrelu.0.bias")}
    ub["mask2"] = {"kernel": _conv(c("mask_predictor.conv.weight")),
                   "bias": c("mask_predictor.conv.bias")}
    params["update_block"] = ub
    if strict:
        left = [k for k in c.unconsumed() if "num_batches_tracked" not in k]
        assert not left, f"unconsumed RAFT keys: {left[:8]}"
    return {"params": params}
