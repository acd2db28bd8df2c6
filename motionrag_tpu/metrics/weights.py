"""Turnkey weight resolution for the metric backbones.

Real scorer weights (the files the reference downloads from HF at metric
time, ``src/metrics/models.py``) are looked up in
``$MRT_METRIC_WEIGHTS_DIR`` (default ``checkpoints/metrics/``):

  i3d.pt            piergiaj/torchscript InceptionI3d state_dict  -> FVD, I3D ActionScore
  inception_v3.pt   torchvision inception_v3 state_dict           -> FID
  raft_large.pt     torchvision raft_large state_dict             -> Motion-KL

Each may also be a pre-ported ``.npz`` (flat 'a/b/c' keys). When no file is
present the caller falls back to random init — metric MATH still runs and
tests exercise it, but scores are not meaningful (they become real the
moment the checkpoint file is dropped in; the converter golden tests in
tests/test_porting_metrics.py pin the conversion).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Optional

__all__ = ["metric_weights_dir", "load_metric_weights"]


def metric_weights_dir() -> Path:
    return Path(os.environ.get("MRT_METRIC_WEIGHTS_DIR", "checkpoints/metrics"))


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        *parts, leaf = key.split("/")
        for part in parts:
            node = node.setdefault(part, {})
        node[leaf] = value
    return tree


def load_metric_weights(name: str, porter: Callable[[dict], dict]) -> Optional[dict]:
    """Resolve ported variables for scorer ``name`` or None if absent."""
    base = metric_weights_dir()
    npz = base / f"{name}.npz"
    if npz.exists():
        import numpy as np

        with np.load(npz) as data:
            return _unflatten({k: data[k] for k in data.files})
    pt = base / f"{name}.pt"
    if pt.exists():
        import torch

        sd = torch.load(pt, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return porter({k: v.numpy() for k, v in sd.items()})
    return None
