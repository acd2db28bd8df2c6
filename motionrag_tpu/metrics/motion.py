"""Motion distance: optical-flow magnitude histogram KL(gt || pred)
(reference ``src/metrics/motion.py:9-72``: RAFT flow -> log2-magnitude
256-bin histogram in [-7, 5] -> +0.1 smoothing -> normalized -> KL,
averaged over frame pairs).

Flow backends:
  - ``raft_flow_fn`` — our Flax RAFT-large (metrics/raft.py), matching the
    reference's torchvision raft_large; pass ported weights for scored runs.
  - ``farneback_flow`` (default) — cv2 dense classical flow; the
    histogram/KL math is identical, absolute values shift but ordering is
    preserved. Used when no RAFT weights are available.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from motionrag_tpu.metrics.base import Metric

__all__ = ["MotionDistance"]


def farneback_flow(video_u8: np.ndarray) -> np.ndarray:
    """[t, c, h, w] uint8 -> flow [t-1, 2, h, w] (cv2 Farneback)."""
    import cv2

    frames = video_u8.transpose(0, 2, 3, 1)
    gray = [cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in frames]
    flows = []
    for a, b in zip(gray[:-1], gray[1:]):
        flow = cv2.calcOpticalFlowFarneback(
            a, b, None, pyr_scale=0.5, levels=4, winsize=15,
            iterations=3, poly_n=5, poly_sigma=1.2, flags=0,
        )
        flows.append(flow.transpose(2, 0, 1))
    return np.stack(flows, axis=0)


class MotionDistance(Metric):
    higher_is_better = False

    def __init__(self, hist_bins: int = 256, flow_fn: Optional[Callable] = None):
        super().__init__()
        self.hist_bins = hist_bins
        self.flow_kind = "custom"
        if flow_fn is None:
            # turnkey: use RAFT when ported weights are present, else
            # Farneback (identical histogram/KL math)
            from motionrag_tpu.metrics.weights import load_metric_weights
            from motionrag_tpu.utils.porting_metrics import port_raft

            raft_vars = load_metric_weights("raft_large", port_raft)
            if raft_vars:
                flow_fn = raft_flow_fn(raft_vars["params"])
                self.flow_kind = "raft"
            else:
                flow_fn = farneback_flow
                self.flow_kind = "farneback"
                import sys

                print(
                    "MotionDistance: RAFT weights absent — scoring with the "
                    "classical Farneback flow. These values are NOT "
                    "comparable to the reference Motion-KL metric "
                    "(torchvision raft_large, reference src/metrics/"
                    "motion.py:34-69); port weights via "
                    "tools/port_checkpoint.py and metrics/weights.py to "
                    "score comparably.", file=sys.stderr, flush=True,
                )
        self.flow_fn = flow_fn
        self.add_state("motion_kl", 0.0)
        self.add_state("num_samples", 0)

    def calc_motion_hist(self, video_u8: np.ndarray) -> np.ndarray:
        flow = np.asarray(self.flow_fn(video_u8), np.float32)
        mag = np.linalg.norm(flow, axis=1)  # [t-1, h, w]
        log_mag = np.log2(np.maximum(mag, 1e-12))
        hists = np.stack(
            [
                np.histogram(m, bins=self.hist_bins, range=(-7.0, 5.0))[0].astype(np.float64)
                for m in log_mag
            ]
        )
        hists += 0.1
        return hists / hists.sum(axis=1, keepdims=True)

    def update(self, preds: np.ndarray, target: np.ndarray):
        assert preds.shape == target.shape and preds.ndim == 5
        for pred, tgt in zip(preds, target):
            ph = self.calc_motion_hist(pred)
            th = self.calc_motion_hist(tgt)
            kl = (th * (np.log(th) - np.log(ph))).sum(axis=1)
            self.motion_kl += float(kl.mean())
            self.num_samples += 1

    def compute(self) -> float:
        return self.motion_kl / self.num_samples


def raft_flow_fn(params=None, iters: int = 12, resize: int = 256):
    """Build a RAFT-based flow_fn for MotionDistance (reference preprocessing
    ``motion.py:26-47``: resize shortest side to 256, [-1,1] normalize, pad
    to /8)."""
    import jax
    import jax.numpy as jnp

    from motionrag_tpu.metrics.raft import RAFT

    model = RAFT(iters=iters)
    state = {"params": params}
    apply = jax.jit(lambda p, a, b: model.apply(p, a, b))

    def flow_fn(video_u8: np.ndarray) -> np.ndarray:
        video = video_u8.astype(np.float32) / 127.5 - 1.0  # [t, c, h, w]
        t, c, h, w = video.shape
        scale = resize / min(h, w)
        nh = max(int(round(h * scale)) // 8 * 8, 8)
        nw = max(int(round(w * scale)) // 8 * 8, 8)
        vid = jax.image.resize(jnp.asarray(video), (t, c, nh, nw), method="bilinear")
        if state["params"] is None:
            state["params"] = model.init(jax.random.key(0), vid[:1], vid[:1])
        flow = apply(state["params"], vid[:-1], vid[1:])
        return np.asarray(flow)

    return flow_fn
