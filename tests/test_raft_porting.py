"""RAFT-large porter round-trip + Farneback-fallback marker.

Real torchvision raft_large weights cannot download in this environment, so
the porter is hardened the other way: generate a synthetic state dict in
the EXACT torchvision raft_large key layout (inverse of the porter's
documented mapping, BN stats chosen so folding is the identity), run the
strict porter, and require the round-tripped tree to equal the flax init
it came from. Any drift in either the porter or the flax module's
parameter structure fails loudly — so the day the real file lands,
``load_metric_weights('raft_large', port_raft)`` is a no-op.
Reference metric: ``/root/reference/src/metrics/motion.py:34-69``.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from motionrag_tpu.metrics.raft import RAFT  # noqa: E402
from motionrag_tpu.utils.porting_metrics import port_raft  # noqa: E402


def _inv_conv(k):
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _synthetic_torchvision_sd(params: dict) -> dict:
    """Inverse of port_raft: flax tree -> torchvision raft_large keys."""
    sd: dict = {}

    def conv(pre, leaf):
        sd[f"{pre}.weight"] = _inv_conv(leaf["kernel"])
        sd[f"{pre}.bias"] = np.asarray(leaf["bias"])

    def norm(pre, scale, bias, folded):
        sd[f"{pre}.weight"] = np.asarray(scale)
        sd[f"{pre}.bias"] = np.asarray(bias)
        if folded:  # BN running stats chosen so the fold is the identity
            sd[f"{pre}.running_mean"] = np.zeros_like(scale)
            sd[f"{pre}.running_var"] = np.ones_like(scale) - 1e-5
            sd[f"{pre}.num_batches_tracked"] = np.asarray(0)

    def encoder(pre, p, folded):
        conv(f"{pre}.convnormrelu.0", p["conv1"])
        norm(f"{pre}.convnormrelu.1", p["norm1_scale"], p["norm1_bias"], folded)
        conv(f"{pre}.conv", p["conv2"])
        for li in (1, 2, 3):
            for ui in (0, 1):
                rb = p[f"layer{li}_{ui}"]
                base = f"{pre}.layer{li}.{ui}"
                conv(f"{base}.convnormrelu1.0", rb["conv1"])
                norm(f"{base}.convnormrelu1.1", rb["norm1_scale"], rb["norm1_bias"], folded)
                conv(f"{base}.convnormrelu2.0", rb["conv2"])
                norm(f"{base}.convnormrelu2.1", rb["norm2_scale"], rb["norm2_bias"], folded)
                if "downsample" in rb:
                    conv(f"{base}.downsample.0", rb["downsample"])
                    norm(f"{base}.downsample.1", rb["down_scale"], rb["down_bias"], folded)

    encoder("feature_encoder", params["fnet"], folded=False)
    encoder("context_encoder", params["cnet"], folded=True)

    ub = params["update_block"]
    for ours, theirs in (("convc1", "convcorr1"), ("convc2", "convcorr2"),
                         ("convf1", "convflow1"), ("convf2", "convflow2"),
                         ("conv", "conv")):
        conv(f"update_block.motion_encoder.{theirs}.0", ub[ours])
    for suffix, theirs in (("h", "convgru1"), ("v", "convgru2")):
        for g in ("z", "r", "q"):
            conv(f"update_block.recurrent_block.{theirs}.conv{g}",
                 ub["gru"][f"conv{g}_{suffix}"])
    conv("update_block.flow_head.conv1", ub["flow_head1"])
    conv("update_block.flow_head.conv2", ub["flow_head2"])
    conv("mask_predictor.convrelu.0", ub["mask1"])
    conv("mask_predictor.conv", ub["mask2"])
    return sd


@pytest.mark.slow
def test_raft_porter_roundtrip_shape_exact():
    model = RAFT(iters=2)
    a = jnp.zeros((1, 3, 64, 64), jnp.float32)
    variables = model.init(jax.random.key(0), a, a)
    params = jax.tree.map(np.asarray, variables["params"])

    sd = _synthetic_torchvision_sd(params)
    ported = port_raft(sd, strict=True)  # strict: every key consumed

    flat_src = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_out = dict(jax.tree_util.tree_flatten_with_path(ported["params"])[0])
    assert set(flat_out) == {k for k, _ in flat_src}
    for path, v in flat_src:
        np.testing.assert_allclose(
            flat_out[path], v, rtol=2e-6, atol=0,
            err_msg=jax.tree_util.keystr(path))

    # ported tree drives the real model
    out = model.apply({"params": ported["params"]}, a, a)
    assert out.shape == (1, 2, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_motion_metric_marks_farneback_fallback(capsys):
    """Scores produced with the classical-flow fallback must be impossible
    to mistake for the reference RAFT metric: the metric announces the
    fallback loudly and exposes which flow it used."""
    from motionrag_tpu.metrics.motion import MotionDistance, farneback_flow

    m = MotionDistance()
    assert m.flow_kind in ("raft", "farneback")
    if m.flow_kind == "farneback":
        err = capsys.readouterr().err
        assert "Farneback" in err and "NOT comparable" in err
        assert m.flow_fn is farneback_flow
