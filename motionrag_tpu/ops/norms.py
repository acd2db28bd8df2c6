"""Normalization primitives with fp32 statistics islands.

GroupNorm / LayerNorm / RMSNorm as pure functions over explicit scale/shift
parameters. Statistics are always computed in float32 regardless of input
dtype (bf16 activations) — the TPU-native analogue of the reference's fp32
normalization behavior inside its torch modules.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

__all__ = ["group_norm", "layer_norm", "rms_norm", "ada_layer_norm", "pallas_norms"]

# trace-time switch: inside `with pallas_norms():` group_norm lowers to the
# fused Pallas kernel (inference paths; the kernel has no VJP, so training
# keeps the XLA formulation)
_USE_PALLAS_GROUPNORM = False


@contextlib.contextmanager
def pallas_norms(enable: bool = True):
    global _USE_PALLAS_GROUPNORM
    prev = _USE_PALLAS_GROUPNORM
    _USE_PALLAS_GROUPNORM = enable
    try:
        yield
    finally:
        _USE_PALLAS_GROUPNORM = prev


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    *,
    eps: float = 1e-5,
    channel_axis: int = -1,
    act: str | None = None,
) -> jnp.ndarray:
    """GroupNorm over the channel axis (default: last, NHWC/NDHWC layout).

    Statistics are taken over (all non-batch spatial dims x channels within
    the group). ``act='silu'`` fuses the SiLU used before every conv in the
    UNet ResBlocks (XLA fuses this chain into the normalize epilogue).
    """
    if (
        _USE_PALLAS_GROUPNORM
        and scale is not None
        and bias is not None
        and (channel_axis == -1 or channel_axis == x.ndim - 1)
        and x.ndim >= 3
        and act in (None, "silu")
        and jax.default_backend() == "tpu"
    ):
        from motionrag_tpu.ops.groupnorm_pallas import group_norm_fused

        orig_shape = x.shape
        c = orig_shape[-1]
        # VMEM budget: ~3 live fp32 copies of the block; keep under ~4MB
        block_s = 512 if c <= 640 else (256 if c <= 1536 else 128)
        flat = x.reshape(orig_shape[0], -1, c)
        out = group_norm_fused(
            flat, scale, bias, groups=num_groups, eps=eps, act=act, block_s=block_s
        )
        return out.reshape(orig_shape)

    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if channel_axis != -1 and channel_axis != xf.ndim - 1:
        xf = jnp.moveaxis(xf, channel_axis, -1)
    c = xf.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by {num_groups} groups"
    shape = xf.shape
    # [batch, *spatial, groups, c_per_group]
    xg = xf.reshape(shape[0], -1, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) / jnp.sqrt(var + eps)
    xf = xg.reshape(shape)
    if scale is not None:
        xf = xf * scale.astype(jnp.float32)
    if bias is not None:
        xf = xf + bias.astype(jnp.float32)
    if act == "silu":
        xf = xf * jnp.reciprocal(1.0 + jnp.exp(-xf))
    elif act is not None:
        raise ValueError(f"unknown act {act!r}")
    if channel_axis != -1 and channel_axis != x.ndim - 1:
        xf = jnp.moveaxis(xf, -1, channel_axis)
    return xf.astype(orig_dtype)


def layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    *,
    eps: float = 1e-5,
) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) / jnp.sqrt(var + eps)
    if scale is not None:
        xf = xf * scale.astype(jnp.float32)
    if bias is not None:
        xf = xf + bias.astype(jnp.float32)
    return xf.astype(orig_dtype)


def rms_norm(
    x: jnp.ndarray, scale: jnp.ndarray | None = None, *, eps: float = 1e-6
) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = xf / jnp.sqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    if scale is not None:
        xf = xf * scale.astype(jnp.float32)
    return xf.astype(orig_dtype)


def ada_layer_norm(
    x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray, *, eps: float = 1e-5
) -> jnp.ndarray:
    """LayerNorm (no affine) followed by modulation: x * (1+scale) + shift.

    shift/scale: [batch, dim] broadcast over sequence (DiT adaLN).
    """
    xn = layer_norm(x, eps=eps)
    return xn * (1.0 + scale[:, None, :]).astype(xn.dtype) + shift[:, None, :].astype(xn.dtype)
