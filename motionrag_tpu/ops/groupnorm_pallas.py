"""Pallas fused GroupNorm(+SiLU) kernel.

The UNet ResBlocks run GroupNorm -> SiLU -> Conv on every block
(diffusion_blocks.py); this kernel fuses the normalize/affine/activation
chain into one VMEM pass per (batch row, spatial chunk) with a two-phase
grid: phase 0 accumulates per-(batch, group) sum/sumsq partials, phase 1
normalizes with the finalized statistics. Statistics are fp32 regardless of
input dtype.

Layout notes (Mosaic): channel stays on the lane dimension throughout; the
channel->group reduction and group->channel broadcast are expressed as
matmuls against a constant group-selection matrix (a [c, groups] 0/1
matrix) — reshapes across the lane dim are not supported by the TPU vector
layout inference.

Used optionally in place of ops.norms.group_norm; the XLA path remains the
reference implementation (tests compare the two).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_norm_fused"]


def _group_matrix(c: int, groups: int):
    """[c, groups] selection matrix: M[i, g] = 1 iff channel i is in group g."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // (c // groups) == gr).astype(jnp.float32)


def _stats_kernel(x_ref, sums_ref, *, groups: int):
    # x_ref: [1, block_s, c]; sums_ref: [1, 2, groups] accumulated over s-blocks
    s_idx = pl.program_id(1)

    @pl.when(s_idx == 0)
    def _init():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    x = x_ref[0].astype(jnp.float32)  # [block_s, c]
    c = x.shape[1]
    m = _group_matrix(c, groups)  # [c, groups]
    s1_c = jnp.sum(x, axis=0, keepdims=True)  # [1, c]
    s2_c = jnp.sum(x * x, axis=0, keepdims=True)
    sums_ref[0, 0:1, :] += jax.lax.dot(s1_c, m, preferred_element_type=jnp.float32)
    sums_ref[0, 1:2, :] += jax.lax.dot(s2_c, m, preferred_element_type=jnp.float32)


def _norm_kernel(x_ref, sums_ref, scale_ref, bias_ref, o_ref,
                 *, groups: int, n_per_group: float, eps: float, act: str):
    x = x_ref[0].astype(jnp.float32)  # [block_s, c]
    c = x.shape[1]
    m_t = _group_matrix(c, groups).T  # [groups, c]
    s1 = sums_ref[0, 0:1, :]  # [1, groups]
    s2 = sums_ref[0, 1:2, :]
    mean = s1 / n_per_group
    var = s2 / n_per_group - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    # group -> channel broadcast via matmul
    mean_c = jax.lax.dot(mean, m_t, preferred_element_type=jnp.float32)  # [1, c]
    inv_c = jax.lax.dot(inv, m_t, preferred_element_type=jnp.float32)
    y = (x - mean_c) * inv_c
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "act", "block_s", "interpret")
)
def _group_norm_fused_impl(x, scale, bias, groups, eps, act, block_s, interpret):
    b, s, c = x.shape
    assert c % groups == 0
    pad = (-s) % block_s
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    n_s = xp.shape[1] // block_s

    sums = pl.pallas_call(
        functools.partial(_stats_kernel, groups=groups),
        grid=(b, n_s),
        in_specs=[pl.BlockSpec((1, block_s, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 2, groups), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, groups), jnp.float32),
        interpret=interpret,
    )(xp)

    n_per_group = float(s * (c // groups))
    scale2 = scale.astype(jnp.float32).reshape(1, c)
    bias2 = bias.astype(jnp.float32).reshape(1, c)
    out = pl.pallas_call(
        functools.partial(
            _norm_kernel, groups=groups, n_per_group=n_per_group, eps=eps,
            act=act or "none",
        ),
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec((1, block_s, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 2, groups), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_s, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=interpret,
    )(xp, sums, scale2, bias2)
    return out[:, :s] if pad else out


@functools.lru_cache(maxsize=None)
def _spmd_group_norm(groups, eps, act, block_s, interpret):
    from motionrag_tpu.ops.flash_attention import _wrap_dim0

    def fn(x, scale, bias):
        return _group_norm_fused_impl(x, scale, bias, groups, eps, act,
                                      block_s, interpret)
    return _wrap_dim0(fn, n_results=1, rule="b s c, c, c -> b s c")


def group_norm_fused(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    groups: int = 32,
    eps: float = 1e-5,
    act: str | None = None,
    block_s: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [b, s, c] -> normalized [b, s, c] (stats over s x group channels).

    Zero-padded rows contribute 0 to both sums; n_per_group uses the true s,
    so padding does not bias the statistics. Batch-partitionable under SPMD
    (same custom_partitioning scheme as the flash kernels); scale/bias
    replicate.
    """
    return _spmd_group_norm(groups, eps, act, block_s, interpret)(x, scale, bias)
