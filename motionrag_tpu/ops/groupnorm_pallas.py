"""Pallas fused GroupNorm(+SiLU) kernel.

The UNet ResBlocks run GroupNorm -> SiLU -> Conv on every block
(diffusion_blocks.py); this kernel fuses the normalize/affine/activation
chain into one VMEM pass per (batch row, spatial chunk) with a two-phase
grid: phase 0 accumulates per-(batch, group) sum/sumsq partials, phase 1
normalizes with the finalized statistics. Statistics are fp32 regardless of
input dtype.

Layout: x [batch, spatial, channels] (flatten h*w upstream); channels last
(lane dim), spatial on sublanes. groups must divide channels and the group
width should be lane-friendly (c/groups >= 8 ideally).

Used by ops.norms.group_norm when ``use_pallas=True`` on TPU; the XLA path
remains the reference implementation (tests compare the two).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_norm_fused"]


def _stats_kernel(x_ref, sums_ref, *, groups: int):
    # x_ref: [1, block_s, c]; sums_ref: [1, 1, 2*groups] accumulated over s-blocks
    s_idx = pl.program_id(1)

    @pl.when(s_idx == 0)
    def _init():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    x = x_ref[0].astype(jnp.float32)  # [block_s, c]
    bs, c = x.shape
    xg = x.reshape(bs, groups, c // groups)
    s1 = jnp.sum(xg, axis=(0, 2))  # [groups]
    s2 = jnp.sum(xg * xg, axis=(0, 2))
    sums_ref[0, 0, :groups] += s1
    sums_ref[0, 0, groups:] += s2


def _norm_kernel(x_ref, sums_ref, scale_ref, bias_ref, o_ref,
                 *, groups: int, n_per_group: float, eps: float, act: str):
    x = x_ref[0].astype(jnp.float32)  # [block_s, c]
    bs, c = x.shape
    gw = c // groups
    s1 = sums_ref[0, 0, :groups]
    s2 = sums_ref[0, 0, groups:]
    mean = s1 / n_per_group  # [groups]
    var = s2 / n_per_group - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, gw)  # [c]
    inv_c = jnp.repeat(inv, gw)
    y = (x - mean_c[None, :]) * inv_c[None, :]
    y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "act", "block_s", "interpret")
)
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
    """x: [b, s, c] -> normalized [b, s, c] (stats over s x group channels)."""
    b, s, c = x.shape
    assert c % groups == 0
    pad = (-s) % block_s
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    n_s = xp.shape[1] // block_s

    # NOTE on padding: zero rows would bias the statistics, so accumulate
    # with the true row count and subtract nothing — zeros contribute 0 to
    # both sums, and n_per_group uses the true s.
    sums = pl.pallas_call(
        functools.partial(_stats_kernel, groups=groups),
        grid=(b, n_s),
        in_specs=[pl.BlockSpec((1, block_s, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 1, 2 * groups), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, 2 * groups), jnp.float32),
        interpret=interpret,
    )(xp)

    n_per_group = float(s * (c // groups))
    scale2 = jnp.broadcast_to(scale.astype(jnp.float32)[None, :], (1, c))
    bias2 = jnp.broadcast_to(bias.astype(jnp.float32)[None, :], (1, c))
    out = pl.pallas_call(
        functools.partial(
            _norm_kernel, groups=groups, n_per_group=n_per_group, eps=eps,
            act=act or "none",
        ),
        grid=(b, n_s),
        in_specs=[
            pl.BlockSpec((1, block_s, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, 2 * groups), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_s, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=interpret,
    )(xp, sums, scale2, bias2)
    return out[:, :s] if pad else out
