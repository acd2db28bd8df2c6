"""Fused small-sequence (temporal) attention Pallas kernel.

Video UNets run per-pixel attention across frames: [n_pixels, t, heads, d]
with t = 16-25 (reference DynamiCrafter ``lvdm/modules/attention.py:395-445``
TemporalTransformer, SVD temporal blocks). XLA lowers the t x t score matmuls
as n*heads batched [16,64]x[64,16] GEMMs, each padded to a full 128x128x128
MXU tile — 64x padding waste, measured ~0.5 TFLOP/s useful on v5e
(3.6 ms/op at DynamiCrafter L0 shapes: 9216 pixels, t=16, 5 heads, d=64).

This kernel never touches the MXU: with t tiny, the score row for one kv
position, ``sum_d q[r, tq, :] * k[r, kt, :]``, is an elementwise multiply
plus a lane reduction on the VPU, and P@V is a broadcast FMA. A flash-style
online softmax (running max / sum / rescaled accumulator) keeps the live set
constant across the unrolled kv loop. Arithmetic is ~4*n*t*t*h*d FLOPs —
tiny — so the op runs at HBM bandwidth.

Hard-won Mosaic/v5e constraints baked into the design (each violation
surfaces only as an opaque remote-compile HTTP 500; the real message is a
"scoped vmem limit" OOM):

  - VMEM tiling pads the last dim to 128 lanes and the second-to-last to
    8 (fp32) / 16 (bf16) sublanes. A [bn, t, h, d] block with h=5, d=64
    therefore occupies ~6.5x its logical bytes; folding heads into the row
    axis ([bn, t, d]) keeps waste to the 2x lane pad. The head fold is done
    by the caller-side transpose below, which XLA fuses into the producing
    matmul inside a jitted model.
  - The scoped VMEM *stack* limit is 16MB: every live fp32 temporary in the
    (unrolled) kv loop counts, including lane-1 "keepdims" tensors, which
    are allocated lane-complete. Online softmax keeps ~6 temporaries live
    regardless of t_kv.
  - Transcendental/compare/divide ops on lane-1 tensors miscompile; scores
    are broadcast to lane-complete [bn, t, d] (multiply-by-ones is
    supported) before any exp/max/div. Redundancy across d is free — the
    op is bandwidth-bound, not VPU-bound.

Softmax runs in fp32 (fp32-island convention, CLAUDE.md).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["small_seq_attention"]


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, t_kv):
    q = q_ref[...].astype(jnp.float32)  # [bn, tq, d]
    k = k_ref[...]
    v = v_ref[...]
    ones = jnp.ones_like(q)

    def score(kt):
        ksel = k[:, kt][:, None].astype(jnp.float32)  # [bn, 1, d]
        p = jnp.sum(q * ksel, axis=-1, keepdims=True) * scale  # [bn, tq, 1]
        return p * ones  # lane-complete [bn, tq, d], rows replicated over d

    # online softmax: running max m, normalizer l, rescaled accumulator acc
    m = score(0)
    l = ones
    acc = v[:, 0][:, None].astype(jnp.float32) * ones  # e(0)=1 at kt=0
    for kt in range(1, t_kv):
        p = score(kt)
        m_new = jnp.maximum(m, p)
        c = jnp.exp(m - m_new)
        e = jnp.exp(p - m_new)
        vsel = v[:, kt][:, None].astype(jnp.float32)
        acc = acc * c + e * vsel
        l = l * c + e
        m = m_new
    o_ref[...] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_n", "interpret"))
def small_seq_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    block_n: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention over tiny sequences with a huge batch axis.

    q: [n, t_q, h, d];  k, v: [n, t_kv, h, d]  (BSHD, the model layout).
    Returns [n, t_q, h, d]. t_q/t_kv should be <= ~32; no masking/causal
    support (the video temporal blocks use none).
    """
    n, t_q, h, d = q.shape
    t_kv = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    if block_n is None:
        # 128 is the largest block whose ~8 live fp32 [block_n, t, 128-lane]
        # temporaries fit the 16MB scoped-VMEM stack on v5e
        block_n = int(os.environ.get("MRT_TEMPORAL_BN", 0)) or 128

    # fold heads into the row axis: [n, t, h, d] -> [n*h, t, d]. Inside a
    # jitted model XLA fuses this transpose into the producing projection.
    def fold(x, t):
        return x.transpose(0, 2, 1, 3).reshape(n * h, t, x.shape[-1])

    qf, kf, vf = fold(q, t_q), fold(k, t_kv), fold(v, t_kv)

    out = _spmd_small_seq(float(scale), t_kv, block_n, interpret)(qf, kf, vf)
    return out.reshape(n, h, t_q, d).transpose(0, 2, 1, 3)


@functools.lru_cache(maxsize=None)
def _spmd_small_seq(scale, t_kv, block_n, interpret):
    """Batch-partitionable pallas_call (rows = n*heads on dim 0; same SPMD
    scheme as flash_attention). Row padding happens inside the per-shard
    function so each device pads its own shard to a block multiple."""
    from motionrag_tpu.ops.flash_attention import _wrap_dim0

    def fn(qf, kf, vf):
        rows, t_q, d = qf.shape
        bn = min(block_n, rows)
        pad = (-rows) % bn
        if pad:
            qf = jnp.concatenate([qf, jnp.zeros((pad,) + qf.shape[1:], qf.dtype)], 0)
            kf = jnp.concatenate([kf, jnp.zeros((pad,) + kf.shape[1:], kf.dtype)], 0)
            vf = jnp.concatenate([vf, jnp.zeros((pad,) + vf.shape[1:], vf.dtype)], 0)
        out = pl.pallas_call(
            functools.partial(_kernel, scale=scale, t_kv=t_kv),
            grid=(qf.shape[0] // bn,),
            in_specs=[
                pl.BlockSpec((bn, t_q, d), lambda i: (i, 0, 0)),
                pl.BlockSpec((bn, t_kv, d), lambda i: (i, 0, 0)),
                pl.BlockSpec((bn, t_kv, d), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((bn, t_q, d), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(qf.shape, qf.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(qf, kf, vf)
        return out[:rows]

    return _wrap_dim0(fn, n_results=1, rule="b s d, b t d, b t d -> b s d")
