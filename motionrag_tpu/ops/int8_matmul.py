"""Fused int8 W8A8 matmul Pallas kernel (MXU s8 x s8 -> s32, in-kernel
fp32 dequant epilogue).

Why: the XLA lowering of the W8A8 Dense path (``ops/quant.py``) materializes
the full int32 product before the rescale — at DiT FF shapes that is a
343 MB HBM round-trip in series with the matmul, and the measured int8 gain
collapses (overhead-cancelled GEMM bench, 6976x3072x12288: bf16 182 TFLOP/s
vs XLA-int8 194 — epilogue-bound; the isolated s8 MXU rate at the same
shape reaches 315 TFLOP/s when the epilogue is light). This kernel keeps the
s32 accumulator in VMEM scratch and writes only the final bf16 tile:
HBM traffic = int8 operands + bf16 result, the s32 tensor never leaves the
chip core.

Layout: grid (M/BM, N/BN, K/BK) with the contraction innermost
(``dimension_semantics=('parallel','parallel','arbitrary')``); the s32
accumulator lives in a VMEM scratch tile, zeroed at k==0 and flushed through
the dequant epilogue (acc * a_scale[m-tile] * k_scale[n-tile] + bias) at the
last k step — the standard Pallas reduction-grid matmul pattern.

Used by ``ops.quant._int8_dense`` on TPU when shapes divide the tile sizes;
everything else falls back to the XLA path (bit-compatible within fp32
rescale rounding — see tests/test_quant.py rtol note in CLAUDE.md).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["int8_matmul_dequant", "pallas_int8_supported"]


def _kernel(xq_ref, kq_ref, a_ref, ks_ref, b_ref, o_ref, acc_ref, *, n_k, out_dtype):
    k_step = pl.program_id(2)

    @pl.when(k_step == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        xq_ref[...], kq_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k_step == n_k - 1)
    def _flush():
        y = acc_ref[...].astype(jnp.float32)
        # a: [BM, 1] per-token scale; ks: [1, BN] per-out-channel scale;
        # multiplies on lane-1 / sublane-1 operands are VPU-supported
        y = y * a_ref[...] * ks_ref[...]
        y = y + b_ref[...]
        o_ref[...] = y.astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _build(m, k, n, bm, bn, bk, out_dtype, interpret):
    n_k = k // bk
    return pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, out_dtype=out_dtype),
        grid=(m // bm, n // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),   # xq
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),   # kernel q
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),     # a_scale
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),     # k_scale
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),     # bias
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )


def pallas_int8_supported(m: int, k: int, n: int,
                          bm: int = 256, bn: int = 512, bk: int = 512) -> bool:
    """The kernel handles shapes whose K and N divide the tile sizes (true
    for every DiT/UNet projection: 3072/12288, 1024/4096...). M is padded."""
    return k % bk == 0 and n % bn == 0 and k >= bk and n >= bn and m >= 1


def int8_matmul_dequant(
    xq: jnp.ndarray,      # [M, K] int8
    kernel_q: jnp.ndarray,  # [K, N] int8
    a_scale: jnp.ndarray,   # [M, 1] fp32 per-token
    k_scale: jnp.ndarray,   # [N] fp32 per-out-channel
    bias: jnp.ndarray | None = None,  # [N] fp32
    *,
    out_dtype=jnp.bfloat16,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(xq @ kernel_q).s32 * a_scale * k_scale + bias, fused on the MXU."""
    m, k = xq.shape
    n = kernel_q.shape[1]
    bm = block_m or int(os.environ.get("MRT_INT8_BM", 0)) or 256
    bn = block_n or int(os.environ.get("MRT_INT8_BN", 0)) or 512
    bk = block_k or int(os.environ.get("MRT_INT8_BK", 0)) or 512
    bm = min(bm, max(32, m))
    assert pallas_int8_supported(m, k, n, bm, bn, bk), (m, k, n)

    pad = (-m) % bm
    if pad:
        xq = jnp.concatenate(
            [xq, jnp.zeros((pad, k), xq.dtype)], axis=0)
        a_scale = jnp.concatenate(
            [a_scale, jnp.ones((pad, 1), a_scale.dtype)], axis=0)

    b2 = (jnp.zeros((1, n), jnp.float32) if bias is None
          else bias.astype(jnp.float32).reshape(1, n))
    out = _build(m + pad, k, n, bm, bn, bk, jnp.dtype(out_dtype), interpret)(
        xq, kernel_q, a_scale.astype(jnp.float32),
        k_scale.astype(jnp.float32).reshape(1, n), b2)
    return out[:m] if pad else out
