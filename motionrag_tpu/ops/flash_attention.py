"""Pallas TPU flash attention (forward + backward, custom VJP).

The single hottest op of the framework: every denoiser (SVD UNet spatial
attention at 9216 tokens/frame, DynamiCrafter UNet3D, CogVideoX joint
text+video DiT attention at up to ~17.8k tokens) runs through this kernel
inside the jitted sampler loop. Design follows the canonical TPU flash
attention tiling (online softmax over KV tiles; fp32 statistics; bf16
matmul inputs with fp32 MXU accumulation):

  forward  grid (bh, n_q, n_kv)  — KV innermost ("arbitrary"), Q/batch
           parallel; m/l/acc live in VMEM scratch across KV tiles.
  dq       grid (bh, n_q, n_kv)  — recompute P from saved logsumexp.
  dkv      grid (bh, n_kv, n_q)  — Q innermost; accumulate dK/dV in scratch.

Replaces the reference's ``torch.nn.functional.scaled_dot_product_attention``
call sites (e.g. reference ``lvdm/modules/attention.py:206-220``,
``condition/attn_processor.py:103``, ``encoders/resampler.py:102``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
LOG2E = 1.4426950408889634  # log2(e)
LN2 = 0.6931471805599453  # ln(2)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
#
# VPU-side optimizations (the kernel is VPU-bound at d=64, where the MXU cap
# is ~50% of peak because both matmuls pad their 64-wide dim to 128 lanes):
#   * exp2 domain: the softmax scale is folded into q together with log2(e),
#     so the online softmax runs on native exp2 (one fewer multiply pass per
#     [block_q, block_k] element). exp2(s*log2e - m2) == exp(s - m) exactly.
#   * free row-sum: when d < 128, V is augmented with a ones-column at index
#     d (the PV matmul pads its output to 128 lanes anyway), so l = sum(p)
#     falls out of the matmul's otherwise-wasted lanes and the explicit VPU
#     reduction disappears.
#   * edge-only masking: boundary masking runs only on the last KV tile
#     (and causal-diagonal tiles), not on every tile — the CogVideoX joint
#     text+video lengths (6976/17776) are not lane-aligned, so this removes
#     ~3 full-tile VPU passes per inner tile from the hot path.


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, acc_scr, *l_scr_opt,
    scale, block_q, block_k, q_len, kv_len, n_kv, causal, with_lse=True,
    block_k_inner=None, d=None, aug=False,
):
    kv_idx = pl.program_id(2)
    q_idx = pl.program_id(1)
    l_scr = l_scr_opt[0] if l_scr_opt else None

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
        if not aug:
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)

    inner = block_k_inner or block_k
    n_inner = block_k // inner
    aligned = kv_len % block_k == 0

    def _tile_body(masked):
        # fold softmax scale (and the exp->exp2 base change) into q once per
        # q-tile ([block_q, d] — tiny) instead of full [block_q, block_k]
        # VPU passes per kv step
        q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
        for sub in range(n_inner):
            k = k_ref[0, pl.ds(sub * inner, inner), :]  # [inner, d]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )

            if masked:
                base = kv_idx * block_k + sub * inner
                col = jax.lax.broadcasted_iota(jnp.int32, (block_q, inner), 1) + base
                mask = col < kv_len
                if causal:
                    row = (
                        jax.lax.broadcasted_iota(jnp.int32, (block_q, inner), 0)
                        + q_idx * block_q
                    )
                    mask = jnp.logical_and(mask, col <= row)
                s = jnp.where(mask, s, NEG_INF)

            m_prev = m_scr[...]  # [block_q, LANES] (replicated)
            m_curr = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
            m_next = jnp.maximum(m_prev, m_curr)  # broadcast -> [block_q, LANES]
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            m_scr[...] = m_next
            if not aug:
                l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)

            v = v_ref[0, pl.ds(sub * inner, inner), :]  # [inner, d or 128]
            pv = jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    if causal:
        # three-way split: skip above the diagonal / unmasked full tiles
        # strictly below it / masked diagonal (and kv-edge) tiles
        run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k
        full = (kv_idx + 1) * block_k - 1 <= q_idx * block_q
        if not aligned:
            full = jnp.logical_and(full, kv_idx < n_kv - 1)
        pl.when(jnp.logical_and(run, full))(lambda: _tile_body(False))
        pl.when(jnp.logical_and(run, jnp.logical_not(full)))(lambda: _tile_body(True))
    elif aligned:
        _tile_body(False)
    else:
        pl.when(kv_idx < n_kv - 1)(lambda: _tile_body(False))
        pl.when(kv_idx == n_kv - 1)(lambda: _tile_body(True))

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        acc = acc_scr[...]
        l = acc[:, d:d + 1] if aug else l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc[:, :d] * l_inv).astype(o_ref.dtype)
        if with_lse:
            # natural-log logsumexp for the backward recompute / ring merge
            # (m_scr is in the log2 domain)
            lse = m_scr[...] * LN2 + jnp.log(jnp.where(l == 0.0, 1.0, l))
            lse_ref[0] = lse.astype(lse_ref.dtype)


def _fwd(q, k, v, scale, causal, block_q, block_k, interpret, with_lse=True):
    bh, q_len, d = q.shape
    kv_len = k.shape[1]
    q_pad = _ceil_to(q_len, block_q)
    kv_pad = _ceil_to(kv_len, block_k)
    qp = jnp.pad(q, ((0, 0), (0, q_pad - q_len), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, kv_pad - kv_len), (0, 0)))

    # V augmentation: when d is not a lane multiple the PV matmul pads its
    # output to 128 lanes anyway, so a ones-column at index d rides along for
    # free and carries the online-softmax row sum (no VPU l reduction).
    # Padded KV rows get p == 0 (masked / out of range), so their zero ones-
    # column entries never contaminate l.
    aug = d % LANES != 0
    d_aug = _ceil_to(d + 1, LANES) if aug else d
    if aug:
        ones = jnp.ones((bh, kv_len, 1), v.dtype)
        v = jnp.concatenate(
            [v, ones, jnp.zeros((bh, kv_len, d_aug - d - 1), v.dtype)], axis=-1)
    vp = jnp.pad(v, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
    n_q, n_kv = q_pad // block_q, kv_pad // block_k

    import os

    inner = int(os.environ.get("MRT_FLASH_BK_INNER", 0)) or None
    if inner and block_k % inner:
        inner = None
    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        block_q=block_q,
        block_k=block_k,
        q_len=q_len,
        kv_len=kv_len,
        n_kv=n_kv,
        causal=causal,
        with_lse=with_lse,
        block_k_inner=inner,
        d=d,
        aug=aug,
    )
    # lse is only materialized when the backward pass needs it (saves
    # bh*q*128*4 bytes of HBM on the inference path)
    lse_rows = q_pad if with_lse else block_q
    lse_map = (lambda b, i, j: (b, i, 0)) if with_lse else (lambda b, i, j: (b, 0, 0))
    scratch = [
        pltpu.VMEM((block_q, LANES), jnp.float32),   # m (log2 domain)
        pltpu.VMEM((block_q, d_aug), jnp.float32),   # acc (+l column when aug)
    ]
    if not aug:
        scratch.append(pltpu.VMEM((block_q, LANES), jnp.float32))  # l
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d_aug), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lse_map),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lse_rows, LANES), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    if not with_lse:
        return out[:, :q_len], None
    return out[:, :q_len], lse[:, :q_len, 0]


# ---------------------------------------------------------------------------
# transposed forward (inference fast path for d < 128)
# ---------------------------------------------------------------------------
#
# At d=64 the canonical layout pays the head-dim padding tax in BOTH matmuls:
# QK^T contracts over d (64 of 128 systolic rows live -> half rate) and PV
# pads its output lanes 64->128 (half the products are thrown away), capping
# the kernel at ~98 TFLOP/s on v5e (50% of bf16 peak). Computing the
# transposed problem instead:
#
#     S^T = K @ Q^T          [block_k, block_q]   (contraction d: half rate,
#                                                  unavoidable)
#     O^T = V^T @ P^T        [d, block_q]         (contraction block_k: FULL
#                                                  rate; d is the streamed row
#                                                  dim where 64 costs nothing)
#
# lifts the MXU ceiling to ~131 TFLOP/s (QK half-rate + PV full-rate) and
# shrinks every online-softmax carry from [block_q, 128] to [8, block_q]
# (the stats are per-LANE now): the m/alpha/l bookkeeping drops from ~3
# full-tile VPU passes to ~3 passes over an 8-row strip. V is pre-transposed
# once in HBM outside the kernel (one cheap XLA pass over V), and O^T is
# transposed back by XLA where it fuses into the caller's reshape.


def _fwd_kernel_t(
    q_ref, k_ref, vt_ref, *rest,
    scale, block_q, block_k, kv_len, n_kv, d, d_rows, aug, block_k_inner=None,
    qk_int8=False,
):
    # positional tail depends on the int8 mode: inputs grow by the two
    # quant-scale operands (sq per q token, sk per kv block)
    if qk_int8:
        sq_ref, sk_ref, ot_ref, m_scr, acc_scr, *l_scr_opt = rest
    else:
        ot_ref, m_scr, acc_scr, *l_scr_opt = rest
    kv_idx = pl.program_id(2)
    l_scr = l_scr_opt[0] if l_scr_opt else None

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
        if not aug:
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)

    inner = block_k_inner or block_k
    n_inner = block_k // inner

    def _tile_body(masked):
        # q arrives pre-transposed [d, block_q] and pre-scaled (scale and the
        # exp->exp2 base change folded in HBM — same bf16 rounding as an
        # in-kernel f32 fold, zero per-kv-step VPU cost), so S^T is a plain
        # A@B with a loop-invariant stationary operand: no per-step VMEM
        # transpose of the q tile.
        qt = q_ref[0]  # [d, block_q]
        if qk_int8:
            # SageAttention-style dequant multiplier: per-q-token scale
            # (softmax scale + log2e already folded in) x this kv block's
            # scalar scale — one fused VPU pass over the score tile
            deq = sq_ref[0] * sk_ref[0, 0, 0, 0]  # [1, block_q]
        for sub in range(n_inner):
            k = k_ref[0, pl.ds(sub * inner, inner), :]  # [inner, d]
            if qk_int8:
                st32 = jax.lax.dot(
                    k, qt, preferred_element_type=jnp.int32
                )  # [inner, block_q] s32 — int8 MXU, full rate at d=64
                st = st32.astype(jnp.float32) * deq
            else:
                st = jax.lax.dot(
                    k, qt, preferred_element_type=jnp.float32
                )  # [inner, block_q]
            if masked:
                row = jax.lax.broadcasted_iota(jnp.int32, (inner, block_q), 0)
                st = jnp.where(
                    row + kv_idx * block_k + sub * inner < kv_len, st, NEG_INF)

            m_prev = m_scr[...]  # [8, block_q] (replicated rows)
            m_curr = jnp.max(st, axis=0, keepdims=True)  # [1, block_q]
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)  # [8, block_q]
            pt = jnp.exp2(st - m_next[:1])  # [inner, block_q]
            m_scr[...] = m_next
            if not aug:
                l_scr[...] = alpha * l_scr[...] + jnp.sum(pt, axis=0, keepdims=True)

            vt = vt_ref[0, :, pl.ds(sub * inner, inner)]  # [d_rows, inner]
            pv = jax.lax.dot(
                vt, pt.astype(vt.dtype), preferred_element_type=jnp.float32
            )  # [d_rows, block_q] — contraction over keys: full MXU rate
            acc_scr[...] = acc_scr[...] * alpha[:1] + pv

    if kv_len % block_k == 0:
        _tile_body(False)
    else:
        pl.when(kv_idx < n_kv - 1)(lambda: _tile_body(False))
        pl.when(kv_idx == n_kv - 1)(lambda: _tile_body(True))

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        acc = acc_scr[...]
        l = acc[d:d + 1] if aug else l_scr[...][:1]  # [1, block_q]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        ot_ref[0] = (acc[:d] * l_inv).astype(ot_ref.dtype)


# Measured-best transposed-path tiles per self-attention protocol shape
# (tools/sweep_flash_t.py on v5e, per-length-min in-launch-scan harness,
# .bench_logs/sweep_flash_t_r4.out). The old static default (1536, 1024)
# divides 9216 exactly but pads 6976 by 13.1% and 2304 by 77.8%:
#   s=6976  (CogVideoX 17f joint): (1024, 896)  88.8 TFLOP/s (was 77.4)
#   s=17776 (CogVideoX 49f joint): (1280, 1280) 94.9         (was 83.4)
#   s=9216  (DC/SVD L0 spatial):   (1536, 768)  94.4         (was 92.4)
#   s=2304  (DC/SVD L1 spatial):   (1152, 768)  95.2         (was 43.1)
_T_TILE_TABLE = {
    # round-5 micro-sweep (bk<768 was outside the round-4 grid): (1792,640)
    # beats (1024,896) 6.5-6.8 ms vs 7.3-7.7 ms across interleaved reps
    # (.bench_logs/sweep_6976_r5.out) — 2.75% q-padding, 0.9% kv-padding
    6976: (1792, 640),
    17776: (1280, 1280),
    9216: (1536, 768),
    2304: (1152, 768),
}


def _t_tiles(q_len: int, kv_len: int) -> tuple[int, int]:
    """Transposed-path tile chooser: measured table for the protocol
    shapes, padding-minimizing heuristic otherwise.

    Heuristic: both tiles must be multiples of 128 (bq is the lane dim of
    every VPU op; bk the lane dim of the V^T tile — Mosaic's tile rule,
    which interpret mode does not enforce). Among bq in [896, 1792] and
    bk in [768, 1280] with the f32 score tile under ~8 MB of scoped VMEM,
    minimize the padded score-matrix area; tie-break toward larger bq
    (fewer grid steps) then smaller bk (measured: at zero padding,
    (1536, 768) beats (1536, 1024+) at s=9216 and (1152, 768) wins at
    s=2304 — exactly what this tie-break picks)."""
    if q_len == kv_len and q_len in _T_TILE_TABLE:
        return _T_TILE_TABLE[q_len]
    best = (1536, 1024)
    best_key = None
    for bq in range(896, 1793, 128):
        for bk in range(768, 1281, 128):
            if bq * bk * 4 > 8 * 2 ** 20:
                continue
            key = (_ceil_to(q_len, bq) * _ceil_to(kv_len, bk), -bq, bk)
            if best_key is None or key < best_key:
                best_key, best = key, (bq, bk)
    return best


def _fwd_t(q, k, v, scale, block_q, block_k, interpret, qk_int8=False):
    """Transposed-layout forward: non-causal, no lse (inference path).

    qk_int8=True quantizes Q (per token) and K (per kv block, after
    subtracting the per-batch K mean — softmax-invariant smoothing) to int8
    so the d=64 QK matmul runs on the int8 MXU path instead of padding
    64->128 bf16 lanes. PV stays bf16. This is the SageAttention recipe
    (per-block INT8 QK + smooth-K), opt-in for serving.
    """
    import os

    bh, q_len, d = q.shape
    kv_len = k.shape[1]
    q_pad = _ceil_to(q_len, block_q)
    kv_pad = _ceil_to(kv_len, block_k)
    n_kv_blocks = kv_pad // block_k
    if qk_int8:
        q32 = q.astype(jnp.float32)
        k32 = k.astype(jnp.float32)
        # smooth K: S[i,j] -= q_j . mean(K) is constant per q token, so the
        # row softmax is unchanged while the quant range shrinks
        kc = k32 - jnp.mean(k32, axis=1, keepdims=True)
        sq = jnp.maximum(jnp.max(jnp.abs(q32), axis=-1, keepdims=True),
                         1e-20) / 127.0  # [bh, q, 1]
        q_i8 = jnp.clip(jnp.round(q32 / sq), -127, 127).astype(jnp.int8)
        qt = jnp.pad(q_i8, ((0, 0), (0, q_pad - q_len), (0, 0))).transpose(0, 2, 1)
        # per-q-token dequant scale with softmax scale + log2e folded in
        sqt = jnp.pad((sq[..., 0] * (scale * LOG2E)),
                      ((0, 0), (0, q_pad - q_len)))[:, None, :]  # [bh, 1, q_pad]
        kb = jnp.pad(kc, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
        kb = kb.reshape(bh, n_kv_blocks, block_k, d)
        skb = jnp.maximum(jnp.max(jnp.abs(kb), axis=(2, 3)), 1e-20) / 127.0
        kp = jnp.clip(jnp.round(kb / skb[:, :, None, None]), -127, 127
                      ).astype(jnp.int8).reshape(bh, kv_pad, d)
    else:
        # pre-scale (softmax scale + log2e fold) and pre-transpose Q in HBM:
        # one cheap XLA pass, and the kernel's QK becomes a plain A@B with no
        # per-kv-step transpose/scale work
        qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
        qt = jnp.pad(qs, ((0, 0), (0, q_pad - q_len), (0, 0))).transpose(0, 2, 1)
        kp = jnp.pad(k, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
    # ones-ROW variant (default on): the row-sum l rides the PV matmul (row
    # d of V^T is ones) instead of a VPU reduction pass — trades ~25% more
    # PV rows (streamed, cheap) for one fewer [block_k, block_q] VPU pass
    # per tile. Measured s=9216 bxh=80: 90.0 vs 83.0 TFLOP/s.
    aug = bool(int(os.environ.get("MRT_FLASH_T_ONES", "1")))
    d_rows = _ceil_to(d + 1, 16) if aug else d  # bf16 sublane granularity
    if aug:
        ones = jnp.ones((bh, kv_len, 1), v.dtype)
        v = jnp.concatenate(
            [v, ones, jnp.zeros((bh, kv_len, d_rows - d - 1), v.dtype)], axis=-1)
    # one HBM pass; XLA's transpose is cheap next to the attention math
    vt = jnp.pad(v, ((0, 0), (0, kv_pad - kv_len), (0, 0))).transpose(0, 2, 1)
    n_q, n_kv = q_pad // block_q, kv_pad // block_k

    inner = int(os.environ.get("MRT_FLASH_BK_INNER", 0)) or None
    if inner and block_k % inner:
        inner = None
    kernel = functools.partial(
        _fwd_kernel_t, scale=scale, block_q=block_q, block_k=block_k,
        kv_len=kv_len, n_kv=n_kv, d=d, d_rows=d_rows, aug=aug,
        block_k_inner=inner, qk_int8=qk_int8,
    )
    scratch = [
        pltpu.VMEM((8, block_q), jnp.float32),       # m (log2 domain)
        pltpu.VMEM((d_rows, block_q), jnp.float32),  # acc (O^T, +l row if aug)
    ]
    if not aug:
        scratch.append(pltpu.VMEM((8, block_q), jnp.float32))  # l
    in_specs = [
        pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, d_rows, block_k), lambda b, i, j: (b, 0, j)),
    ]
    operands = [qt, kp, vt]
    if qk_int8:
        in_specs.append(pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)))
        # the per-kv-block scale rides in SMEM as [bh, n_kv, 1, 1] so the
        # (1,1,1,1) block's last two dims EQUAL the array's — a 2D (1,1)
        # block violates the (8,128) tile rule on real TPUs (interpret mode
        # does not enforce it; burned on the first hardware run)
        in_specs.append(pl.BlockSpec((1, 1, 1, 1), lambda b, i, j: (b, j, 0, 0),
                                     memory_space=pltpu.SMEM))
        operands += [sqt, skb[:, :, None, None]]
    ot = pl.pallas_call(
        kernel,
        grid=(bh, n_q, n_kv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, d, block_q), lambda b, i, j: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((bh, d, q_pad), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return ot.transpose(0, 2, 1)[:, :q_len]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_scr,
    *, scale, block_q, block_k, kv_len, n_kv, causal,
):
    kv_idx = pl.program_id(2)
    q_idx = pl.program_id(1)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros(dq_scr.shape, jnp.float32)

    run = True
    if causal:
        run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k

    @pl.when(run)
    def _body():
        q = q_ref[0]
        k = k_ref[0]
        # log2 domain: p = exp2(s*scale*log2e - lse*log2e) == exp(s*scale - lse)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kv_idx * block_k
        mask = col < kv_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + q_idx * block_q
            mask = jnp.logical_and(mask, col <= row)
        s = jnp.where(mask, s, NEG_INF)
        lse = lse_ref[0][:, :1] * LOG2E  # [block_q, 1], natural -> log2
        p = jnp.exp2(s - lse)

        do = do_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        di = di_ref[0][:, :1]
        ds = p * (dp - di) * scale
        dq_scr[...] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, scale, block_q, block_k, q_len, kv_len, n_q, causal,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(1)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)

    run = True
    if causal:
        run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k

    @pl.when(run)
    def _body():
        q = q_ref[0]
        k = k_ref[0]
        # s^T : [block_k, block_q], log2 domain (see _dq_kernel)
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)
        row = jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 0) + kv_idx * block_k
        col = jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 1) + q_idx * block_q
        mask = jnp.logical_and(row < kv_len, col < q_len)
        if causal:
            mask = jnp.logical_and(mask, row <= col)
        st = jnp.where(mask, st, NEG_INF)
        lse = lse_ref[0][:, :1] * LOG2E  # [block_q, 1], natural -> log2
        pt = jnp.exp2(st - lse.T)  # [block_k, block_q]

        do = do_ref[0].astype(jnp.float32)  # [block_q, d]
        dv_scr[...] += jax.lax.dot(
            pt.astype(do_ref.dtype), do_ref[0], preferred_element_type=jnp.float32
        )

        v = v_ref[0].astype(jnp.float32)
        # dp^T = v @ do^T : [block_k, block_q]
        dpt = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        di = di_ref[0][:, :1]
        dst = pt * (dpt - di.T) * scale  # [block_k, block_q]
        dk_scr[...] += jax.lax.dot(
            dst.astype(q.dtype), q, preferred_element_type=jnp.float32
        )

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_impl(q, k, v, out, lse, do, scale, causal, block_q, block_k, interpret):
    # the dq/dkv kernels carry more live VMEM than the forward (recomputed P
    # plus dK/dV scratch); the forward's larger tiles exceed the 16MB
    # scoped-VMEM stack here, so clamp to the bwd-safe tile sizes
    import os

    block_q = int(os.environ.get("MRT_FLASH_BWD_BQ", 0)) or min(block_q, 512)
    block_k = int(os.environ.get("MRT_FLASH_BWD_BK", 0)) or min(block_k, 1536)
    bh, q_len, d = q.shape
    kv_len = k.shape[1]
    q_pad = _ceil_to(q_len, block_q)
    kv_pad = _ceil_to(kv_len, block_k)
    n_q, n_kv = q_pad // block_q, kv_pad // block_k

    di = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # [bh, q]

    pad_q = lambda x: jnp.pad(x, ((0, 0), (0, q_pad - q_len), (0, 0)))
    pad_kv = lambda x: jnp.pad(x, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
    qp, dop = pad_q(q), pad_q(do)
    kp, vp = pad_kv(k), pad_kv(v)
    # lse/di broadcast across LANES for aligned VMEM access
    lse_p = jnp.pad(lse, ((0, 0), (0, q_pad - q_len)), constant_values=1.0)
    di_p = jnp.pad(di, ((0, 0), (0, q_pad - q_len)))
    lse_b = jnp.broadcast_to(lse_p[..., None], (bh, q_pad, LANES))
    di_b = jnp.broadcast_to(di_p[..., None], (bh, q_pad, LANES))

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, block_q=block_q, block_k=block_k,
            kv_len=kv_len, n_kv=n_kv, causal=causal,
        ),
        grid=(bh, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_b, di_b)[:, :q_len]

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, block_q=block_q, block_k=block_k,
            q_len=q_len, kv_len=kv_len, n_q=n_q, causal=causal,
        ),
        grid=(bh, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, LANES), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, kv_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, kv_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lse_b, di_b)
    return dq, dk[:, :kv_len], dv[:, :kv_len]


# ---------------------------------------------------------------------------
# SPMD partitioning
#
# pallas_call lowers to a Mosaic custom call, which XLA's SPMD partitioner
# cannot split on its own — under a pjit with sharded operands it would
# either fail or all-gather the full tensors onto every device, destroying
# dp/tp scaling. All three entry kernels are embarrassingly parallel over
# the flattened leading batch*heads dim ([bh, s, d] layout), which is
# exactly the dim that dp (batch) and tp (heads) shard — so we register a
# custom_partitioning rule that keeps dim 0 sharded and replicates the
# rest, and XLA runs the kernel independently on each shard with zero
# communication. (The same approach maxtext/t5x take via shard_map, done
# here at the kernel boundary so every call site inherits it.)
# ---------------------------------------------------------------------------


def _wrap_dim0(fn, n_results, rule, parallel=("b",)):
    """custom_partitioning wrapper driven by an einsum-style Shardy rule.

    ``parallel`` names the factors the kernel is embarrassingly parallel
    over (per-shard invocations need no communication); every other factor
    is forced replicated, so a user annotation along it re-shards OUTSIDE
    the kernel instead of splitting it incorrectly. "b" (flattened
    batch*heads) is always parallel; the non-causal flash forward also
    declares the q-sequence factor — under an sp-sharded pipeline XLA then
    all-gathers only K/V and each device computes its own q rows (textbook
    all-gather-KV sequence parallelism, no kernel changes)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    cp = custom_partitioning(fn)

    lhs, rhs = rule.split("->")
    op_factors = [t.split() for t in lhs.split(",")]
    res_factors = [t.split() for t in rhs.split(",")]

    def _axis_map(arg_infos):
        """factor -> mesh axis, from however the operands arrived sharded
        (only parallel factors ever map)."""
        m = {}
        for info, factors in zip(arg_infos, op_factors):
            sharding = info.sharding
            if sharding is None or getattr(sharding, "spec", None) is None:
                continue
            spec = tuple(sharding.spec) + (None,) * (len(factors) - len(sharding.spec))
            for f, ax in zip(factors, spec):
                if f in parallel and ax is not None and f not in m:
                    m[f] = ax
        return m

    def _sharding(mesh, factors, amap):
        return NamedSharding(mesh, PartitionSpec(*[amap.get(f) for f in factors]))

    def infer(mesh, arg_infos, result_infos):
        amap = _axis_map(arg_infos)
        shardings = tuple(_sharding(mesh, f, amap) for f in res_factors)
        return shardings if n_results > 1 else shardings[0]

    def partition(mesh, arg_infos, result_infos):
        amap = _axis_map(arg_infos)
        arg_shardings = tuple(_sharding(mesh, f, amap) for f in op_factors)
        res_shardings = tuple(_sharding(mesh, f, amap) for f in res_factors)
        return (mesh, fn,
                res_shardings if n_results > 1 else res_shardings[0],
                arg_shardings)

    # replicated factors, ordered by first appearance (Shardy requires
    # special-factor indices sorted)
    factors, seen = [], set()
    for f in rule.replace(",", " ").replace("->", " ").split():
        if f not in parallel and f not in seen:
            seen.add(f)
            factors.append(f)
    cp.def_partition(partition=partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule,
                     need_replication_factors=tuple(factors))
    return cp


@functools.lru_cache(maxsize=None)
def _spmd_fwd(scale, causal, block_q, block_k, interpret, with_lse,
              _explicit=False):
    # the forward grid is also embarrassingly parallel over q rows — but
    # only when non-causal (the causal mask depends on absolute q position,
    # which a seq shard would compute relative to itself)
    parallel = ("b",) if causal else ("b", "s")
    if with_lse:
        def fn(q, k, v):
            return tuple(_fwd(q, k, v, scale, causal, block_q, block_k, interpret))
        return _wrap_dim0(fn, n_results=2,
                          rule="b s d, b t d, b t d -> b s d, b s",
                          parallel=parallel)

    import os

    def fn(q, k, v):
        # env knobs are read at trace time (not builder time) so in-process
        # toggles aren't masked by this function's lru_cache
        no_t = bool(int(os.environ.get("MRT_FLASH_NO_T", "0")))
        qk_int8 = bool(int(os.environ.get("MRT_FLASH_QK_INT8", "0")))
        # transposed layout wins whenever the head dim under-fills the MXU
        # lanes (d % 128 != 0) — non-causal inference only (no lse output)
        if not causal and q.shape[-1] % LANES != 0 and not no_t:
            bq = int(os.environ.get("MRT_FLASH_T_BQ", 0)) or (
                block_q if _explicit else 0)
            bk = int(os.environ.get("MRT_FLASH_T_BK", 0)) or (
                block_k if _explicit else 0)
            if not bq or not bk:
                abq, abk = _t_tiles(q.shape[1], k.shape[1])
                bq, bk = bq or abq, bk or abk
            bq = min(bq, _ceil_to(q.shape[1], LANES))
            bk = min(bk, _ceil_to(k.shape[1], LANES))
            return _fwd_t(q, k, v, scale, bq, bk, interpret, qk_int8=qk_int8)
        return _fwd(q, k, v, scale, causal, block_q, block_k, interpret,
                    with_lse=False)[0]
    return _wrap_dim0(fn, n_results=1, rule="b s d, b t d, b t d -> b s d",
                      parallel=parallel)


@functools.lru_cache(maxsize=None)
def _spmd_bwd(scale, causal, block_q, block_k, interpret):
    def fn(q, k, v, out, lse, do):
        return tuple(_bwd_impl(q, k, v, out, lse, do, scale, causal,
                               block_q, block_k, interpret))
    return _wrap_dim0(
        fn, n_results=3,
        rule="b s d, b t d, b t d, b s d, b s, b s d -> b s d, b t d, b t d")


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash(q, k, v, scale, causal, block_q, block_k, interpret, explicit):
    return _spmd_fwd(scale, causal, block_q, block_k, interpret, False,
                     explicit)(q, k, v)


def _flash_fwd(q, k, v, scale, causal, block_q, block_k, interpret, explicit):
    out, lse = _spmd_fwd(scale, causal, block_q, block_k, interpret, True)(q, k, v)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, causal, block_q, block_k, interpret, explicit, res, do):
    q, k, v, out, lse = res
    return _spmd_bwd(scale, causal, block_q, block_k, interpret)(q, k, v, out, lse, do)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    causal: bool = False,
    # v5e-tuned defaults (d=64 video-UNet shapes, re-measured after the
    # scale-fold + static-mask-skip optimizations):
    #   s=9216: (1024, 1536) -> 74.8 TFLOP/s (was (512,1536) at 64)
    #   s=2304: whole-row kv (512, 2304) -> 53.7 TFLOP/s (was 38.7)
    # Larger tiles (2048x1536, 1024x4608) exceed the 16MB scoped-VMEM stack.
    # Overridable via MRT_FLASH_BQ / MRT_FLASH_BK for tuning runs.
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over [batch, heads, seq, head_dim] inputs.

    Supports MHA (k/v heads == q heads) and GQA by head broadcasting.
    Sequence lengths need not be multiples of the block sizes (padding is
    masked inside the kernel).
    """
    import os

    b, h, sq, d = q.shape
    # explicit block sizes (caller args or MRT_FLASH_BQ/BK) also pin the
    # transposed inference path; otherwise it picks its own tuned defaults
    explicit = (block_q is not None or block_k is not None
                or bool(int(os.environ.get("MRT_FLASH_BQ", 0)))
                or bool(int(os.environ.get("MRT_FLASH_BK", 0))))
    if block_k is None:
        block_k = int(os.environ.get("MRT_FLASH_BK", 0))
        if not block_k:
            kv_padded = _ceil_to(k.shape[2], LANES)
            # one whole-row kv block when it fits the scoped-VMEM budget
            # (no inter-block m/l carries, no edge masking)
            block_k = kv_padded if kv_padded <= 2304 else 1536
    if block_q is None:
        # (1024, 1536) and (512, 2304) both fit the 16MB scoped-VMEM stack
        # at d<=128; (1024, 2304) sits at ~18MB and fails. Large head dims
        # (e.g. the VAE mid-attention, d=512) grow the q/acc tiles 8x — halve
        # block_q to stay under the limit.
        block_q = int(os.environ.get("MRT_FLASH_BQ", 0))
        if not block_q:
            block_q = 512 if (block_k > 1536 or q.shape[3] > 128) else 1024
    hk = k.shape[1]
    if hk != h:
        assert h % hk == 0, f"GQA heads mismatch: {h} vs {hk}"
        k = jnp.repeat(k, h // hk, axis=1)
        v = jnp.repeat(v, h // hk, axis=1)
    if scale is None:
        scale = d ** -0.5
    skv = k.shape[2]
    block_q = min(block_q, _ceil_to(sq, LANES))
    block_k = min(block_k, _ceil_to(skv, LANES))
    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    out = _flash(qf, kf, vf, float(scale), bool(causal), int(block_q),
                 int(block_k), bool(interpret), explicit)
    return out.reshape(b, h, sq, d)
