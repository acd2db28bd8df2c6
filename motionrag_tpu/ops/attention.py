"""Attention dispatch: Pallas flash attention on TPU, XLA reference path
elsewhere / for short sequences / arbitrary masks.

All model code calls :func:`dot_product_attention` with
``[batch, seq, heads, head_dim]`` ("BSHD") tensors — the layout XLA prefers
for fusing surrounding reshapes — and never materializes attention weights
itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from motionrag_tpu.ops.flash_attention import flash_attention

__all__ = ["dot_product_attention", "block_causal_mask"]

# below this q*kv size the pallas launch overhead outweighs the win
_FLASH_MIN_SEQ = 1024
# at/below this sequence length (with a big batch) the fused VPU temporal
# kernel is applicable (opt-in; see dispatch comment below)
_TEMPORAL_MAX_SEQ = 32


def _TEMPORAL_KERNEL_OPT_IN() -> bool:
    import os

    return os.environ.get("MRT_TEMPORAL_KERNEL", "") == "1"


@functools.lru_cache(maxsize=16)
def _block_diag_mask_np(pack: int, seq: int) -> np.ndarray:
    idx = np.arange(pack * seq) // seq
    return idx[:, None] == idx[None, :]


def packed_small_attention(q, k, v, scale):
    """Tiny-seq, huge-batch attention packed onto full MXU tiles.

    q, k, v: [B, S, H, D] (BSHD) with S <= 64 and no mask. XLA lowers the
    batched [S, S] score matmuls as independent tiny contractions that
    leave the 128x128 MXU output tile almost empty (S=16 touches 1/64 of
    it) — measured ~0.4 TFLOP/s effective at the DC temporal-transformer
    shape (reference temporal attention: lvdm ``attention.py:395-445``).
    Packing P = 128 // S independent sequences into one 128-token sequence
    with a static block-diagonal mask computes P x the score FLOPs but on
    full tiles, which is ~10x less wall-clock at these shapes.

    Exact, not approximate: cross-sequence scores are -inf before the
    softmax (exp -> 0 exactly), row maxima are unchanged (the diagonal
    block is always present), and the PV contraction adds exact 0.0 terms,
    which cannot change the unmasked partial sums.
    """
    b, s, h, d = q.shape
    pack = max(1, 128 // s)
    g = b * h
    g_pad = -(-g // pack) * pack
    # BSHD -> [B*H, S, D]
    def fold(x):
        x = x.transpose(0, 2, 1, 3).reshape(g, s, d)
        if g_pad != g:
            x = jnp.pad(x, ((0, g_pad - g), (0, 0), (0, 0)))
        return x.reshape(g_pad // pack, pack * s, d)

    qf, kf, vf = fold(q), fold(k), fold(v)
    scores = jnp.einsum("gnd,gmd->gnm", qf, kf,
                        preferred_element_type=jnp.float32) * scale
    mask = jnp.asarray(_block_diag_mask_np(pack, s))
    scores = jnp.where(mask, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("gnm,gmd->gnd", p.astype(v.dtype), vf)
    out = out.reshape(g_pad, s, d)[:g].reshape(b, h, s, d)
    return out.transpose(0, 2, 1, 3)


def _xla_attention(q, k, v, scale, mask, causal):
    """Reference XLA path: fp32 softmax, bf16 matmuls. BHSD layout."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if causal:
        sq, sk = s.shape[-2], s.shape[-1]
        cm = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        mask = cm if mask is None else jnp.logical_and(mask, cm)
    if mask is not None:
        s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    # rows that are fully masked produce NaN from -inf softmax; zero them
    if mask is not None:
        any_valid = jnp.any(mask, axis=-1, keepdims=True)
        p = jnp.where(any_valid, p, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    mask: jnp.ndarray | None = None,
    causal: bool = False,
    use_flash: bool | None = None,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: [b, sq, h, d];  k, v: [b, skv, hk, d] (hk == h or divides h for GQA).
    mask: optional boolean [*, sq, skv] (True = attend), broadcastable over
    batch/heads. Returns [b, sq, h, d].
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = d ** -0.5

    # tiny-sequence / huge-batch attention (video temporal blocks). The
    # fused VPU kernel (ops/temporal_attention.py) avoids the MXU tile
    # padding of the XLA lowering, but on v5e a Mosaic restriction (exp/max/
    # divide miscompile on lane-1 tensors) forces lane-replicated score
    # tensors, and the measured result is 5.2ms vs XLA's 3.6ms at
    # DynamiCrafter L0 shapes — so it stays opt-in (MRT_TEMPORAL_KERNEL=1)
    # pending a layout that beats XLA.
    if (
        _TEMPORAL_KERNEL_OPT_IN()
        and mask is None
        and not causal
        and k.shape[2] == h
        and sq <= _TEMPORAL_MAX_SEQ
        and skv <= _TEMPORAL_MAX_SEQ
        and b >= 1024
        and jax.default_backend() == "tpu"
        and use_flash is None
    ):
        from motionrag_tpu.ops.temporal_attention import small_seq_attention

        return small_seq_attention(q, k, v, scale=scale)

    # tiny-seq / huge-batch packing (video temporal blocks): pack 128//S
    # sequences into one MXU-sized sequence with a block-diagonal mask —
    # exact math, ~10x wall-clock at DC/SVD temporal shapes (see
    # packed_small_attention). TPU-only: on CPU the XLA path is fine and
    # golden/parity tests compare against its exact lowering.
    if (
        mask is None
        and not causal
        and k.shape[2] == h
        and sq == skv
        and sq <= _TEMPORAL_MAX_SEQ * 2
        and 128 // sq >= 2
        and b * h >= 256
        and use_flash is None
        and jax.default_backend() == "tpu"
    ):
        return packed_small_attention(q, k, v, scale)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    if use_flash is None:
        on_tpu = jax.default_backend() == "tpu"
        use_flash = on_tpu and mask is None and sq * skv >= _FLASH_MIN_SEQ * _FLASH_MIN_SEQ

    if use_flash:
        out = flash_attention(qt, kt, vt, scale=scale, causal=causal)
    else:
        hk = kt.shape[1]
        if hk != h:
            kt = jnp.repeat(kt, h // hk, axis=1)
            vt = jnp.repeat(vt, h // hk, axis=1)
        if mask is not None and mask.ndim == 2:
            mask = mask[None, None]
        elif mask is not None and mask.ndim == 3:
            mask = mask[:, None]
        out = _xla_attention(qt, kt, vt, scale, mask, causal)
    return out.transpose(0, 2, 1, 3)


@functools.lru_cache(maxsize=16)
def _block_causal_np(num_frames: int, frame_tokens: int) -> np.ndarray:
    n = num_frames * frame_tokens
    blocks = np.arange(n) // frame_tokens
    return (blocks[None, :] <= blocks[:, None])


def block_causal_mask(num_frames: int, frame_tokens: int) -> jnp.ndarray:
    """Block-causal mask: token in frame i attends to frames <= i.

    True = attend. Matches the semantics of the reference's
    ``ConditionTransformer.get_mask`` (reference ``condition/module.py:131-135``,
    which returns True = *blocked* for torch; we use the attend convention).
    """
    return jnp.asarray(_block_causal_np(num_frames, frame_tokens))
