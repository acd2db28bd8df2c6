"""Positional embeddings: sinusoid tables, timestep embeddings, RoPE.

Numerically matches the reference semantics:
  - sinusoid table: classic interleaved sin/cos table
    (reference ``condition/position_embeddings.py:158-170``)
  - RoPE: llama-style cached cos/sin over even/odd pairs
    (reference ``position_embeddings.py:57-132``)
  - timestep embedding: DDPM/ADM half-sin half-cos
    (reference ``lvdm/models/utils_diffusion.py`` timestep_embedding)
All tables are computed in float32 and cast at the use site.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "sinusoid_table",
    "timestep_embedding",
    "rope_cache",
    "apply_rope",
    "rope_3d_cache",
]


@functools.lru_cache(maxsize=32)
def _sinusoid_np(n_position: int, dim: int) -> np.ndarray:
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    i = np.arange(dim, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2.0 * (np.floor(i / 2.0)) / dim)
    table = np.empty((n_position, dim), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


def sinusoid_table(n_position: int, dim: int) -> jnp.ndarray:
    """[n_position, dim] interleaved sin/cos table (fp32)."""
    return jnp.asarray(_sinusoid_np(n_position, dim))


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """ADM-style timestep embedding: [cos? no — [sin, cos] concat halves].

    t: [...] float or int timesteps -> [..., dim] fp32.
    Matches the concat([cos, sin]) vs ([sin, cos]) convention of the
    reference lvdm ``timestep_embedding`` (sin first half, cos second? the
    torch impl emits ``cat([cos, sin])``; diffusers emits ``cat([sin, cos])``
    with flip option). We emit ``cat([cos, sin])`` to match lvdm and expose
    ``flip_sin_to_cos`` at the model layer where needed.
    """
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


@functools.lru_cache(maxsize=32)
def _rope_np(max_seq_len: int, dim: int, base: float) -> np.ndarray:
    theta = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
    idx_theta = np.outer(np.arange(max_seq_len, dtype=np.float64), theta)
    return np.stack([np.cos(idx_theta), np.sin(idx_theta)], axis=-1).astype(np.float32)


def rope_cache(max_seq_len: int, dim: int, base: float = 10000.0) -> jnp.ndarray:
    """[max_seq_len, dim//2, 2] (cos, sin) cache (fp32)."""
    return jnp.asarray(_rope_np(max_seq_len, dim, base))


def apply_rope(x: jnp.ndarray, cache: jnp.ndarray) -> jnp.ndarray:
    """Rotate even/odd pairs of the head dim.

    x: [..., seq, heads, head_dim] (or [..., seq, head_dim])
    cache: [seq, head_dim//2, 2] — broadcast over leading dims and heads.
    """
    orig_dtype = x.dtype
    seq_axis = -3 if x.ndim >= 3 else -2
    seq = x.shape[seq_axis]
    xf = x.astype(jnp.float32).reshape(x.shape[:-1] + (-1, 2))
    cos = cache[:seq, :, 0]
    sin = cache[:seq, :, 1]
    if x.ndim >= 3 and seq_axis == -3:
        cos = cos[:, None, :]  # [seq, 1, d/2] broadcasting over heads
        sin = sin[:, None, :]
    x0, x1 = xf[..., 0], xf[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
    return out.reshape(x.shape).astype(orig_dtype)


def rope_3d_cache(
    dim: int,
    grid_t: int,
    grid_h: int,
    grid_w: int,
    base: float = 10000.0,
    dim_split: tuple[float, float, float] = (1 / 4, 3 / 8, 3 / 8),
) -> jnp.ndarray:
    """3D (t,h,w) factorized RoPE cache for video DiTs (CogVideoX layout).

    Returns [grid_t*grid_h*grid_w, dim//2, 2] (cos, sin): the head dim is
    split into (t, h, w) bands, each band rotated by its own axis position.
    Mirrors the semantics of diffusers' ``get_3d_rotary_pos_embed`` used by
    the reference's CogVideoX path (reference ``cogvideox/module.py:118-122``).
    """
    dim_t = int(dim * dim_split[0]) // 2 * 2
    dim_h = int(dim * dim_split[1]) // 2 * 2
    dim_w = dim - dim_t - dim_h

    def axis_freqs(n, d):
        theta = 1.0 / (base ** (np.arange(0, d, 2, dtype=np.float64) / d))
        return np.outer(np.arange(n, dtype=np.float64), theta)  # [n, d/2]

    ft = axis_freqs(grid_t, dim_t)
    fh = axis_freqs(grid_h, dim_h)
    fw = axis_freqs(grid_w, dim_w)
    # broadcast to full grid, order t-major, then h, then w
    angle = np.concatenate(
        [
            np.broadcast_to(ft[:, None, None, :], (grid_t, grid_h, grid_w, ft.shape[-1])),
            np.broadcast_to(fh[None, :, None, :], (grid_t, grid_h, grid_w, fh.shape[-1])),
            np.broadcast_to(fw[None, None, :, :], (grid_t, grid_h, grid_w, fw.shape[-1])),
        ],
        axis=-1,
    ).reshape(grid_t * grid_h * grid_w, dim // 2)
    cache = np.stack([np.cos(angle), np.sin(angle)], axis=-1).astype(np.float32)
    return jnp.asarray(cache)
