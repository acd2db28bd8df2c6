"""Sequence-parallel ring attention over an ``sp`` mesh axis.

The reference has NO sequence parallelism (SURVEY.md §5.7 — verified
absent); sequence length is bounded by design at <=17,776 tokens (CogVideoX
49f 720p joint attention). This op is the TPU-native headroom beyond that:
shard the token axis across devices, keep q local, and rotate K/V shards
around the ICI ring (`lax.ppermute`), merging per-shard partial attention
with the numerically exact online-softmax combine (log-sum-exp weighted).
Peak memory per chip drops from O(s) to O(s/N) activations, and the K/V
transfers overlap the local attention compute on real hardware.

Non-causal only — every attention site in this framework (UNet spatial,
DiT joint, resampler) is mask-free; fp32 statistics throughout.

Usage (inside shard_map, seq sharded over ``axis_name``):
    out = ring_attention(q, k, v, axis_name="sp")
or let :func:`sequence_parallel_attention` build the shard_map over a mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["ring_attention", "sequence_parallel_attention"]


def _local_attention_lse(q, k, v, scale):
    """Plain attention over one K/V block, returning (out, lse) with fp32
    statistics. out is UNNORMALIZED by the global softmax — the caller
    merges blocks via lse. [b, h, s_q, d] x [b, h, s_kv, d]."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", p / l, v.astype(jnp.float32))
    lse = (m + jnp.log(l))[..., 0]
    return out, lse


def ring_attention(q, k, v, axis_name: str, *, scale: float | None = None):
    """Per-shard ring attention body. q, k, v: [b, h, s_local, d] (this
    device's token shard); returns [b, h, s_local, d] in q.dtype.

    N-1 `ppermute` rotations move each K/V shard once around the ring;
    partial outputs merge with the exact two-way log-sum-exp combine, so the
    result is bit-comparable (up to fp reassociation) to full attention.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    out0, lse0 = _local_attention_lse(q, k, v, scale)

    def body(_, carry):
        acc, lse_tot, k_c, v_c = carry
        k_c = lax.ppermute(k_c, axis_name, perm)
        v_c = lax.ppermute(v_c, axis_name, perm)
        out_b, lse_b = _local_attention_lse(q, k_c, v_c, scale)
        new_lse = jnp.logaddexp(lse_tot, lse_b)
        w_old = jnp.exp(lse_tot - new_lse)[..., None]
        w_new = jnp.exp(lse_b - new_lse)[..., None]
        return acc * w_old + out_b * w_new, new_lse, k_c, v_c

    acc, _, _, _ = lax.fori_loop(0, n - 1, body, (out0, lse0, k, v))
    return acc.astype(q.dtype)


def sequence_parallel_attention(q, k, v, mesh, axis: str = "sp", *,
                                scale: float | None = None):
    """Full-tensor entry: q, k, v [b, h, s, d] with s divisible by the
    ``axis`` mesh size. Shards the token axis, runs the ring, returns the
    seq-sharded result (same logical value as dense attention)."""
    from jax.experimental.shard_map import shard_map

    spec = P(None, None, axis, None)
    fn = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    shard = NamedSharding(mesh, spec)
    return fn(jax.device_put(q, shard), jax.device_put(k, shard),
              jax.device_put(v, shard))


def ring_attention_bshd(q, k, v, axis: str = "sp", *, mesh=None,
                        scale: float | None = None):
    """In-jit BSHD entry used by the DiT's sequence-parallel mode
    (``models/cogvideox/dit.py`` ``sp_attention='ring'``): q, k, v
    [b, s, h, d] with s divisible by the ``axis`` mesh size. Builds the
    shard_map over the ambient mesh (trace-safe — no device_put), returns
    [b, s, h, d] seq-sharded over ``axis``. Caller guards divisibility and
    mesh presence."""
    from jax.experimental.shard_map import shard_map

    from motionrag_tpu.parallel.sharding import ambient_mesh

    mesh = mesh or ambient_mesh()
    spec = P(None, axis, None, None)  # [b, s, h, d] sharded on s

    def body(qs, ks, vs):
        # BSHD -> BHSD for the ring body, back after
        out = ring_attention(
            qs.transpose(0, 2, 1, 3), ks.transpose(0, 2, 1, 3),
            vs.transpose(0, 2, 1, 3), axis, scale=scale,
        )
        return out.transpose(0, 2, 1, 3)

    fn = shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_rep=False)
    return fn(q, k, v)
