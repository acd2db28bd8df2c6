"""Unit tests for the ops layer: flash attention numerics (pallas interpret
mode vs XLA reference), positional embeddings, norms, masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionrag_tpu.ops.attention import (
    block_causal_mask,
    dot_product_attention,
    _xla_attention,
)
from motionrag_tpu.ops.flash_attention import flash_attention
from motionrag_tpu.ops.norms import group_norm, layer_norm, rms_norm
from motionrag_tpu.ops.posemb import (
    apply_rope,
    rope_cache,
    sinusoid_table,
    timestep_embedding,
)


def _ref_attn(q, k, v, scale=None, causal=False):
    # independent numpy reference
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = scale or d ** -0.5
    s = np.einsum("bhqd,bhkd->bhqk", q, k).astype(np.float64) * scale
    if causal:
        mask = np.tril(np.ones((sq, skv), dtype=bool), k=skv - sq)
        s = np.where(mask, s, -np.inf)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,skv,d", [(256, 256, 64), (300, 300, 64), (128, 384, 32)])
def test_flash_forward_matches_reference(rng, causal, sq, skv, d):
    if causal and sq != skv:
        pytest.skip("causal requires square here")
    q = rng.standard_normal((1, 2, sq, d), dtype=np.float32)
    k = rng.standard_normal((1, 2, skv, d), dtype=np.float32)
    v = rng.standard_normal((1, 2, skv, d), dtype=np.float32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=causal, block_q=128, block_k=128, interpret=True,
    )
    ref = _ref_attn(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_backward_matches_xla(rng, causal):
    sq = skv = 256
    d = 32
    q = jnp.asarray(rng.standard_normal((1, 1, sq, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, skv, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((1, 1, skv, d), dtype=np.float32))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_xla(q, k, v):
        o = _xla_attention(q, k, v, d ** -0.5, None, causal)
        return jnp.sum(o * jnp.cos(o))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("sq,skv", [(1537, 1537), (512, 300)])
def test_flash_qk_int8_close_to_exact(rng, monkeypatch, sq, skv):
    """MRT_FLASH_QK_INT8: SageAttention-style int8 QK on the transposed
    inference path (per-token Q / per-block smoothed-K scales). Quantization
    noise bound, not bit parity — serving opt-in only."""
    monkeypatch.setenv("MRT_FLASH_QK_INT8", "1")
    d = 64
    q = rng.standard_normal((1, 2, sq, d), dtype=np.float32)
    # nonzero K mean exercises the softmax-invariant smoothing
    k = rng.standard_normal((1, 2, skv, d), dtype=np.float32) + 0.3
    v = rng.standard_normal((1, 2, skv, d), dtype=np.float32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True)
    ref = _ref_attn(q, k, v, causal=False)
    err = np.abs(np.asarray(out) - ref)
    assert err.max() < 0.05, err.max()
    assert err.mean() < 0.005, err.mean()


def test_dot_product_attention_bshd(rng):
    b, s, h, d = 2, 64, 4, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d), dtype=np.float32))
    out = dot_product_attention(q, k, v)
    ref = _ref_attn(
        np.asarray(q).transpose(0, 2, 1, 3),
        np.asarray(k).transpose(0, 2, 1, 3),
        np.asarray(v).transpose(0, 2, 1, 3),
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("b,s,h,d", [
    (512, 16, 2, 16),   # pack=8, b*h divisible
    (100, 16, 3, 8),    # b*h=300 not divisible by pack=8 -> padding path
    (256, 25, 2, 16),   # pack=5 (SVD 25f), packed_len 125 < 128
])
def test_packed_small_attention_matches_reference(rng, b, s, h, d):
    from motionrag_tpu.ops.attention import packed_small_attention

    q = jnp.asarray(rng.standard_normal((b, s, h, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d), dtype=np.float32))
    out = packed_small_attention(q, k, v, d ** -0.5)
    ref = _ref_attn(
        np.asarray(q).transpose(0, 2, 1, 3),
        np.asarray(k).transpose(0, 2, 1, 3),
        np.asarray(v).transpose(0, 2, 1, 3),
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_packed_small_attention_grads(rng):
    from motionrag_tpu.ops.attention import packed_small_attention

    b, s, h, d = 48, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((b, s, h, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d), dtype=np.float32))

    def loss_packed(q, k, v):
        return jnp.sum(packed_small_attention(q, k, v, d ** -0.5) ** 2)

    def loss_ref(q, k, v):
        out = _xla_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), d ** -0.5, None, False,
        )
        return jnp.sum(out ** 2)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_attention_mask_and_gqa(rng):
    b, s, h, d = 1, 32, 4, 8
    q = jnp.asarray(rng.standard_normal((b, s, h, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, 2, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, 2, d), dtype=np.float32))
    mask = block_causal_mask(4, 8)
    out = dot_product_attention(q, k, v, mask=mask)
    assert out.shape == (b, s, h, d)
    # first frame tokens only attend within frame 0
    k2 = k.at[:, 8:].set(999.0)  # changing masked-out keys must not matter...
    v2 = v.at[:, 8:].set(999.0)
    out2 = dot_product_attention(q, k2, v2, mask=mask)
    np.testing.assert_allclose(np.asarray(out[:, :8]), np.asarray(out2[:, :8]), atol=1e-5)


def test_block_causal_mask_semantics():
    m = np.asarray(block_causal_mask(3, 2))
    assert m.shape == (6, 6)
    # frame 0 attends frame 0 only
    assert m[0, :2].all() and not m[0, 2:].any()
    # frame 2 attends everything
    assert m[5].all()


def test_sinusoid_table_matches_reference_formula():
    dim, n = 16, 10
    table = np.asarray(sinusoid_table(n, dim))
    # independent recomputation (reference position_embeddings.py:163-168)
    ref = np.array(
        [
            [p / np.power(10000, 2 * (j // 2) / dim) for j in range(dim)]
            for p in range(n)
        ]
    )
    ref[:, 0::2] = np.sin(ref[:, 0::2])
    ref[:, 1::2] = np.cos(ref[:, 1::2])
    np.testing.assert_allclose(table, ref, atol=1e-6)


def test_rope_preserves_norm_and_zero_position(rng):
    d = 32
    cache = rope_cache(16, d)
    x = jnp.asarray(rng.standard_normal((2, 16, 4, d), dtype=np.float32))
    out = apply_rope(x, cache)
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]), atol=1e-6)
    # rotation preserves pairwise norms
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_timestep_embedding_shape_and_range():
    emb = timestep_embedding(jnp.asarray([0.0, 10.0, 999.0]), 320)
    assert emb.shape == (3, 320)
    assert np.abs(np.asarray(emb)).max() <= 1.0 + 1e-6
    # t=0: cos half = 1, sin half = 0
    np.testing.assert_allclose(np.asarray(emb[0, :160]), np.ones(160), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), np.zeros(160), atol=1e-6)


def test_group_norm_matches_torch_semantics(rng):
    import torch

    x = rng.standard_normal((2, 6, 5, 8), dtype=np.float32)  # NHWC
    scale = rng.standard_normal(8, dtype=np.float32)
    bias = rng.standard_normal(8, dtype=np.float32)
    out = group_norm(jnp.asarray(x), 4, jnp.asarray(scale), jnp.asarray(bias))
    ref = torch.nn.functional.group_norm(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        4,
        torch.from_numpy(scale),
        torch.from_numpy(bias),
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_layer_norm_and_rms_norm(rng):
    import torch

    x = rng.standard_normal((3, 7, 12), dtype=np.float32)
    s = rng.standard_normal(12, dtype=np.float32)
    b = rng.standard_normal(12, dtype=np.float32)
    out = layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b))
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (12,), torch.from_numpy(s), torch.from_numpy(b)
    ).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)

    out = np.asarray(rms_norm(jnp.asarray(x)))
    ref = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("tq,tkv,h,d", [(16, 16, 5, 64), (25, 25, 8, 32), (4, 16, 2, 64)])
def test_small_seq_attention_matches_reference(rng, tq, tkv, h, d):
    from motionrag_tpu.ops.temporal_attention import small_seq_attention

    n = 300  # not a block multiple: exercises padding
    q = jax.random.normal(jax.random.key(0), (n, tq, h, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (n, tkv, h, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (n, tkv, h, d), jnp.float32)

    out = small_seq_attention(q, k, v, block_n=128, interpret=True)
    ref = dot_product_attention(q, k, v, use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_small_seq_attention_bf16(rng):
    from motionrag_tpu.ops.temporal_attention import small_seq_attention

    n, t, h, d = 256, 16, 5, 64
    q = jax.random.normal(jax.random.key(3), (n, t, h, d)).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.key(4), (n, t, h, d)).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.key(5), (n, t, h, d)).astype(jnp.bfloat16)
    out = small_seq_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = dot_product_attention(q, k, v, use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )


def test_flash_spmd_partitioning_batch_heads(rng):
    """The flash kernel carries a custom_partitioning rule: under a pjit
    with operands sharded over batch*heads, each device runs the kernel on
    its own shard with ZERO collectives (dp shards batch, tp shards heads —
    both land on dim 0 of the flattened [bh, s, d] kernel layout). Without
    the rule XLA would have to all-gather the full tensors per device."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.array(devs[:4]).reshape(2, 2), ("dp", "tp"))

    b, h, s, d = 2, 4, 256, 32
    q = rng.standard_normal((b, h, s, d), dtype=np.float32)
    k = rng.standard_normal((b, h, s, d), dtype=np.float32)
    v = rng.standard_normal((b, h, s, d), dtype=np.float32)
    shard = NamedSharding(mesh, P("dp", "tp"))
    qs, ks, vs = (jax.device_put(jnp.asarray(x), shard) for x in (q, k, v))

    f = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, block_q=128, block_k=128, interpret=True))
    out = f(qs, ks, vs)
    np.testing.assert_allclose(
        np.asarray(out), _ref_attn(q, k, v), atol=2e-5, rtol=2e-5)
    # output stays sharded like the inputs (no implicit replication)
    assert out.sharding.spec[:2] == ("dp", "tp")
    # and the program contains no cross-device communication at all
    txt = f.lower(qs, ks, vs).compile().as_text()
    for coll in ("all-gather", "all-reduce", "collective-permute", "all-to-all"):
        assert coll not in txt, f"unexpected {coll} in partitioned flash"


def test_flash_spmd_grad_partitioned(rng):
    """Backward kernels partition the same way (training under dp/tp)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs multiple devices")
    mesh = Mesh(np.array(devs[:2]), ("dp",))

    b, h, s, d = 2, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d), dtype=np.float32))
    shard = NamedSharding(mesh, P("dp"))
    qs, ks, vs = (jax.device_put(x, shard) for x in (q, k, v))

    def loss(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        return jnp.sum(o * jnp.cos(o))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    gs = g(qs, ks, vs)
    gr = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)
    txt = g.lower(qs, ks, vs).compile().as_text()
    assert "all-gather" not in txt


def test_flash_spmd_seq_parallel_q(rng):
    """Non-causal flash forward also declares the q-seq factor parallel:
    sharding the token axis runs each device's q rows locally and gathers
    only K/V (all-gather-KV sequence parallelism), with the output staying
    seq-sharded."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs multiple devices")
    mesh = Mesh(np.array(devs[:2]), ("sp",))

    b, h, s, d = 1, 2, 256, 32
    q = rng.standard_normal((b, h, s, d), dtype=np.float32)
    k = rng.standard_normal((b, h, s, d), dtype=np.float32)
    v = rng.standard_normal((b, h, s, d), dtype=np.float32)
    shard = NamedSharding(mesh, P(None, None, "sp", None))
    qs, ks, vs = (jax.device_put(jnp.asarray(x), shard) for x in (q, k, v))

    f = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, block_q=128, block_k=128, interpret=True))
    out = f(qs, ks, vs)
    np.testing.assert_allclose(
        np.asarray(out), _ref_attn(q, k, v), atol=2e-5, rtol=2e-5)
    assert out.sharding.spec[2] == "sp", f"output lost seq sharding: {out.sharding.spec}"
    txt = f.lower(qs, ks, vs).compile().as_text()
    assert "all-gather" in txt  # K/V gather is expected...
    # ...but causal stays batch-only (mask depends on absolute q position)
    fc = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, causal=True, block_q=128, block_k=128, interpret=True))
    outc = fc(qs, ks, vs)
    np.testing.assert_allclose(
        np.asarray(outc), _ref_attn(q, k, v, causal=True), atol=2e-5, rtol=2e-5)
