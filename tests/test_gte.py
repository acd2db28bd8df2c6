"""GTE-v1.5 (NewModel) JAX port: golden parity vs a HF-keyed torch mirror,
plus the rag embedder plumbing. The real checkpoint cannot download here;
the mirror replicates the trust_remote_code ``NewModel`` architecture with
the exact state-dict key names so a released checkpoint drops straight into
``port_gte`` (reference ``tools/build_rag_database.py:17-33``)."""

import numpy as np
import pytest
import torch

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from motionrag_tpu.models.encoders.gte import GTEEncoder  # noqa: E402
from motionrag_tpu.utils.porting import port_gte  # noqa: E402


class _TGTEAttention(torch.nn.Module):
    def __init__(self, dim, heads, theta):
        super().__init__()
        self.qkv_proj = torch.nn.Linear(dim, 3 * dim)
        self.o_proj = torch.nn.Linear(dim, dim)
        self.heads, self.theta = heads, theta

    @staticmethod
    def _rope(x, theta):
        b, s, h, d = x.shape
        half = d // 2
        freq = theta ** (-torch.arange(0, half, dtype=torch.float32) / half)
        ang = torch.arange(s, dtype=torch.float32)[:, None] * freq[None]
        cos, sin = torch.cos(ang)[None, :, None], torch.sin(ang)[None, :, None]
        x1, x2 = x[..., :half], x[..., half:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)

    def forward(self, x, bias):
        b, s, dim = x.shape
        hd = dim // self.heads
        q, k, v = self.qkv_proj(x).chunk(3, dim=-1)
        q = self._rope(q.view(b, s, self.heads, hd), self.theta)
        k = self._rope(k.view(b, s, self.heads, hd), self.theta)
        v = v.view(b, s, self.heads, hd)
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) * hd ** -0.5 + bias
        probs = torch.softmax(logits, dim=-1)
        out = torch.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, dim)
        return self.o_proj(out)


class _TGTEMLP(torch.nn.Module):
    def __init__(self, dim, inter):
        super().__init__()
        self.up_gate_proj = torch.nn.Linear(dim, 2 * inter, bias=False)
        self.down_proj = torch.nn.Linear(inter, dim)
        self.inter = inter

    def forward(self, x):
        up, gate = torch.split(self.up_gate_proj(x), self.inter, dim=-1)
        return self.down_proj(torch.nn.functional.gelu(gate) * up)


class _TGTELayer(torch.nn.Module):
    def __init__(self, dim, heads, inter, theta, eps):
        super().__init__()
        self.attention = _TGTEAttention(dim, heads, theta)
        self.mlp = _TGTEMLP(dim, inter)
        self.attn_ln = torch.nn.LayerNorm(dim, eps=eps)
        self.mlp_ln = torch.nn.LayerNorm(dim, eps=eps)

    def forward(self, x, bias):
        x = self.attn_ln(x + self.attention(x, bias))
        return self.mlp_ln(x + self.mlp(x))


class _TGTE(torch.nn.Module):
    """HF-keyed NewModel mirror (embeddings.*, encoder.layer.{i}.*)."""

    def __init__(self, vocab=64, dim=32, depth=2, heads=2, inter=48,
                 theta=160000.0, eps=1e-12, types=2):
        super().__init__()
        self.embeddings = torch.nn.Module()
        self.embeddings.word_embeddings = torch.nn.Embedding(vocab, dim)
        self.embeddings.token_type_embeddings = torch.nn.Embedding(types, dim)
        self.embeddings.LayerNorm = torch.nn.LayerNorm(dim, eps=eps)
        self.encoder = torch.nn.Module()
        self.encoder.layer = torch.nn.ModuleList(
            [_TGTELayer(dim, heads, inter, theta, eps) for _ in range(depth)])

    def forward(self, ids, mask):
        x = self.embeddings.word_embeddings(ids) + \
            self.embeddings.token_type_embeddings.weight[0]
        x = self.embeddings.LayerNorm(x)
        bias = torch.where(mask[:, None, None, :] > 0,
                           torch.tensor(0.0), torch.tensor(-1e9))
        for layer in self.encoder.layer:
            x = layer(x, bias)
        return x


def test_gte_parity():
    torch.manual_seed(0)
    tm = _TGTE().eval()
    ours = GTEEncoder(vocab_size=64, dim=32, depth=2, heads=2, intermediate=48)
    params = port_gte(tm.state_dict(), depth=2)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 64, (2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        hidden_t = tm(torch.from_numpy(ids), torch.from_numpy(mask)).numpy()
        cls = hidden_t[:, 0]
        pooled_t = cls / np.linalg.norm(cls, axis=-1, keepdims=True)

    hidden_j = ours.apply(params, jnp.asarray(ids), jnp.asarray(mask), pooled=False)
    np.testing.assert_allclose(np.asarray(hidden_j), hidden_t, rtol=2e-4, atol=2e-4)
    pooled_j = ours.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(pooled_j), pooled_t, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pooled_j), axis=-1), 1.0, rtol=1e-5)


def test_jax_gte_embedder_plumbing(tmp_path):
    """rag.embedders.JaxGTEEmbedder: ported params + a word-level tokenizer
    stub -> deterministic unit-norm embeddings through the real encode path."""
    from motionrag_tpu.rag.embedders import JaxGTEEmbedder, get_embedder

    torch.manual_seed(1)
    tm = _TGTE()
    params = port_gte(tm.state_dict(), depth=2)

    emb = JaxGTEEmbedder(params=params, dim=32, depth=2, heads=2,
                         intermediate=48, vocab_size=64)
    out = emb.encode(["a cat sat", "a dog"], batch_size=2)
    assert out.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
    # deterministic + batch-size independent
    again = emb.encode(["a cat sat", "a dog"], batch_size=1)
    np.testing.assert_allclose(out, again, rtol=2e-5, atol=2e-5)

    # registry fallback: jax-gte without weights degrades to hash (offline)
    fallback = get_embedder("jax-gte", dim=16)
    assert fallback.encode(["x"]).shape == (1, 16)
