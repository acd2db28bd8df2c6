"""Text/image embedders feeding the retrieval index.

The reference embeds captions with sentence-transformers
``Alibaba-NLP/gte-base-en-v1.5`` (reference ``datamodule.py:296-304``,
``tools/build_rag_database.py:28-33``) and images with EVA-CLIP. Here the
embedder is a pluggable protocol:

  - ``SentenceTransformerEmbedder``: host-side (CPU torch) GTE encoder, used
    when the pretrained weights are available locally.
  - ``HashEmbedder``: deterministic seeded-gaussian pseudo-embedding keyed on
    the text hash — used in tests and offline environments; identical texts
    map to identical vectors so retrieval semantics are exercised end to end.
"""

from __future__ import annotations

import hashlib
from typing import Protocol, Sequence

import numpy as np

__all__ = ["TextEmbedder", "SentenceTransformerEmbedder", "JaxGTEEmbedder",
           "HashEmbedder", "get_embedder"]


class TextEmbedder(Protocol):
    dim: int

    def encode(self, texts: Sequence[str], batch_size: int = 256) -> np.ndarray: ...


class SentenceTransformerEmbedder:
    """GTE text encoder on host CPU (lazy torch import)."""

    def __init__(self, model_name: str = "Alibaba-NLP/gte-base-en-v1.5", dim: int = 768):
        self.model_name = model_name
        self.dim = dim
        self._model = None

    def _load(self):
        if self._model is None:
            from sentence_transformers import SentenceTransformer

            self._model = SentenceTransformer(self.model_name, trust_remote_code=True)
        return self._model

    def encode(self, texts: Sequence[str], batch_size: int = 256) -> np.ndarray:
        model = self._load()
        emb = model.encode(list(texts), batch_size=batch_size, show_progress_bar=False)
        emb = np.asarray(emb, dtype=np.float32)
        return emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)


class JaxGTEEmbedder:
    """GTE-v1.5 on the JAX device (TPU-native; models/encoders/gte.py).

    Weights arrive either pre-ported (``params=``) or as a torch state dict
    file on disk (``weights_path=``, converted via ``utils.porting.port_gte``
    — the released sentence-transformers checkpoint drops in unchanged).
    Tokenization: a HF tokenizer when ``tokenizer_path`` points at a local
    vocab (BERT WordPiece, what the checkpoint ships), else a deterministic
    whitespace/byte fallback so the encode path stays exercisable offline.
    """

    def __init__(self, params=None, weights_path: str | None = None,
                 tokenizer_path: str | None = None, max_length: int = 128,
                 dim: int = 768, depth: int = 12, heads: int = 12,
                 intermediate: int = 3072, vocab_size: int = 30528,
                 rope_theta: float = 160000.0):
        from motionrag_tpu.models.encoders.gte import GTEEncoder

        self.dim = dim
        self.max_length = max_length
        self.vocab_size = vocab_size
        self.model = GTEEncoder(
            vocab_size=vocab_size, dim=dim, depth=depth, heads=heads,
            intermediate=intermediate, rope_theta=rope_theta,
        )
        if params is None:
            if weights_path is None:
                raise ValueError("JaxGTEEmbedder needs params= or weights_path=")
            import torch

            from motionrag_tpu.utils.porting import port_gte

            sd = torch.load(weights_path, map_location="cpu", weights_only=True)
            params = port_gte(sd, depth=depth)
        self.params = params
        self._tokenizer = None
        if tokenizer_path:
            from transformers import BertTokenizerFast

            self._tokenizer = BertTokenizerFast.from_pretrained(tokenizer_path)
        self._jit = None

    def _tokenize(self, texts: Sequence[str]) -> tuple[np.ndarray, np.ndarray]:
        if self._tokenizer is not None:
            enc = self._tokenizer(list(texts), padding="max_length",
                                  truncation=True, max_length=self.max_length,
                                  return_tensors="np")
            return enc["input_ids"], enc["attention_mask"]
        # offline fallback: [CLS]-like 0 + word-hash ids, right-padded
        ids = np.zeros((len(texts), self.max_length), np.int32)
        mask = np.zeros((len(texts), self.max_length), np.int32)
        for i, t in enumerate(texts):
            toks = [0] + [
                1 + int.from_bytes(hashlib.sha256(w.encode()).digest()[:4], "little")
                % (self.vocab_size - 1)
                for w in t.split()[: self.max_length - 1]
            ]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return ids, mask

    def encode(self, texts: Sequence[str], batch_size: int = 256) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        if self._jit is None:
            self._jit = jax.jit(
                lambda p, ids, mask: self.model.apply(p, ids, mask))
        out = np.empty((len(texts), self.dim), np.float32)
        for lo in range(0, len(texts), batch_size):
            chunk = list(texts[lo: lo + batch_size])
            ids, mask = self._tokenize(chunk)
            emb = self._jit(self.params, jnp.asarray(ids), jnp.asarray(mask))
            out[lo: lo + len(chunk)] = np.asarray(emb, np.float32)
        return out


class HashEmbedder:
    """Deterministic pseudo-embedding: seeded gaussian from sha256(text).

    Not semantically meaningful, but stable across processes, which is what
    tests and offline smoke runs need.
    """

    def __init__(self, dim: int = 768):
        self.dim = dim

    def encode(self, texts: Sequence[str], batch_size: int = 256) -> np.ndarray:
        out = np.empty((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "little")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(self.dim).astype(np.float32)
            out[i] = v / np.linalg.norm(v)
        return out


def get_embedder(name: str = "gte", dim: int = 768) -> TextEmbedder:
    """'gte' (host torch), 'jax-gte[:/weights.pt[:/tokenizer]]' (on-device),
    'hash', or 'hash-<dim>' (e.g. 'hash-32' for tests)."""
    if name.startswith("hash-"):
        return HashEmbedder(dim=int(name.split("-", 1)[1]))
    if name == "gte":
        return SentenceTransformerEmbedder(dim=dim)
    if name == "jax-gte" or name.startswith("jax-gte:"):
        import os

        parts = name.split(":")
        weights = parts[1] if len(parts) > 1 else os.environ.get("MRT_GTE_WEIGHTS")
        tok = parts[2] if len(parts) > 2 else os.environ.get("MRT_GTE_TOKENIZER")
        if not weights or not os.path.exists(weights):
            import sys

            print("jax-gte: no weights available (pass jax-gte:/path/to/"
                  "state_dict.pt or set MRT_GTE_WEIGHTS) — falling back to "
                  "the hash embedder (NOT the reference retrieval space)",
                  file=sys.stderr)
            return HashEmbedder(dim=dim)
        return JaxGTEEmbedder(weights_path=weights, tokenizer_path=tok, dim=dim)
    if name == "hash":
        return HashEmbedder(dim=dim)
    raise ValueError(f"unknown embedder {name!r}")
