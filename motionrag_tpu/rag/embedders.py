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

__all__ = ["TextEmbedder", "SentenceTransformerEmbedder", "HashEmbedder", "get_embedder"]


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
    """'gte', 'hash', or 'hash-<dim>' (e.g. 'hash-32' for tests)."""
    if name.startswith("hash-"):
        return HashEmbedder(dim=int(name.split("-", 1)[1]))
    if name == "gte":
        return SentenceTransformerEmbedder(dim=dim)
    if name == "hash":
        return HashEmbedder(dim=dim)
    raise ValueError(f"unknown embedder {name!r}")
