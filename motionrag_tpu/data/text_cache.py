"""Precompute text features into a prompt->feature cache (reference
``src/data/text_cache.py:9-68``): the offline route for CLIP/T5 text
conditioning when tokenizer assets or encoders shouldn't run in the loader.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Callable, Sequence

import numpy as np

__all__ = ["calc_text_features", "TextFeatureCache"]


def calc_text_features(
    prompts: Sequence[str],
    encode_fn: Callable[[Sequence[str]], np.ndarray],
    save_path: str | Path | None = None,
    batch_size: int = 256,
) -> dict[str, np.ndarray]:
    """Encode unique prompts in batches into {prompt: feature}."""
    uniq = sorted(set(prompts))
    features: dict[str, np.ndarray] = {}
    for i in range(0, len(uniq), batch_size):
        chunk = uniq[i : i + batch_size]
        emb = np.asarray(encode_fn(chunk))
        for p, e in zip(chunk, emb):
            features[p] = e
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        with open(save_path, "wb") as f:
            pickle.dump(features, f)
    return features


class TextFeatureCache:
    """Lookup wrapper used by datasets/pipelines: returns cached features,
    with an optional on-miss encoder."""

    def __init__(self, cache_path: str | Path | None = None,
                 encode_fn: Callable | None = None):
        self.features: dict[str, np.ndarray] = {}
        if cache_path and Path(cache_path).exists():
            with open(cache_path, "rb") as f:
                self.features = pickle.load(f)
        self.encode_fn = encode_fn

    def __call__(self, prompt: str) -> np.ndarray:
        if prompt in self.features:
            return self.features[prompt]
        if self.encode_fn is None:
            raise KeyError(f"prompt not cached and no encoder: {prompt[:60]!r}")
        feat = np.asarray(self.encode_fn([prompt]))[0]
        self.features[prompt] = feat
        return feat
