"""Host-side tokenizers for the data path.

The reference tokenizes inside its frozen text encoders (HF
``CLIPTokenizer``/``T5Tokenizer`` pulled at model load,
``src/models/condition.py``). Here tokenization is a dataset-side callable
(``VideoDataModule(tokenizer=...)``) so the jitted compute path only ever
sees fixed-shape integer ids:

  ``HFTokenizer``    wraps a local ``transformers`` tokenizer directory —
                     the production path once assets are staged.
  ``HashTokenizer``  deterministic word-hash ids — keeps every text-
                     conditioned pipeline runnable end-to-end in a
                     zero-egress environment (tests, smoke runs).
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["HashTokenizer", "HFTokenizer"]


class HashTokenizer:
    """Stable word-level hash ids in ``[n_special, vocab_size)``.

    id 0 = pad, 1 = bos/eos marker (mirrors CLIP's start/end special-token
    layout closely enough for shape/semantic tests)."""

    def __init__(self, vocab_size: int = 49408, max_length: int = 77,
                 add_special: bool = True):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.add_special = add_special

    def _word_id(self, word: str) -> int:
        h = int.from_bytes(hashlib.sha1(word.encode()).digest()[:4], "little")
        return 2 + h % (self.vocab_size - 2)

    def __call__(self, text: str) -> np.ndarray:
        ids = [self._word_id(w) for w in str(text).lower().split()]
        if self.add_special:
            ids = [1] + ids[: self.max_length - 2] + [1]
        ids = ids[: self.max_length]
        out = np.zeros(self.max_length, np.int32)
        out[: len(ids)] = ids
        return out


class HFTokenizer:
    """``transformers`` tokenizer from a local directory (zero-egress:
    ``local_files_only`` is forced)."""

    def __init__(self, path: str, max_length: int = 77):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.max_length = max_length

    def __call__(self, text: str) -> np.ndarray:
        out = self.tok(
            str(text), padding="max_length", truncation=True,
            max_length=self.max_length, return_tensors="np",
        )
        return out["input_ids"][0].astype(np.int32)
