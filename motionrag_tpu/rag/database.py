"""RAGDatabase: the public retrieval API, signature-compatible with the
reference's LanceDB wrapper (reference ``src/data/rag.py:11-130``) but backed
by the on-device exact index.

Differences, by design (SURVEY.md §7 "RAG recall parity"):
  - exact search instead of IVF (nprobes/refine_factor accepted + ignored),
  - ``where`` supports the pandas-query subset actually used by the pipeline
    (``video != "x"`` fast-path handled on device; anything else evaluated
    host-side on the metadata frame),
  - ``_distance`` is 1 - cosine similarity.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Literal, Sequence

import numpy as np
import pandas as pd

from motionrag_tpu.rag.embedders import TextEmbedder, get_embedder
from motionrag_tpu.rag.index import DeviceIndex, VectorStore

__all__ = ["RAGDatabase"]

_NEQ_WHERE = re.compile(r"""^\s*(\w+)\s*!=\s*["']([^"']*)["']\s*$""")


class RAGDatabase:
    def __init__(
        self,
        db_path: str | Path,
        table_name: str,
        device: str = "tpu",
        text_embedder: TextEmbedder | str | None = None,
    ):
        self.db_path = Path(db_path)
        self.table_name = table_name
        self.store = VectorStore(self.db_path / table_name)
        self._indexes: dict[str, DeviceIndex] = {}
        if isinstance(text_embedder, str) or text_embedder is None:
            self.text_embedder = get_embedder(text_embedder or "gte")
        else:
            self.text_embedder = text_embedder

    def _index(self, column: str) -> DeviceIndex:
        if column not in self._indexes:
            self._indexes[column] = DeviceIndex(self.store, column)
        return self._indexes[column]

    # -- where handling ----------------------------------------------------

    def _parse_where(self, where: str | None):
        """Returns (exclude_value, residual_mask). The ``col != "x"`` pattern
        on the group column becomes a device-side exclusion; anything else is
        evaluated with pandas.query host-side into a boolean keep-mask."""
        if where is None:
            return None, None
        m = _NEQ_WHERE.match(where)
        if m and m.group(1) == "video":
            return m.group(2), None
        keep = self.store.meta.eval(where)
        return None, np.asarray(keep, dtype=bool)

    # -- search API --------------------------------------------------------

    def vector_search(
        self,
        vector: np.ndarray | str,
        vector_column_name: str,
        top_k: int = 10,
        where: str | None = None,
        select: Sequence[str] | None = None,
        nprobes: int = 50,  # accepted for API parity; exact search ignores
        refine_factor: int = 30,
        output_format: Literal["pandas", "dict", "list"] = "dict",
    ):
        if isinstance(vector, str):
            vector = self.text_embedder.encode([vector])[0]
        vector = np.asarray(vector, np.float32)
        squeeze = vector.ndim == 1
        if squeeze:
            vector = vector[None]

        exclude_value, keep_mask = self._parse_where(where)
        index = self._index(vector_column_name)
        exclude = [exclude_value] * len(vector) if exclude_value else None
        # over-fetch when a host-side mask will drop rows
        fetch_k = top_k if keep_mask is None else min(index.num_rows, top_k * 4)
        dist, idx = index.search(vector, fetch_k, exclude=exclude)

        results = []
        for qi in range(len(vector)):
            rows, drop = [], 0
            for d, i in zip(dist[qi], idx[qi]):
                if i < 0:
                    continue
                if keep_mask is not None and not keep_mask[i]:
                    drop += 1
                    continue
                rows.append((int(i), float(d)))
                if len(rows) >= top_k:
                    break
            frame = self.store.meta.iloc[[r[0] for r in rows]].copy()
            frame["_distance"] = [r[1] for r in rows]
            if select is not None:
                frame = frame[list(select) + ["_distance"]]
            results.append(frame.reset_index(drop=True))

        formatted = [self.format_result(f, output_format) for f in results]
        return formatted[0] if squeeze else formatted

    @staticmethod
    def format_result(frame: pd.DataFrame, format: str = "dict"):
        if format == "pandas":
            return frame
        if format in ("dict", "list"):
            return frame.to_dict("records")
        raise ValueError(f"Invalid format: {format}")

    def text_search(self, text, top_k: int = 10, **kwargs):
        return self.vector_search(text, "text_embedding", top_k=top_k, **kwargs)

    def image_search(self, image_embedding, top_k: int = 10, **kwargs):
        return self.vector_search(image_embedding, "image_embedding", top_k=top_k, **kwargs)

    def text_image_search(
        self,
        text,
        image_embedding,
        top_k: tuple[int, int] = (20, 10),
        where: str | None = None,
        select: Sequence[str] | None = None,
        output_format: str = "dict",
        **kwargs,
    ):
        """Text top-k shortlist, image-similarity re-rank (reference
        ``rag.py:101-130`` materializes a temp table; here the shortlist rows
        are re-scored directly against the image column)."""
        if isinstance(text, str):
            text = self.text_embedder.encode([text])[0]
        exclude_value, keep_mask = self._parse_where(where)
        _, rows = self._index("text_embedding").search(
            np.asarray(text, np.float32),
            top_k[0] if keep_mask is None else top_k[0] * 4,
            exclude=[exclude_value] if exclude_value else None,
        )
        rows0 = [int(r) for r in rows[0] if r >= 0 and (keep_mask is None or keep_mask[r])]
        rows0 = rows0[: top_k[0]]
        img_emb = np.asarray(self.store.load_embeddings("image_embedding"), np.float32)
        q = np.asarray(image_embedding, np.float32)
        q = q / max(np.linalg.norm(q), 1e-8)
        cand = img_emb[rows0]
        cand = cand / np.maximum(np.linalg.norm(cand, axis=-1, keepdims=True), 1e-8)
        sims = cand @ q
        order = np.argsort(-sims)[: top_k[1]]
        frame = self.store.meta.iloc[[rows0[i] for i in order]].copy()
        frame["_distance"] = [1.0 - float(sims[i]) for i in order]
        if select is not None:
            frame = frame[list(select) + ["_distance"]]
        return self.format_result(frame.reset_index(drop=True), output_format)
