"""RAG database builder (TPU-native analogue of the reference's
``tools/build_rag_database.py``): embed captions, normalize, write the
VectorStore directory. Schema mirrors the reference's LanceModel
(``build_rag_database.py:35-45``): text, id, uid, dataset, video,
start_sec, end_sec (+ the embedding matrix held column-wise)."""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np
import pandas as pd

from motionrag_tpu.rag.embedders import TextEmbedder, get_embedder
from motionrag_tpu.rag.index import VectorStore

__all__ = ["build_database"]

META_COLUMNS = ["text", "id", "uid", "dataset", "video", "start_sec", "end_sec"]


def build_database(
    annotations: Sequence[dict] | pd.DataFrame,
    db_path: str | Path,
    table_name: str,
    text_key: str = "motion_caption",
    embedder: TextEmbedder | str = "gte",
    image_embedding_key: str | None = None,
    batch_size: int = 256,
    chunk_size: int = 100_000,
) -> VectorStore:
    """Build a vector store from annotation records.

    Rows missing ``text_key`` get empty text (embedded as such, matching the
    reference's ``''`` fallback in ``prepare_annotations``). Precomputed
    ``text_embedding`` fields are reused instead of re-encoding.
    """
    if isinstance(embedder, str):
        embedder = get_embedder(embedder)
    if isinstance(annotations, pd.DataFrame):
        annotations = annotations.to_dict("records")

    records = []
    for i, anno in enumerate(annotations):
        rec = {
            "text": anno.get(text_key) or "",
            "id": anno.get("id", i),
            "uid": anno.get("uid", str(i)),
            "dataset": anno.get("dataset", ""),
            "video": anno.get("video", ""),
            "start_sec": float(anno.get("start_sec", 0.0)),
            "end_sec": float(anno.get("end_sec", 0.0)),
        }
        records.append(rec)
    meta = pd.DataFrame.from_records(records, columns=META_COLUMNS)

    # embed in chunks (reference inserts in 100k-row chunks)
    embs = []
    for start in range(0, len(records), chunk_size):
        chunk = [a.get("text_embedding") for a in annotations[start : start + chunk_size]]
        texts = meta["text"].iloc[start : start + chunk_size].tolist()
        if all(e is not None for e in chunk) and chunk:
            embs.append(np.asarray(chunk, np.float32))
        else:
            embs.append(embedder.encode(texts, batch_size=batch_size))
    text_emb = np.concatenate(embs, axis=0) if embs else np.zeros((0, embedder.dim), np.float32)

    embeddings = {"text_embedding": text_emb}
    if image_embedding_key is not None:
        img = np.asarray([a[image_embedding_key] for a in annotations], np.float32)
        embeddings["image_embedding"] = img

    return VectorStore.create(Path(db_path) / table_name, meta, embeddings)
