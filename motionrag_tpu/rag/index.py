"""HBM-resident exact vector search: GEMM + on-device top-k.

TPU-native replacement for the reference's LanceDB/IVF approximate index
(reference ``src/data/rag.py``, ``tools/build_rag_database.py:49-52``:
IVF index, dot metric, nprobes=50, refine_factor=30). At OpenVid-1M scale the
embedding matrix (1M x 768 bf16 ~ 1.5 GB) fits in HBM, so we run *exact*
search — a [B, D] x [D, N] matmul on the MXU with streaming N-chunks and a
running top-k merge — which strictly dominates the reference's recall and
runs in milliseconds (SURVEY.md §2.10, §7 "RAG recall parity").

Storage layout (``VectorStore``): a directory per table with
  manifest.json           {"columns": {name: {"dim": D}}, "metric": "cosine", "rows": N}
  meta.parquet            metadata rows (text, id, uid, dataset, video, start/end_sec)
  <column>.npy            [N, D] float16 embeddings (normalized)

Distance convention: ``1 - cosine_similarity`` (embeddings are L2-normalized
at build time, so ranking is identical to the reference's dot metric; the
ref-video read-failure sentinel distance 1.0 from reference
``dataset.py:306-310`` keeps its "zero weight" meaning under
``condition_fusion``'s (1-d) weighting).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

__all__ = ["VectorStore", "DeviceIndex"]


class VectorStore:
    """On-disk table: metadata parquet + per-column embedding matrices."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        manifest_path = self.path / "manifest.json"
        if not manifest_path.exists():
            raise FileNotFoundError(f"no vector store at {self.path}")
        self.manifest = json.loads(manifest_path.read_text())
        self.meta = pd.read_parquet(self.path / "meta.parquet")

    @property
    def num_rows(self) -> int:
        return int(self.manifest["rows"])

    @property
    def columns(self) -> list[str]:
        return list(self.manifest["columns"])

    def load_embeddings(self, column: str) -> np.ndarray:
        if column not in self.manifest["columns"]:
            raise KeyError(f"no vector column {column!r}; have {self.columns}")
        return np.load(self.path / f"{column}.npy", mmap_mode="r")

    @staticmethod
    def create(
        path: str | Path,
        meta: pd.DataFrame,
        embeddings: dict[str, np.ndarray],
        metric: str = "cosine",
    ) -> "VectorStore":
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        rows = len(meta)
        columns = {}
        for name, emb in embeddings.items():
            emb = np.asarray(emb, dtype=np.float32)
            assert emb.shape[0] == rows, f"{name}: {emb.shape[0]} rows != meta {rows}"
            norm = np.linalg.norm(emb, axis=-1, keepdims=True)
            emb = emb / np.maximum(norm, 1e-8)
            np.save(path / f"{name}.npy", emb.astype(np.float16))
            columns[name] = {"dim": int(emb.shape[1])}
        meta.reset_index(drop=True).to_parquet(path / "meta.parquet")
        (path / "manifest.json").write_text(
            json.dumps({"columns": columns, "metric": metric, "rows": rows})
        )
        return VectorStore(path)


def _pad_rows(x: np.ndarray, multiple: int) -> np.ndarray:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x


@functools.partial(jax.jit, static_argnames=("top_k",))
def _chunked_topk(q, emb_chunks, row_ids_chunks, exclude_ids, top_k):
    """Streaming exact top-k.

    q:                [B, D]   queries (normalized)
    emb_chunks:       [C, chunk, D]
    row_ids_chunks:   [C, chunk] int32 "group id" per row (e.g. video id);
                      -1 marks padding rows.
    exclude_ids:      [B] int32 group id to exclude per query (-2 = none).
    Returns (scores [B, top_k], indices [B, top_k]) sorted desc by cosine sim.
    """
    b = q.shape[0]
    chunk = emb_chunks.shape[1]
    init = (
        jnp.full((b, top_k), -jnp.inf, jnp.float32),
        jnp.full((b, top_k), -1, jnp.int32),
    )

    def step(carry, inputs):
        best_s, best_i = carry
        emb, row_ids, chunk_idx = inputs
        s = jnp.einsum(
            "bd,nd->bn", q, emb.astype(q.dtype), preferred_element_type=jnp.float32
        )
        valid = row_ids >= 0
        excluded = row_ids[None, :] == exclude_ids[:, None]
        s = jnp.where(valid[None, :] & ~excluded, s, -jnp.inf)
        loc_s, loc_i = jax.lax.top_k(s, min(top_k, chunk))
        loc_i = loc_i + chunk_idx * chunk
        merged_s = jnp.concatenate([best_s, loc_s], axis=1)
        merged_i = jnp.concatenate([best_i, loc_i], axis=1)
        sel_s, sel = jax.lax.top_k(merged_s, top_k)
        sel_i = jnp.take_along_axis(merged_i, sel, axis=1)
        return (sel_s, sel_i), None

    n_chunks = emb_chunks.shape[0]
    (best_s, best_i), _ = jax.lax.scan(
        step, init, (emb_chunks, row_ids_chunks, jnp.arange(n_chunks))
    )
    return best_s, best_i


class DeviceIndex:
    """Device-resident exact search over one vector column.

    ``group_column`` names the metadata column used for cheap exclusion
    filters (the reference's ``where: video != "x"`` pattern,
    ``datamodule.py:235``); its values are interned to int32 ids once.
    """

    def __init__(
        self,
        store: VectorStore,
        column: str,
        group_column: str = "video",
        chunk_rows: int = 131072,
        device: jax.Device | None = None,
    ):
        self.store = store
        self.column = column
        emb = np.asarray(store.load_embeddings(column), dtype=np.float16)
        self.num_rows, self.dim = emb.shape
        chunk_rows = min(chunk_rows, max(256, 1 << (self.num_rows - 1).bit_length()))
        self.chunk_rows = chunk_rows

        groups = store.meta[group_column].astype(str).to_numpy()
        uniq, inv = np.unique(groups, return_inverse=True)
        self._group_of = {g: i for i, g in enumerate(uniq)}
        row_ids = inv.astype(np.int32)

        emb_p = _pad_rows(emb, chunk_rows)
        ids_p = _pad_rows(row_ids, chunk_rows)
        ids_p[self.num_rows:] = -1
        n_chunks = emb_p.shape[0] // chunk_rows
        put = lambda x: jax.device_put(x, device) if device else jnp.asarray(x)
        self.emb_chunks = put(emb_p.reshape(n_chunks, chunk_rows, self.dim))
        self.row_ids_chunks = put(ids_p.reshape(n_chunks, chunk_rows))

    def group_id(self, value: str | None) -> int:
        if value is None:
            return -2
        return self._group_of.get(str(value), -2)

    def search(
        self,
        queries: np.ndarray,
        top_k: int,
        exclude: list[str | None] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k for a batch of queries.

        queries: [B, D] (will be L2-normalized). exclude: per-query group
        value (e.g. video path) whose rows are filtered out.
        Returns (distances [B, k] = 1 - cos_sim, row indices [B, k]).
        """
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None]
        q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
        if exclude is None:
            ex = np.full((q.shape[0],), -2, np.int32)
        else:
            ex = np.asarray([self.group_id(e) for e in exclude], np.int32)
        scores, idx = _chunked_topk(
            jnp.asarray(q, jnp.float32),
            self.emb_chunks,
            self.row_ids_chunks,
            jnp.asarray(ex),
            top_k,
        )
        return 1.0 - np.asarray(scores), np.asarray(idx)
