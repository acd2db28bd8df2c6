#!/usr/bin/env python
"""Build the retrieval database from an annotations file.

Usage:
    python tools/build_rag_database.py \
        --annotation data/openvid_1m.parquet \
        --db_path data/rag_db --table_name motion_caption \
        [--text_key motion_caption] [--embedder gte|jax-gte|hash]

TPU-native counterpart of the reference's ``tools/build_rag_database.py``:
instead of a LanceDB IVF index we persist normalized embeddings + metadata
for the exact on-device GEMM/top-k index (motionrag_tpu.rag.index).
"""

import argparse
from pathlib import Path


def load_annotations(path: str):
    p = Path(path)
    if p.suffix == ".parquet":
        import pandas as pd

        return pd.read_parquet(p).to_dict("records")
    if p.suffix == ".pt":
        import torch

        return torch.load(p, map_location="cpu", weights_only=False)
    if p.suffix == ".json":
        import json

        return json.loads(p.read_text())
    raise ValueError(f"unsupported annotation format: {p.suffix}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotation", required=True, nargs="+")
    ap.add_argument("--db_path", required=True)
    ap.add_argument("--table_name", default="motion_caption")
    ap.add_argument("--text_key", default="motion_caption")
    ap.add_argument("--embedder", default="gte",
                help="gte (host torch) | jax-gte[:/weights.pt[:/tokenizer]] (on-device JAX GTE) | hash | hash-<dim>")
    ap.add_argument("--image_embedding_key", default=None)
    args = ap.parse_args()

    from motionrag_tpu.rag.build import build_database

    annotations = []
    for path in args.annotation:
        annotations.extend(load_annotations(path))
    print(f"loaded {len(annotations)} annotations")

    store = build_database(
        annotations,
        db_path=args.db_path,
        table_name=args.table_name,
        text_key=args.text_key,
        embedder=args.embedder,
        image_embedding_key=args.image_embedding_key,
    )
    print(f"built {store.path} with {store.num_rows} rows, columns {store.columns}")


if __name__ == "__main__":
    main()
