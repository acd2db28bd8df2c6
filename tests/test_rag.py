"""RAG retrieval tests: exact top-k correctness vs brute force, where-clause
exclusion, API surface parity with the reference's RAGDatabase."""

import numpy as np
import pytest

from motionrag_tpu.rag.build import build_database
from motionrag_tpu.rag.database import RAGDatabase
from motionrag_tpu.rag.embedders import HashEmbedder
from motionrag_tpu.rag.index import DeviceIndex, VectorStore


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory):
    n, d = 500, 64
    annotations = [
        {
            "motion_caption": f"caption {i}",
            "video": f"video_{i % 50}.mp4",
            "uid": f"u{i}",
            "dataset": "synthetic",
            "start_sec": float(i),
            "end_sec": float(i + 2),
        }
        for i in range(n)
    ]
    path = tmp_path_factory.mktemp("ragdb")
    build_database(annotations, path, "motion_caption", embedder=HashEmbedder(dim=d))
    return path


def test_exact_topk_matches_bruteforce(store_dir):
    store = VectorStore(store_dir / "motion_caption")
    index = DeviceIndex(store, "text_embedding", chunk_rows=128)
    emb = np.asarray(store.load_embeddings("text_embedding"), np.float32)

    rng = np.random.default_rng(3)
    q = rng.standard_normal((4, emb.shape[1])).astype(np.float32)
    dist, idx = index.search(q, top_k=10)

    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    sims = qn @ emb.T  # emb is normalized at build time
    ref_idx = np.argsort(-sims, axis=1)[:, :10]
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(dist, 1.0 - np.take_along_axis(sims, ref_idx, 1), atol=2e-3)


def test_search_excludes_group(store_dir):
    store = VectorStore(store_dir / "motion_caption")
    index = DeviceIndex(store, "text_embedding", chunk_rows=256)
    emb = np.asarray(store.load_embeddings("text_embedding"), np.float32)
    # query with row 0's own embedding; exclude its video group
    _, idx = index.search(emb[0], top_k=20, exclude=["video_0.mp4"])
    videos = store.meta["video"].to_numpy()
    assert all(videos[i] != "video_0.mp4" for i in idx[0] if i >= 0)


def test_ragdatabase_text_search_api(store_dir):
    db = RAGDatabase(store_dir, "motion_caption", text_embedder=HashEmbedder(dim=64))
    # query by raw text: identical text must retrieve its own row first
    out = db.text_search("caption 123", top_k=3, select=["video", "start_sec", "end_sec"])
    assert isinstance(out, list) and len(out) == 3
    assert set(out[0]) == {"video", "start_sec", "end_sec", "_distance"}
    assert out[0]["start_sec"] == 123.0
    assert out[0]["_distance"] < 1e-3

    # where-exclusion of own video
    own_video = "video_23.mp4"  # 123 % 50 = 23
    out = db.text_search("caption 123", top_k=5, where=f'video != "{own_video}"')
    assert all(r["video"] != own_video for r in out)


def test_ragdatabase_generic_where(store_dir):
    db = RAGDatabase(store_dir, "motion_caption", text_embedder=HashEmbedder(dim=64))
    out = db.text_search("caption 7", top_k=5, where="start_sec < 100")
    assert all(r["start_sec"] < 100 for r in out)


def test_text_image_search_rerank(tmp_path):
    rng = np.random.default_rng(11)
    n, d = 100, 32
    text_emb = rng.standard_normal((n, d)).astype(np.float32)
    img_emb = rng.standard_normal((n, d)).astype(np.float32)
    annotations = [
        {
            "motion_caption": f"c{i}",
            "video": f"v{i}.mp4",
            "text_embedding": text_emb[i],
            "image_embedding": img_emb[i],
        }
        for i in range(n)
    ]
    build_database(
        annotations, tmp_path, "t", embedder=HashEmbedder(dim=d), image_embedding_key="image_embedding"
    )
    db = RAGDatabase(tmp_path, "t", text_embedder=HashEmbedder(dim=d))
    out = db.text_image_search(text_emb[5], img_emb[5], top_k=(20, 4))
    assert len(out) == 4
    assert out[0]["video"] == "v5.mp4"  # own row wins both stages
    # re-rank is by image similarity: distances ascending
    dists = [r["_distance"] for r in out]
    assert dists == sorted(dists)
