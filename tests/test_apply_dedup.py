"""Dedup APPLY (canonical-only filter) and benchmark contamination."""

import pyarrow as pa
import ray.data

from fulltextsearch_ray.functions.cleaning import contamination_check
from fulltextsearch_ray.functions.components import canonical_docs


def _docs(n):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(1, n + 1), pa.int64()),
                "text": pa.array([f"body of document {i}" for i in range(1, n + 1)], pa.string()),
            }
        )
    )


def _pairs(ps):
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in ps], pa.int64()),
                "b": pa.array([p[1] for p in ps], pa.int64()),
            }
        )
    )


def test_canonical_docs_broadcast_path(ray_session):
    kept = canonical_docs(_docs(6), _pairs([(1, 2), (2, 3), (5, 6)])).take_all()
    assert sorted(r["doc_id"] for r in kept) == [1, 4, 5]
    assert all(r["text"].startswith("body of") for r in kept)  # payload survives


def test_canonical_docs_distributed_path_matches(ray_session):
    kept = canonical_docs(
        _docs(6), _pairs([(1, 2), (2, 3), (5, 6)]), broadcast_budget=0
    ).take_all()
    assert sorted(r["doc_id"] for r in kept) == [1, 4, 5]


def test_canonical_docs_no_pairs_keeps_all(ray_session):
    kept = canonical_docs(_docs(4), _pairs([])).take_all()
    assert sorted(r["doc_id"] for r in kept) == [1, 2, 3, 4]


def test_contamination_scores(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "the quick brown fox jumps high",  # fully in bench
                        "the quick brown cat sits low",  # partial overlap
                        "completely unrelated words here now",  # none
                    ],
                    pa.string(),
                ),
            }
        )
    )
    out = {
        r["doc_id"]: (r["contamination"], r["n_shingles"])
        for r in contamination_check(docs, ["the quick brown fox jumps high"]).take_all()
    }
    assert out[1] == (1.0, 4)
    # doc2 shares only the shingle "the quick brown" → 1 of 4
    assert out[2] == (0.25, 4)
    assert out[3] == (0.0, 3)  # 5 words → 3 trigram shingles
