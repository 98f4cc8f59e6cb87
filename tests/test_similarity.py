"""Similarity-search operator tests: brute-force exactness, LSH/IVF
recall against the exact baseline, determinism."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fulltextsearch_ray.functions.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
)


@pytest.fixture(scope="module")
def vectors(ray_session):
    rng = np.random.default_rng(3)
    n, dim = 400, 32
    # clustered vectors so ANN variants have structure to find
    centers = rng.standard_normal((8, dim)) * 3
    mat = centers[np.arange(n) % 8] + rng.standard_normal((n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([r.astype(np.float32).tolist() for r in mat], pa.list_(pa.float32())),
        }
    )
    q_ids = np.arange(3, dtype=np.int64)
    q_mat = mat[:3].astype(np.float64)
    return ray.data.from_arrow(tbl), q_ids, q_mat, mat


def _exact_oracle(mat, q_mat, q_ids, k=10):
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    sims = q @ m.T
    out = {}
    for i, qid in enumerate(q_ids):
        row = sims[i].copy()
        row[qid] = -np.inf  # exclude self
        order = np.lexsort((np.arange(len(row)), -row))[:k]
        out[int(qid)] = list(order)
    return out


def test_brute_force_is_exact(vectors):
    ds, q_ids, q_mat, mat = vectors
    got = brute_force_topk(ds, q_ids, q_mat, k=10)
    oracle = _exact_oracle(mat, q_mat, q_ids)
    for qid in q_ids:
        mine = [n for q, n in zip(got["query_id"].to_pylist(), got["neighbor_id"].to_pylist()) if q == qid]
        assert mine == oracle[int(qid)]


def test_ivf_recall(vectors):
    ds, q_ids, q_mat, mat = vectors
    got = ivf_topk(ds, q_ids, q_mat, k=10, n_clusters=8, nprobe=3)
    oracle = _exact_oracle(mat, q_mat, q_ids)
    hits = total = 0
    for qid in q_ids:
        mine = {n for q, n in zip(got["query_id"].to_pylist(), got["neighbor_id"].to_pylist()) if q == qid}
        hits += len(mine & set(oracle[int(qid)]))
        total += 10
    assert hits / total >= 0.7  # approximate, but must find most of top-10


def test_lsh_returns_ranked_rows(vectors):
    ds, q_ids, q_mat, _ = vectors
    got = lsh_bucketed_topk(ds, q_ids, q_mat, k=10, bits=4)
    assert got.num_rows > 0
    assert set(got.column_names) == {"query_id", "rank", "neighbor_id", "cosine"}


def test_ivf_deterministic(vectors):
    ds, q_ids, q_mat, _ = vectors
    a = ivf_topk(ds, q_ids, q_mat, k=5, n_clusters=8, nprobe=2)
    b = ivf_topk(ds, q_ids, q_mat, k=5, n_clusters=8, nprobe=2)
    assert a.equals(b)


def test_project_embeddings_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fulltextsearch_ray.functions.common import round6
    from fulltextsearch_ray.functions.similarity import (
        lsh_hyperplanes,
        project_embeddings,
    )

    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(20), pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in vecs])})
    )
    rows = project_embeddings(ds, out_dim=4, seed=7).take_all()
    got = {}
    for r in rows:
        got.setdefault(r["vec_id"], {})[r["p"]] = r["val"]
    planes = lsh_hyperplanes(8, bits=4, seed=7)
    want = round6(vecs.astype(np.float64) @ planes.T)
    for i in range(20):
        assert [got[i][p] for p in range(4)] == list(want[i])
