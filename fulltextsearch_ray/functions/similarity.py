"""Similarity search over embedding columns (``list<float>``).

* ``brute_force_topk`` — the exact baseline: normalized numpy matmul
  per batch against a BROADCAST query matrix (``ray.put`` once, read
  inside every batch — never re-shipped per batch), per-batch top-k,
  then an exact global top-k merge of the tiny per-batch candidate
  union (each global top-k member is in its batch's top-k).
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH
  buckets (seeded, deterministic); queries probe only their bucket (+
  multiprobe neighbors), trading recall for a ~2^bits search-space cut.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .common import round6


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _to_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.values.to_numpy(zero_copy_only=False), dtype=np.float64)
    offsets = np.asarray(col.offsets.to_numpy(zero_copy_only=False))
    dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    return flat.reshape(-1, dim)


class BruteForceScorer:
    """Actor-pool batch stage: score batch vectors against the broadcast
    query matrix, emit per-batch top-k candidate rows per query."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref)  # once per actor
        self.q_ids: np.ndarray = q["ids"]
        self.q_mat: np.ndarray = _normalize(q["mat"])
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        mat = _normalize(_to_matrix(batch, self.vec_col))
        sims = self.q_mat @ mat.T  # (n_queries, n_batch)
        k = min(self.k, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            if len(row) > k:
                cand = np.argpartition(-row, k - 1)[:k]
            else:
                cand = np.arange(len(row))
            out_q.extend([int(self.q_ids[qi])] * len(cand))
            out_n.extend(ids[cand].tolist())
            out_s.extend(row[cand].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def brute_force_topk(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    concurrency: int | None = None,
) -> pa.Table:
    """Exact cosine top-k per query over the dataset (small result)."""
    queries_ref = ray.put({"ids": np.asarray(query_ids, dtype=np.int64), "mat": np.asarray(query_mat, dtype=np.float64)})
    cand = ds.map_batches(
        BruteForceScorer,
        fn_constructor_args=(queries_ref, k + (1 if exclude_self else 0), id_col, vec_col),
        batch_format="pyarrow",
        concurrency=concurrency or 4,
        batch_size=1024,
    ).take_all()
    # exact global top-k from per-batch candidates (driver-side, tiny)
    qs = np.array([r["query_id"] for r in cand], dtype=np.int64)
    ns = np.array([r["neighbor_id"] for r in cand], dtype=np.int64)
    ss = np.array([r["cosine"] for r in cand], dtype=np.float64)
    if exclude_self:
        keep = qs != ns
        qs, ns, ss = qs[keep], ns[keep], ss[keep]
    out_q, out_r, out_n, out_s = [], [], [], []
    for q in np.unique(qs):
        m = qs == q
        order = np.lexsort((ns[m], -ss[m]))[:k]
        out_q.extend([int(q)] * len(order))
        out_r.extend(range(1, len(order) + 1))
        out_n.extend(ns[m][order].tolist())
        out_s.extend(round6(ss[m][order]).tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        }
    )


def ivf_centroids(
    ds: ray.data.Dataset,
    *,
    n_clusters: int = 16,
    iters: int = 3,
    seed: int = 5,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: seeded k-means on normalized
    vectors.  Partial sums per batch (map_batches) → driver combine —
    each iteration is one streaming pass, no full materialization."""
    first = ds.take_batch(1024, batch_format="pyarrow")
    mat0 = _normalize(_to_matrix(first, vec_col))
    rng = np.random.default_rng(seed)
    centroids = mat0[rng.choice(len(mat0), size=min(n_clusters, len(mat0)), replace=False)]

    for _ in range(iters):
        c_ref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            m = _normalize(_to_matrix(batch, vec_col))
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=len(c))
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c)), pa.int32()),
                    "count": pa.array(counts, pa.int64()),
                    "sum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids))
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["sum"])
            counts[r["cluster"]] += r["count"]
        nonzero = counts > 0
        centroids[nonzero] = _normalize(sums[nonzero] / counts[nonzero, None])
    return centroids


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF approximate top-k: score only vectors in each query's
    ``nprobe`` nearest coarse clusters.  At cluster scale the cluster
    id is the partition key (co-locate once, probe per query)."""
    cents = ivf_centroids(ds, n_clusters=n_clusters, vec_col=vec_col)
    q_mat = _normalize(np.asarray(query_mat, dtype=np.float64))
    q_probes = np.argsort(-(q_mat @ cents.T), axis=1)[:, :nprobe]
    c_ref = ray.put(cents)
    wanted = np.unique(q_probes)
    wanted_ref = ray.put(wanted)

    def tag_and_filter(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        want = ray.get(wanted_ref)
        m = _normalize(_to_matrix(batch, vec_col))
        assign = np.argmax(m @ c.T, axis=1).astype(np.int32)
        mask = np.isin(assign, want)
        out = batch.filter(pa.array(mask))
        return out.append_column("_cluster", pa.array(assign[mask], pa.int32()))

    tbl = pa.concat_tables(
        ray.get(ds.map_batches(tag_and_filter, batch_format="pyarrow").to_arrow_refs()),
        promote_options="default",
    )
    ids = np.asarray(tbl[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    mat = _normalize(_to_matrix(tbl, vec_col))
    clusters = np.asarray(tbl["_cluster"].to_numpy(zero_copy_only=False))
    out_q, out_r, out_n, out_s = [], [], [], []
    for qi in range(len(q_mat)):
        m = np.isin(clusters, q_probes[qi])
        if not m.any():
            continue
        sims = mat[m] @ q_mat[qi]
        cand = ids[m]
        keep = cand != int(query_ids[qi])
        sims, cand = sims[keep], cand[keep]
        order = np.lexsort((cand, -sims))[:k]
        out_q.extend([int(query_ids[qi])] * len(order))
        out_r.extend(range(1, len(order) + 1))
        out_n.extend(cand[order].tolist())
        out_s.extend(round6(sims[order]).tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        }
    )


def lsh_hyperplanes(dim: int, bits: int = 8, seed: int = 13) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_bucket(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket id per row (uint64)."""
    signs = (mat @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.uint64))
    return (signs.astype(np.uint64) * weights[None, :]).sum(axis=1)


def lsh_bucketed_topk(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k: only vectors sharing the query's LSH bucket
    are scored.  The bucket column would be the partition key at scale
    (co-locate bucket → one shuffle, then per-bucket brute force)."""
    q_mat = _normalize(np.asarray(query_mat, dtype=np.float64))
    planes = lsh_hyperplanes(q_mat.shape[1], bits=bits)
    q_buckets = lsh_bucket(q_mat, planes)
    wanted = set(q_buckets.tolist())
    planes_ref = ray.put(planes)
    wanted_ref = ray.put(wanted)

    def filter_buckets(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        want = ray.get(wanted_ref)
        mat = _normalize(_to_matrix(batch, vec_col))
        buckets = lsh_bucket(mat, pl)
        mask = np.isin(buckets, np.fromiter(want, dtype=np.uint64))
        out = batch.filter(pa.array(mask))
        return out.append_column("_bucket", pa.array(buckets[mask], pa.uint64()))

    filtered = ds.map_batches(filter_buckets, batch_format="pyarrow")
    tbl = pa.concat_tables(ray.get(filtered.to_arrow_refs()), promote_options="default")
    ids = np.asarray(tbl[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    mat = _normalize(_to_matrix(tbl, vec_col))
    buckets = np.asarray(tbl["_bucket"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    out_q, out_r, out_n, out_s = [], [], [], []
    for qi in range(len(q_mat)):
        m = buckets == q_buckets[qi]
        if not m.any():
            continue
        sims = mat[m] @ q_mat[qi]
        cand_ids = ids[m]
        keep = cand_ids != int(query_ids[qi])
        sims, cand_ids = sims[keep], cand_ids[keep]
        order = np.lexsort((cand_ids, -sims))[:k]
        out_q.extend([int(query_ids[qi])] * len(order))
        out_r.extend(range(1, len(order) + 1))
        out_n.extend(cand_ids[order].tolist())
        out_s.extend(round6(sims[order]).tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        }
    )
