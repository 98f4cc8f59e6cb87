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


def round12(x: np.ndarray) -> np.ndarray:
    """floor(x*1e12 + 0.5)/1e12 — the centroid quantization shared with
    the SQL oracle so float summation-order differences between numpy
    and DuckDB cannot flip a k-means assignment."""
    return np.floor(x * 1e12 + 0.5) / 1e12


def ivf_centroids(
    ds: ray.data.Dataset,
    *,
    n_clusters: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: k-means on normalized
    vectors, seeded with the ``n_clusters`` lowest-id vectors (fully
    deterministic AND SQL-expressible — the oracle unrolls the same
    iterations).  Partial sums per batch (map_batches) → driver combine
    — each iteration is one streaming pass, no full materialization.
    Centroids are quantized to 12 decimals each round (see round12)."""
    first = ds.take_batch(1024, batch_format="pyarrow")
    ids0 = np.asarray(first[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    mat0 = _normalize(_to_matrix(first, vec_col))
    seed_order = np.argsort(ids0, kind="stable")[: min(n_clusters, len(ids0))]
    centroids = round12(mat0[seed_order])

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
        centroids[nonzero] = round12(_normalize(sums[nonzero] / counts[nonzero, None]))
    return centroids


def _final_topk(
    cand_tbl: pa.Table, query_ids: np.ndarray, k: int
) -> pa.Table:
    """Exact per-query top-k merge over a small candidate table
    (query_id, neighbor_id, cosine) — each group stage emits at most k
    rows per (query, group), so this input is k-bounded, never
    dataset-sized.  Dedup across groups keeps the max (identical)
    cosine; tie-break (cosine desc, neighbor asc)."""
    qs = np.asarray(cand_tbl["query_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ns = np.asarray(cand_tbl["neighbor_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ss = np.asarray(cand_tbl["cosine"].to_numpy(zero_copy_only=False), dtype=np.float64)
    out_q, out_r, out_n, out_s = [], [], [], []
    for q in np.unique(qs):
        m = qs == q
        n_m, s_m = ns[m], ss[m]
        # dedup duplicate (query, neighbor) rows from multiple groups
        uniq, first = np.unique(n_m, return_index=True)
        n_m, s_m = uniq, s_m[first]
        order = np.lexsort((n_m, -s_m))[:k]
        out_q.extend([int(q)] * len(order))
        out_r.extend(range(1, len(order) + 1))
        out_n.extend(n_m[order].tolist())
        out_s.extend(round6(s_m[order]).tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        }
    )


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """IVF approximate top-k: score only vectors in each query's
    ``nprobe`` nearest coarse clusters.

    Probe phase is fully distributed: vectors are tagged with their
    cluster, filtered to probed clusters, then scored per cluster in
    ``groupby("_cluster").map_groups`` against the (broadcast) queries
    probing that cluster — each group emits at most k rows per query,
    so the driver merge sees a k-bounded table, never the vector set.
    At cluster scale ``_cluster`` is the partition key (co-locate
    once, probe per query)."""
    cents = ivf_centroids(ds, n_clusters=n_clusters, iters=iters, id_col=id_col, vec_col=vec_col)
    q_mat = _normalize(np.asarray(query_mat, dtype=np.float64))
    # stable sort: tied centroid scores break toward the lower cluster
    # id (deterministic; mirrored by the SQL oracle's ORDER BY)
    q_probes = np.argsort(-(q_mat @ cents.T), axis=1, kind="stable")[:, :nprobe]
    q_ids = np.asarray(query_ids, dtype=np.int64)
    c_ref = ray.put(cents)
    wanted = np.unique(q_probes)
    wanted_ref = ray.put(wanted)
    queries_ref = ray.put({"ids": q_ids, "mat": q_mat, "probes": q_probes})

    def tag_and_filter(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        want = ray.get(wanted_ref)
        m = _normalize(_to_matrix(batch, vec_col))
        assign = np.argmax(m @ c.T, axis=1).astype(np.int32)
        mask = np.isin(assign, want)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "_cluster": pa.array(assign[mask], pa.int32()),
                "vid": pa.array(ids[mask], pa.int64()),
                "vec": pa.array(m[mask].tolist(), pa.list_(pa.float64())),
            }
        )

    empty = pa.table(
        {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )

    def score_cluster(group: pa.Table) -> pa.Table:
        q = ray.get(queries_ref)
        cluster = int(group["_cluster"][0].as_py())
        q_sel = np.flatnonzero((q["probes"] == cluster).any(axis=1))
        if not len(q_sel):
            return empty
        ids = np.asarray(group["vid"].to_numpy(zero_copy_only=False), dtype=np.int64)
        mat = _to_matrix(group, "vec")
        sims = q["mat"][q_sel] @ mat.T  # (n_sel, g)
        out_q, out_n, out_s = [], [], []
        for row, qi in enumerate(q_sel):
            s = sims[row]
            keep = ids != int(q["ids"][qi])
            s, cand = s[keep], ids[keep]
            order = np.lexsort((cand, -s))[:k]
            out_q.extend([int(q["ids"][qi])] * len(order))
            out_n.extend(cand[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    cand = (
        ds.map_batches(tag_and_filter, batch_format="pyarrow")
        .groupby("_cluster")
        .map_groups(score_cluster, batch_format="pyarrow")
        .take_all()
    )
    cand_tbl = pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in cand], pa.int64()),
            "neighbor_id": pa.array([r["neighbor_id"] for r in cand], pa.int64()),
            "cosine": pa.array([r["cosine"] for r in cand], pa.float64()),
        }
    )
    return _final_topk(cand_tbl, q_ids, k)


def project_embeddings(
    ds: ray.data.Dataset,
    *,
    out_dim: int = 16,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Johnson-Lindenstrauss random projection — the standard
    dimensionality-reduction step ahead of ANN indexing (Achlioptas
    2003 / JL lemma; public results).  The seeded Gaussian projection
    matrix is derived INSIDE each task from (vector width, out_dim,
    seed) — deterministic everywhere, nothing broadcast or re-shipped.
    Emits one row per (vector, output dimension): ``(id, p, val)``
    with values rounded to 1e-6 for oracle-exact comparison."""
    from .common import round6

    def proj(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch, vec_col).astype(np.float64)
        planes = lsh_hyperplanes(mat.shape[1], bits=out_dim, seed=seed)
        out = round6(mat @ planes.T)  # (rows, out_dim)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        n = len(ids)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, out_dim)),
                "p": pa.array(np.tile(np.arange(out_dim, dtype=np.int64), n)),
                "val": pa.array(out.ravel(), pa.float64()),
            }
        )

    return ds.map_batches(proj, batch_format="pyarrow")


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
    are scored — per bucket in ``groupby("_bucket").map_groups`` with
    the query matrix broadcast (``ray.put`` once), each group emitting
    at most k rows per query.  The bucket column is the partition key
    at scale (co-locate bucket → one shuffle, then per-bucket brute
    force); nothing dataset-sized ever reaches the driver."""
    q_mat = _normalize(np.asarray(query_mat, dtype=np.float64))
    q_ids = np.asarray(query_ids, dtype=np.int64)
    planes = lsh_hyperplanes(q_mat.shape[1], bits=bits)
    q_buckets = lsh_bucket(q_mat, planes)
    wanted = np.unique(q_buckets)
    planes_ref = ray.put(planes)
    wanted_ref = ray.put(wanted)
    queries_ref = ray.put({"ids": q_ids, "mat": q_mat, "buckets": q_buckets})

    def filter_buckets(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        want = ray.get(wanted_ref)
        mat = _normalize(_to_matrix(batch, vec_col))
        buckets = lsh_bucket(mat, pl)
        mask = np.isin(buckets, want)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "_bucket": pa.array(buckets[mask], pa.uint64()),
                "vid": pa.array(ids[mask], pa.int64()),
                "vec": pa.array(mat[mask].tolist(), pa.list_(pa.float64())),
            }
        )

    empty = pa.table(
        {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )

    def score_bucket(group: pa.Table) -> pa.Table:
        q = ray.get(queries_ref)
        bucket = np.uint64(group["_bucket"][0].as_py())
        q_sel = np.flatnonzero(q["buckets"] == bucket)
        if not len(q_sel):
            return empty
        ids = np.asarray(group["vid"].to_numpy(zero_copy_only=False), dtype=np.int64)
        mat = _to_matrix(group, "vec")
        sims = q["mat"][q_sel] @ mat.T
        out_q, out_n, out_s = [], [], []
        for row, qi in enumerate(q_sel):
            s = sims[row]
            keep = ids != int(q["ids"][qi])
            s, cand = s[keep], ids[keep]
            order = np.lexsort((cand, -s))[:k]
            out_q.extend([int(q["ids"][qi])] * len(order))
            out_n.extend(cand[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    cand = (
        ds.map_batches(filter_buckets, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(score_bucket, batch_format="pyarrow")
        .take_all()
    )
    cand_tbl = pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in cand], pa.int64()),
            "neighbor_id": pa.array([r["neighbor_id"] for r in cand], pa.int64()),
            "cosine": pa.array([r["cosine"] for r in cand], pa.float64()),
        }
    )
    return _final_topk(cand_tbl, q_ids, k)
