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


def _lowest_id_vectors(
    ds: ray.data.Dataset, n: int, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """(ids, matrix) of the GLOBALLY ``n`` lowest-id vectors: each batch
    emits its local n lowest (k-bounded), the driver merges the tiny
    partials — correct for any row order, no full materialization."""

    def local_min(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        if len(ids) > n:
            part = np.argpartition(ids, n - 1)[:n]
            sel = part[np.argsort(ids[part], kind="stable")]
        else:
            sel = np.argsort(ids, kind="stable")
        col = batch[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({id_col: pa.array(ids[sel]), vec_col: col.take(pa.array(sel))})

    parts = pa.concat_tables(
        ray.get(ds.map_batches(local_min, batch_format="pyarrow").to_arrow_refs())
    )
    ids = np.asarray(parts[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    order = np.argsort(ids, kind="stable")[: min(n, len(ids))]
    return ids[order], _to_matrix(parts, vec_col)[order]


def ivf_centroids(
    ds: ray.data.Dataset,
    *,
    n_clusters: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: k-means on normalized
    vectors, seeded with the GLOBALLY ``n_clusters`` lowest-id vectors
    (fully deterministic for any input row order AND SQL-expressible —
    the oracle unrolls the same iterations).  Partial sums per batch
    (map_batches) → driver combine — each iteration is one streaming
    pass, no full materialization.  Centroids are quantized to 12
    decimals each round (see round12)."""
    _seed_ids, seed_mat = _lowest_id_vectors(ds, n_clusters, id_col, vec_col)
    centroids = round12(_normalize(seed_mat))

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


_EMPTY_CAND = pa.table(
    {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
     "cosine": pa.array([], pa.float64())}
)


def _score_allowed(
    q: dict, ids: np.ndarray, mat: np.ndarray, allowed: np.ndarray, k: int
) -> pa.Table:
    """Per-batch candidate emit: score the batch against every query,
    mask to each query's allowed members (and self), keep the batch-
    local top-k per query.  Per-task memory is bounded by the BATCH,
    never by a cluster or bucket — ``allowed`` is (n_queries, n_batch)
    and the emit is ≤ k rows per query per batch."""
    allowed = allowed & (ids[None, :] != q["ids"][:, None])
    live = np.flatnonzero(allowed.any(axis=1))
    if not len(live):
        return _EMPTY_CAND
    sims = q["mat"][live] @ mat.T  # (n_live, n_batch)
    sims = np.where(allowed[live], sims, -np.inf)
    out_q, out_n, out_s = [], [], []
    for row, qi in enumerate(live):
        s = sims[row]
        cand = np.flatnonzero(np.isfinite(s))
        if len(cand) > k:
            # deterministic batch-local top-k: (cosine desc, neighbor
            # asc) — the same tie-break as _final_topk and the SQL
            # oracle, so ties at the k-boundary never depend on batch
            # composition or argpartition's arbitrary pick
            cand = cand[np.lexsort((ids[cand], -s[cand]))[:k]]
        out_q.extend([int(q["ids"][qi])] * len(cand))
        out_n.extend(ids[cand].tolist())
        out_s.extend(s[cand].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        }
    )


def _collect_candidates(cand_ds: ray.data.Dataset) -> pa.Table:
    tbls = ray.get(cand_ds.to_arrow_refs())
    tbls = [t for t in tbls if t.num_rows]
    return pa.concat_tables(tbls) if tbls else _EMPTY_CAND


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

    Probe phase is one streaming ``map_batches`` pass — each batch
    assigns its vectors to clusters, masks per query to its probed
    clusters, scores, and emits a batch-local top-k (≤ k rows per
    query per batch).  No shuffle and no per-cluster task: per-task
    memory is bounded by the batch size even when one cluster holds
    the whole dataset.  The driver merge sees a k-bounded candidate
    table, never the vector set."""
    cents = ivf_centroids(ds, n_clusters=n_clusters, iters=iters, id_col=id_col, vec_col=vec_col)
    q_mat = _normalize(np.asarray(query_mat, dtype=np.float64))
    # stable sort: tied centroid scores break toward the lower cluster
    # id (deterministic; mirrored by the SQL oracle's ORDER BY)
    q_probes = np.argsort(-(q_mat @ cents.T), axis=1, kind="stable")[:, :nprobe]
    q_ids = np.asarray(query_ids, dtype=np.int64)
    member = np.zeros((len(q_ids), len(cents)), dtype=bool)
    member[np.arange(len(q_ids))[:, None], q_probes] = True
    c_ref = ray.put(cents)
    queries_ref = ray.put({"ids": q_ids, "mat": q_mat, "member": member})

    def score_batch(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        q = ray.get(queries_ref)
        m = _normalize(_to_matrix(batch, vec_col))
        assign = np.argmax(m @ c.T, axis=1)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        return _score_allowed(q, ids, m, q["member"][:, assign], k)

    cand_tbl = _collect_candidates(
        ds.map_batches(score_batch, batch_format="pyarrow", batch_size=1024)
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


# --------------------------------------------------------------------------
# persisted IVF index artifact
# --------------------------------------------------------------------------


def build_ann_index(
    ds: ray.data.Dataset,
    index_dir: str,
    *,
    n_clusters: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    overwrite: bool = True,
) -> dict:
    """Persist an IVF index so repeated ANN queries skip re-clustering —
    mirrors the engine's segment/catalog model (train once, serve many).

    Layout (all Parquet, resumable / partition-pruned at read):
      ``centroids.parquet``      — (cluster, w) final quantized centroids
      ``vectors/cluster=K/…``    — normalized vectors hash-partitioned
                                   by their assigned coarse cluster
      ``meta.json``              — n_clusters, iters, dim, column names

    The cluster directories are the probe unit: a query reads ONLY its
    ``nprobe`` probed cluster partitions (file-level pruning), then
    scores per batch — per-task memory stays batch-bounded."""
    import json
    import os
    import shutil

    if overwrite and os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    cents = ivf_centroids(ds, n_clusters=n_clusters, iters=iters, id_col=id_col, vec_col=vec_col)
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "cluster": pa.array(np.arange(len(cents), dtype=np.int32)),
                "w": pa.array(cents.tolist(), pa.list_(pa.float64())),
            }
        ),
        os.path.join(index_dir, "centroids.parquet"),
    )
    c_ref = ray.put(cents)

    def assign_batch(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _normalize(_to_matrix(batch, vec_col))
        assign = np.argmax(m @ c.T, axis=1)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        # ``cluster`` becomes the hive partition directory (stripped
        # from the files); ``cluster_id`` stays IN the files so readers
        # of leaf dirs get the assignment without re-deriving it
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(assign.astype(np.int32)),
                "cluster_id": pa.array(assign.astype(np.int32)),
                "vec": pa.array(m.tolist(), pa.list_(pa.float64())),
            }
        )

    ds.map_batches(assign_batch, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "vectors"), partition_cols=["cluster"]
    )
    meta = {
        "n_clusters": int(len(cents)),
        "iters": int(iters),
        "dim": int(cents.shape[1]),
        "id_col": id_col,
        "vec_col": vec_col,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _cluster_files(index_dir: str, clusters) -> list[str]:
    """Parquet files of the given cluster partitions (file-level
    pruning: unprobed clusters never leave storage)."""
    import glob
    import os

    files: list[str] = []
    for c in clusters:
        files.extend(
            sorted(glob.glob(os.path.join(index_dir, "vectors", f"cluster={int(c)}", "*.parquet")))
        )
    return files


def read_ann_assignments(index_dir: str) -> ray.data.Dataset:
    """(vec_id, cluster) of every indexed vector."""
    import json
    import os

    with open(os.path.join(index_dir, "meta.json")) as f:
        n_clusters = json.load(f)["n_clusters"]
    ds = ray.data.read_parquet(
        _cluster_files(index_dir, range(n_clusters)), columns=["vec_id", "cluster_id"]
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": b["vec_id"].cast(pa.int64()),
                "cluster": b["cluster_id"].cast(pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def query_ann_index(
    index_dir: str,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
) -> pa.Table:
    """Serve IVF top-k from a persisted index: read ONLY the probed
    cluster partitions (file-level pruning — the unprobed vectors never
    leave storage), score per batch against the broadcast queries with
    batch-bounded memory, merge the k-bounded candidates."""
    import os

    import pyarrow.parquet as pq

    ct = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    cents = _to_matrix(ct, "w")
    q_mat = _normalize(np.asarray(query_mat, dtype=np.float64))
    q_ids = np.asarray(query_ids, dtype=np.int64)
    q_probes = np.argsort(-(q_mat @ cents.T), axis=1, kind="stable")[:, :nprobe]
    member = np.zeros((len(q_ids), len(cents)), dtype=bool)
    member[np.arange(len(q_ids))[:, None], q_probes] = True
    queries_ref = ray.put({"ids": q_ids, "mat": q_mat, "member": member})

    probed_files = _cluster_files(index_dir, np.unique(q_probes))
    if not probed_files:
        return _final_topk(_EMPTY_CAND, q_ids, k)
    vec_ds = ray.data.read_parquet(probed_files, columns=["vec_id", "cluster_id", "vec"])

    def score_batch(batch: pa.Table) -> pa.Table:
        q = ray.get(queries_ref)
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        cluster = np.asarray(batch["cluster_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        mat = _to_matrix(batch, "vec")  # stored normalized
        return _score_allowed(q, ids, mat, q["member"][:, cluster], k)

    cand_tbl = _collect_candidates(
        vec_ds.map_batches(score_batch, batch_format="pyarrow", batch_size=1024)
    )
    return _final_topk(cand_tbl, q_ids, k)


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
    are scored — one streaming ``map_batches`` pass with the query
    matrix broadcast (``ray.put`` once): each batch computes its
    vectors' buckets, masks per query to bucket equality, and emits a
    batch-local top-k.  No shuffle and no per-bucket task — per-task
    memory is bounded by the batch even for a degenerate hot bucket;
    nothing dataset-sized ever reaches the driver."""
    q_mat = _normalize(np.asarray(query_mat, dtype=np.float64))
    q_ids = np.asarray(query_ids, dtype=np.int64)
    planes = lsh_hyperplanes(q_mat.shape[1], bits=bits)
    q_buckets = lsh_bucket(q_mat, planes)
    planes_ref = ray.put(planes)
    queries_ref = ray.put({"ids": q_ids, "mat": q_mat, "buckets": q_buckets})

    def score_batch(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        q = ray.get(queries_ref)
        mat = _normalize(_to_matrix(batch, vec_col))
        buckets = lsh_bucket(mat, pl)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        allowed = q["buckets"][:, None] == buckets[None, :]
        return _score_allowed(q, ids, mat, allowed, k)

    cand_tbl = _collect_candidates(
        ds.map_batches(score_batch, batch_format="pyarrow", batch_size=1024)
    )
    return _final_topk(cand_tbl, q_ids, k)
