"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (each documented where it matters):
* exact        — hash-partitioned groupby(md5) keep-first: one shuffle
                 over (hash, doc_id) pairs only, never the text.
* minhash_lsh  — shingle→minhash signature per doc (vectorized
                 map_batches: one DuckDB md5 pass + one numpy
                 permutation grid per batch), band→bucket explode,
                 groupby(bucket) capped pair emit, candidate verify by
                 vectorized signature agreement.
* simhash      — 64-bit weighted-bit fingerprint per doc (one grouped
                 Arrow pass + numpy bit matrix per batch).
* ngram_jaccard— exact Jaccard over word n-gram shingle sets via a
                 shared-shingle join with a document-frequency cap on
                 shingles; per-doc set sizes join back through Ray hash
                 joins (no driver-side dict).  SQL-oracle-checkable.
* embedding    — banded random-hyperplane LSH buckets → per-bucket
                 pairwise cosine ≥ τ (groupby(bucket), capped), pair
                 dedup across bands.  ``method="exact"`` keeps the
                 all-pairs matmul as an explicitly small-input fallback.

Every pair-emitting group stage is CAPPED: a degenerate bucket (empty
docs, boilerplate, a stop-shingle) logs a skip instead of emitting
O(g²) pairs.  No stage materializes the dataset on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..tokenizer import TOKEN_RE, flat_tokens
from .common import md5_hex, md5_u64, md5_u64_batch, round6

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the smallest id per exact text; emit (doc_id, n_copies).

    The shuffle moves only (md5, doc_id) pairs — the text stays put.
    """
    from .common import md5_hex_batch

    def to_hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": md5_hex_batch(pc.fill_null(batch[text_col], "")),
                id_col: batch[id_col],
            }
        )

    from ray.data.aggregate import Count, Min

    agg = ds.map_batches(to_hash, batch_format="pyarrow").groupby("h").aggregate(
        Min(id_col, alias_name="doc_id"), Count(alias_name="n_copies")
    )
    return agg.select_columns(["doc_id", "n_copies"])


# --------------------------------------------------------------------------
# shingling + minhash
# --------------------------------------------------------------------------

_MERSENNE31 = np.uint64((1 << 31) - 1)


def _shingles(text: str, n: int) -> list[str]:
    """Per-doc reference shingling (tests / tiny inputs only — the
    pipeline hot path uses :func:`shingle_batch`)."""
    toks = TOKEN_RE.findall((text or "").lower())
    if len(toks) >= n:
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return [" ".join(toks)] if toks else []


def shingle_batch(texts: pa.Array | pa.ChunkedArray, n: int) -> tuple[pa.Array, np.ndarray]:
    """Vectorized word-n-gram shingling of a batch of documents.

    Returns (shingles, doc_index) parallel arrays, doc-contiguous in
    input order.  All string work is Arrow C++ kernels (lower, split,
    window join); only documents with 0 < tokens < n (rare) take a
    per-doc Python join.  Matches :func:`_shingles` exactly.
    """
    toks, parent, counts = flat_tokens(texts)
    L = len(toks)

    out_sh: list[pa.Array] = []
    out_doc: list[np.ndarray] = []
    if L >= n:
        # sliding windows: join n shifted views where the window stays
        # within one document
        cols = [toks.slice(i, L - n + 1) for i in range(n)]
        joined = pc.binary_join_element_wise(*cols, " ")
        inside = parent[: L - n + 1] == parent[n - 1 :]
        out_sh.append(joined.filter(pa.array(inside)))
        out_doc.append(parent[: L - n + 1][inside])
    # short docs (0 < tokens < n): one whole-sequence shingle
    short = np.flatnonzero((counts > 0) & (counts < n))
    if len(short):
        starts = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        toks_py = toks.to_pylist()
        out_sh.append(
            pa.array(
                [" ".join(toks_py[starts[d] : starts[d + 1]]) for d in short], pa.string()
            )
        )
        out_doc.append(short.astype(np.int64))
    if not out_sh:
        return pa.array([], pa.string()), np.empty(0, dtype=np.int64)
    sh = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_sh])
    doc = np.concatenate(out_doc)
    order = np.argsort(doc, kind="stable")
    return sh.take(pa.array(order)), doc[order]


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    p = int(_MERSENNE31)
    a = rng.integers(1, p, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, p, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingles: list[str], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minhash values via (a*h + b) mod Mersenne31 over
    md5-based shingle hashes (deterministic, seed-fixed).

    Mersenne31 keeps every intermediate product < 2^62, so the whole
    (num_perm × n_shingles) permutation grid is pure uint64 numpy —
    no Python bignum fallback in the hot path.
    """
    if not shingles:
        return np.full(len(a), _MERSENNE31, dtype=np.uint64)
    h = np.array([md5_u64(s) for s in shingles], dtype=np.uint64) % _MERSENNE31
    vals = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE31
    return np.min(vals, axis=1)


class MinHashStage:
    """Actor-pool stage: doc → minhash signature (+ band-bucket rows).

    Fully batch-vectorized: ONE DuckDB md5 pass over every shingle of
    the batch, ONE (num_perm × n_shingles) uint64 permutation grid,
    segmented ``minimum.reduceat`` per document.  The bucket key is the
    raw band signature string ``"<band>:v-v-…-v"`` (SQL-oracle
    expressible via ``string_agg``), not an md5 of it.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, n: int = 3, text_col: str = "text"):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.n = n
        self.text_col = text_col

    def signatures(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(num_perm, n_docs) signature matrix + per-doc has-shingles
        mask for a batch.  Docs with no shingles keep the sentinel
        Mersenne31 signature and MUST be skipped by callers (they carry
        no content signal; emitting them would pair every empty doc)."""
        n_docs = batch.num_rows
        sh, sh_doc = shingle_batch(batch[self.text_col], self.n)
        sig = np.full((self.num_perm, n_docs), _MERSENNE31, dtype=np.uint64)
        present = np.zeros(n_docs, dtype=bool)
        if len(sh):
            h = md5_u64_batch(sh) % _MERSENNE31
            vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE31
            change = np.empty(len(sh_doc), dtype=bool)
            change[0] = True
            np.not_equal(sh_doc[1:], sh_doc[:-1], out=change[1:])
            starts = np.flatnonzero(change)
            mins = np.minimum.reduceat(vals, starts, axis=1)
            sig[:, sh_doc[starts]] = mins
            present[sh_doc[starts]] = True
        return sig, present

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig, present = self.signatures(batch)
        docs = np.flatnonzero(present)
        sig_bytes = {int(d): sig[:, d].astype(">u8").tobytes() for d in docs}
        doc_ids = batch["doc_id"].to_pylist()
        r = self.rows_per_band
        out_ids, out_band, out_bucket, out_sig = [], [], [], []
        for band in range(self.bands):
            chunk = sig[band * r : (band + 1) * r]
            for d in docs:
                out_ids.append(doc_ids[d])
                out_band.append(band)
                out_bucket.append(f"{band}:" + "-".join(map(str, chunk[:, d].tolist())))
                out_sig.append(sig_bytes[int(d)])
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(out_bucket, type=pa.string()),
                "sig": pa.array(out_sig, type=pa.binary()),
            }
        )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
    max_bucket: int = 256,
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs via MinHash + LSH banding.

    Pipeline: signature map_batches → band-bucket explode →
    groupby(bucket) capped pair emit (vectorized signature-agreement
    verify ≥ threshold) → pair dedup across bands via groupby(pair).

    Buckets larger than ``max_bucket`` are SKIPPED (logged, not
    silently): one degenerate bucket (empty docs, boilerplate) would
    otherwise emit O(g²) pairs — the cap bounds worst-case work per
    group at scale.
    """
    stage = MinHashStage(num_perm=num_perm, bands=bands, n=n, text_col=text_col)
    exploded = ds.map_batches(stage, batch_format="pyarrow")

    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "est_jaccard": pa.array([], pa.float64())}
    )

    def emit_pairs(group: pa.Table) -> pa.Table:
        g = group.num_rows
        if g < 2:
            return empty
        if g > max_bucket:
            print(
                f"minhash_lsh: skipping bucket of {g} docs (> cap {max_bucket}); "
                f"bucket={group['bucket'][0].as_py()!r}"
            )
            return empty
        ids = np.asarray(group["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        sigs = np.stack(
            [np.frombuffer(s, dtype=">u8") for s in group["sig"].to_pylist()]
        ).astype(np.uint64)[order]
        agree = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
        iu, ju = np.triu_indices(g, k=1)
        est = agree[iu, ju]
        keep = est >= threshold
        return pa.table(
            {
                "a": pa.array(ids[iu[keep]], pa.int64()),
                "b": pa.array(ids[ju[keep]], pa.int64()),
                "est_jaccard": pa.array(round6(est[keep]), pa.float64()),
            }
        )

    pairs = exploded.groupby("bucket").map_groups(emit_pairs, batch_format="pyarrow")
    from ray.data.aggregate import Max

    return pairs.groupby(["a", "b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash per doc: bit b of md5_u64(term), weighted by tf,
    sign-summed.  Exact twin of the SQL oracle (same md5-derived bits).

    Vectorized: Arrow tokenize + (doc, term) tf grouping, ONE DuckDB
    md5 pass over distinct (doc, term) rows, numpy (rows × 64) bit
    matrix with per-doc segmented reduction — no per-document loop.
    """
    n_docs = batch.num_rows
    toks, parent, _counts = flat_tokens(batch[text_col])

    out_hash = np.empty(n_docs, dtype=object)
    if len(toks):
        tf_tbl = (
            pa.table({"d": pa.array(parent), "t": toks})
            .group_by(["d", "t"])
            .aggregate([("t", "count")])
        )
        d = np.asarray(tf_tbl["d"].to_numpy(zero_copy_only=False))
        tf = np.asarray(tf_tbl["t_count"].to_numpy(zero_copy_only=False), dtype=np.int64)
        h = md5_u64_batch(tf_tbl["t"].combine_chunks())
        order = np.argsort(d, kind="stable")
        d, tf, h = d[order], tf[order], h[order]
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        weighted = np.where(bits == 1, tf[:, None], -tf[:, None])
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        np.not_equal(d[1:], d[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(weighted, starts, axis=0)  # (docs_present, 64)
        packed = ((sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
        present = d[starts]
        for i, doc in enumerate(present):
            out_hash[doc] = format(int(packed[i]), "016x")
    for i in range(n_docs):
        if out_hash[i] is None:
            out_hash[i] = "0" * 16
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(out_hash.tolist(), type=pa.string()),
        }
    )


# --------------------------------------------------------------------------
# exact n-gram jaccard
# --------------------------------------------------------------------------


def _cogroup_attach(
    pairs: ray.data.Dataset,
    sizes: ray.data.Dataset,
    key_col: str,
    out_name: str,
    payload_cols: list[str],
) -> ray.data.Dataset:
    """Distributed equi-join ``pairs[key_col] == sizes.doc_id`` that
    attaches ``sizes.n_shingles`` as ``out_name`` — expressed as a
    co-group (tagged union + groupby(key)) so both sides stay
    distributed.  All columns are int64."""

    def tag_pairs(b: pa.Table) -> pa.Table:
        if not b.num_columns or not b.num_rows:
            cols = {c: pa.array([], pa.int64()) for c in payload_cols}
        else:
            cols = {c: b[c] for c in payload_cols}
        cols["_key"] = cols[key_col] if b.num_rows else pa.array([], pa.int64())
        cols["_sz"] = (
            pa.nulls(b.num_rows, pa.int64()) if b.num_rows else pa.array([], pa.int64())
        )
        return pa.table(cols)

    def tag_sizes(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: pa.nulls(n, pa.int64()) for c in payload_cols}
        cols["_key"] = b["doc_id"]
        cols["_sz"] = b["n_shingles"]
        return pa.table(cols)

    unioned = pairs.map_batches(tag_pairs, batch_format="pyarrow").union(
        sizes.map_batches(tag_sizes, batch_format="pyarrow")
    )
    out_schema = pa.schema([(c, pa.int64()) for c in payload_cols] + [(out_name, pa.int64())])

    def attach(group: pa.Table) -> pa.Table:
        if not group.num_columns or not group.num_rows:
            return out_schema.empty_table()
        valid = pc.is_valid(group["_sz"])
        size_rows = group.filter(valid)
        pair_rows = group.filter(pc.invert(valid))
        if not pair_rows.num_rows or not size_rows.num_rows:
            return out_schema.empty_table()
        n_val = size_rows["_sz"][0].as_py()
        cols = {c: pair_rows[c] for c in payload_cols}
        cols[out_name] = pa.array([n_val] * pair_rows.num_rows, pa.int64())
        return pa.table(cols)

    return unioned.groupby("_key").map_groups(attach, batch_format="pyarrow")


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    shingle_df_cap: int = 1024,
) -> ray.data.Dataset:
    """Exact word-n-gram Jaccard similarity pairs (a < b, jacc ≥ τ).

    Shuffles distinct (shingle, doc) pairs; shingles with document
    frequency > ``shingle_df_cap`` are dropped from the pair stage
    (stop-shingle filter, logged — a shared boilerplate shingle would
    otherwise emit O(df²) pairs).  Per-doc set sizes flow back through
    Ray hash joins — no driver-side dict, no O(num_docs) driver memory.
    SQL-oracle-checkable (shared-shingle join with the same df cap).
    """

    def explode(batch: pa.Table) -> pa.Table:
        sh, dix = shingle_batch(batch[text_col], n)
        doc_ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        tbl = pa.table({"shingle": sh, "doc_id": pa.array(doc_ids[dix], pa.int64())})
        # distinct (shingle, doc) within the batch; the groupby key is
        # the shingle so cross-batch duplicates can't exist per doc
        return tbl.group_by(["shingle", "doc_id"]).aggregate([])

    shingle_docs = ds.map_batches(explode, batch_format="pyarrow")

    from ray.data.aggregate import Count

    doc_sizes = shingle_docs.groupby("doc_id").aggregate(Count(alias_name="n_shingles"))

    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})

    def emit_pairs(group: pa.Table) -> pa.Table:
        g = group.num_rows
        if g < 2:
            return empty
        if g > shingle_df_cap:
            print(
                f"ngram_jaccard: dropping shingle with df={g} (> cap {shingle_df_cap}); "
                f"shingle={group['shingle'][0].as_py()!r}"
            )
            return empty
        ids = np.sort(np.asarray(group["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64))
        iu, ju = np.triu_indices(g, k=1)
        return pa.table({"a": pa.array(ids[iu]), "b": pa.array(ids[ju])})

    pair_counts = (
        shingle_docs.groupby("shingle")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="common"))
    )

    # join per-doc sizes back: a co-group join (union + groupby(key))
    # — the sizes stay distributed (no driver dict), one shuffle per
    # key side.  (Ray's built-in Dataset.join crashes on partitions
    # whose left side receives zero rows — sparse pair sets hit that
    # constantly — so the join is expressed as a groupby instead.)
    joined = _cogroup_attach(
        _cogroup_attach(pair_counts, doc_sizes, "a", "n_a", ["a", "b", "common"]),
        doc_sizes, "b", "n_b", ["a", "b", "common", "n_a"],
    )

    def score(batch: pa.Table) -> pa.Table:
        if not batch.num_columns or not batch.num_rows:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        common = np.asarray(batch["common"].to_numpy(zero_copy_only=False), dtype=np.float64)
        n_a = np.asarray(batch["n_a"].to_numpy(zero_copy_only=False), dtype=np.float64)
        n_b = np.asarray(batch["n_b"].to_numpy(zero_copy_only=False), dtype=np.float64)
        union = n_a + n_b - common
        jacc = round6(common / np.maximum(union, 1.0))
        keep = jacc >= threshold
        return pa.table(
            {
                "a": batch["a"].filter(pa.array(keep)),
                "b": batch["b"].filter(pa.array(keep)),
                "jaccard": pa.array(jacc[keep], pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    bands: int = 8,
    planes_per_band: int = 6,
    seed: int = 13,
    max_bucket: int = 4096,
) -> "ray.data.Dataset | pa.Table":
    """Pairs (a < b) with cosine(v_a, v_b) ≥ τ.

    Default ``method="lsh"`` is the scale path: banded random-
    hyperplane LSH (``bands`` bands × ``planes_per_band`` planes,
    seeded, deterministic) — each vector lands in ``bands`` buckets,
    pairs are scored exactly (cosine) ONLY within shared buckets via
    ``groupby(bucket).map_groups``, then deduped across bands.  One
    shuffle of (bucket, id, vector) rows, bounded per-task memory,
    recall < 1 by construction (the SQL oracle mirrors the bucketing
    exactly, so the correctness gate is still exact).

    ``method="exact"`` is the all-pairs matmul — driver-side, O(n²),
    kept ONLY as a small-input fallback / recall reference for tests.
    """
    if method == "exact":
        return _embedding_neardup_exact(ds, threshold=threshold, id_col=id_col, vec_col=vec_col)

    from .similarity import _to_matrix, lsh_hyperplanes

    n_planes = bands * planes_per_band

    def bucket_stage(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch, vec_col)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        planes = lsh_hyperplanes(mat.shape[1], bits=n_planes, seed=seed)
        signs = (mat @ planes.T) > 0  # (n, n_planes)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        weights = 1 << np.arange(planes_per_band, dtype=np.int64)
        tables = []
        for band in range(bands):
            chunk = signs[:, band * planes_per_band : (band + 1) * planes_per_band]
            pattern = (chunk.astype(np.int64) * weights[None, :]).sum(axis=1)
            key = band * (1 << planes_per_band) + pattern
            tables.append(
                pa.table(
                    {
                        "key": pa.array(key, pa.int64()),
                        "vid": pa.array(ids, pa.int64()),
                        "vec": pa.array(mat.tolist(), pa.list_(pa.float64())),
                    }
                )
            )
        return pa.concat_tables(tables)

    exploded = ds.map_batches(bucket_stage, batch_format="pyarrow")

    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )

    def emit_pairs(group: pa.Table) -> pa.Table:
        g = group.num_rows
        if g < 2:
            return empty
        if g > max_bucket:
            print(
                f"embedding_neardup: skipping LSH bucket of {g} vectors (> cap {max_bucket}); "
                f"key={group['key'][0].as_py()}"
            )
            return empty
        ids = np.asarray(group["vid"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = _to_matrix(group, "vec")[order]
        sims = mat @ mat.T
        iu, ju = np.triu_indices(g, k=1)
        vals = sims[iu, ju]
        keep = vals >= threshold
        return pa.table(
            {
                "a": pa.array(ids[iu[keep]], pa.int64()),
                "b": pa.array(ids[ju[keep]], pa.int64()),
                "cosine": pa.array(round6(vals[keep]), pa.float64()),
            }
        )

    pairs = exploded.groupby("key").map_groups(emit_pairs, batch_format="pyarrow")
    from ray.data.aggregate import Max

    return pairs.groupby(["a", "b"]).aggregate(Max("cosine", alias_name="cosine"))


def _embedding_neardup_exact(
    ds: ray.data.Dataset, *, threshold: float, id_col: str, vec_col: str
) -> pa.Table:
    """All-pairs exact cosine — SMALL-INPUT fallback only (driver-side
    materialization + O(n²) matmul; the default LSH path is the scale
    shape)."""
    import ray

    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    ids = np.asarray(tbl[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in tbl[vec_col].to_pylist()])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    sims = mat @ mat.T
    iu, ju = np.triu_indices(len(ids), k=1)
    mask = sims[iu, ju] >= threshold
    return pa.table(
        {
            "a": pa.array(ids[iu[mask]], pa.int64()),
            "b": pa.array(ids[ju[mask]], pa.int64()),
            "cosine": pa.array(round6(sims[iu[mask], ju[mask]]), pa.float64()),
        }
    )
