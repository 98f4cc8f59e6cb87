"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (each documented where it matters):
* exact        — hash-partitioned groupby(md5) keep-first: one shuffle
                 over (hash, doc_id) pairs only, never the text.
* minhash_lsh  — shingle→minhash signature per doc (map_batches),
                 band→bucket explode, groupby(bucket) pair emit,
                 candidate verify by signature agreement.
* simhash      — 64-bit weighted-bit fingerprint per doc (map_batches,
                 pure numpy over term counts).
* ngram_jaccard— exact Jaccard over word n-gram shingle sets via a
                 shared-shingle join (groupby shingle → pairs →
                 groupby pair), oracle-checkable in SQL.
* embedding    — cosine ≥ τ pairs over normalized vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..tokenizer import TOKEN_RE
from .common import md5_hex, md5_u64, round6

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the smallest id per exact text; emit (doc_id, n_copies).

    The shuffle moves only (md5, doc_id) pairs — the text stays put.
    """

    def to_hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": pa.array([md5_hex(t or "") for t in batch[text_col].to_pylist()]),
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
    toks = TOKEN_RE.findall((text or "").lower())
    if len(toks) >= n:
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return [" ".join(toks)] if toks else []


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
    """Actor-friendly stage: doc → minhash signature (+ band keys)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, n: int = 3, text_col: str = "text"):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.n = n
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, buckets, sigs = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch[self.text_col].to_pylist()):
            sig = minhash_signature(_shingles(text, self.n), self.a, self.b)
            sig_bytes = sig.astype(">u8").tobytes()
            for band in range(self.bands):
                lo = band * self.rows_per_band
                chunk = sig[lo : lo + self.rows_per_band]
                bucket = md5_hex(f"{band}:{'-'.join(map(str, chunk.tolist()))}")
                doc_ids.append(doc_id)
                band_ids.append(band)
                buckets.append(bucket)
                sigs.append(sig_bytes)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "band": pa.array(band_ids, type=pa.int32()),
                "bucket": pa.array(buckets, type=pa.string()),
                "sig": pa.array(sigs, type=pa.binary()),
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
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs via MinHash + LSH banding.

    Pipeline: signature map_batches → band-bucket explode →
    groupby(bucket) pair emit → per-pair signature agreement ≥
    threshold.  Pair dedup across bands via groupby(pair).
    """
    stage = MinHashStage(num_perm=num_perm, bands=bands, n=n, text_col=text_col)
    exploded = ds.map_batches(stage, batch_format="pyarrow")

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_pylist()
        sigs = group["sig"].to_pylist()
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        order = np.argsort(ids)
        out_a, out_b, est = [], [], []
        for i in range(len(order)):
            for j in range(i + 1, len(order)):
                ia, ib = order[i], order[j]
                sa = np.frombuffer(sigs[ia], dtype=">u8")
                sb = np.frombuffer(sigs[ib], dtype=">u8")
                agree = float((sa == sb).mean())
                if agree >= threshold:
                    out_a.append(ids[ia])
                    out_b.append(ids[ib])
                    est.append(agree)
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "est_jaccard": pa.array(round6(np.array(est, dtype=np.float64)) if est else [], pa.float64()),
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
    sign-summed.  Exact twin of the SQL oracle (same md5-derived bits)."""
    out_ids, out_hash = [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch[text_col].to_pylist()):
        toks = TOKEN_RE.findall((text or "").lower())
        if not toks:
            out_ids.append(doc_id)
            out_hash.append("0" * 16)
            continue
        terms, tfs = np.unique(np.array(toks, dtype=object), return_counts=True)
        h = np.array([md5_u64(t) for t in terms], dtype=np.uint64)
        # (n_terms, 64) bit matrix → weighted column sums
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        weights = tfs.astype(np.int64)[:, None]
        sums = (np.where(bits == 1, weights, -weights)).sum(axis=0)
        sim = np.uint64(0)
        for b in np.flatnonzero(sums > 0):
            sim |= np.uint64(1) << np.uint64(b)
        out_ids.append(doc_id)
        out_hash.append(format(int(sim), "016x"))
    return pa.table(
        {
            "doc_id": pa.array(out_ids, type=pa.int64()),
            "simhash": pa.array(out_hash, type=pa.string()),
        }
    )


# --------------------------------------------------------------------------
# exact n-gram jaccard
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: ray.data.Dataset, *, n: int = 3, threshold: float = 0.5, text_col: str = "text"
) -> ray.data.Dataset:
    """Exact word-n-gram Jaccard similarity pairs (a < b, jacc ≥ τ).

    Shuffles distinct (shingle, doc) pairs; pair counting is a second
    small groupby.  SQL-oracle-checkable (shared-shingle join).
    """

    def explode(batch: pa.Table) -> pa.Table:
        sh, ids = [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch[text_col].to_pylist()):
            for s in set(_shingles(text, n)):
                sh.append(s)
                ids.append(doc_id)
        return pa.table({"shingle": pa.array(sh, pa.string()), "doc_id": pa.array(ids, pa.int64())})

    shingle_docs = ds.map_batches(explode, batch_format="pyarrow")

    from ray.data.aggregate import Count

    doc_sizes = shingle_docs.groupby("doc_id").aggregate(Count(alias_name="n_shingles"))
    sizes = {r["doc_id"]: r["n_shingles"] for r in doc_sizes.take_all()}
    sizes_ref = ray.put(sizes)

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group["doc_id"].to_pylist())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    pair_counts = (
        shingle_docs.groupby("shingle")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="common"))
    )

    def score(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        common = np.asarray(batch["common"].to_numpy(zero_copy_only=False), dtype=np.float64)
        union = np.array([sz[x] + sz[y] for x, y in zip(a, b)], dtype=np.float64) - common
        jacc = round6(common / np.maximum(union, 1.0))
        keep = jacc >= threshold
        return pa.table(
            {
                "a": pa.array(np.asarray(a, dtype=np.int64)[keep]),
                "b": pa.array(np.asarray(b, dtype=np.int64)[keep]),
                "jaccard": pa.array(jacc[keep], pa.float64()),
            }
        )

    return pair_counts.map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------


def embedding_neardup_pairs(
    ds: ray.data.Dataset, *, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"
) -> pa.Table:
    """Pairs (a < b) with cosine(v_a, v_b) ≥ τ.

    Local-scale implementation: normalized matrix product per batch
    against the broadcast full matrix (the small-side broadcast
    pattern).  At 100 TB scale this becomes LSH-bucketed (see
    similarity.lsh_buckets) — documented scale path.
    """
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
