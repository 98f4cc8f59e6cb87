"""Dedup-operator tests: vectorized-kernel parity with the per-doc
reference forms, cap behavior under skew, and LSH-vs-exact recall."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fulltextsearch_ray.functions.common import md5_u64
from fulltextsearch_ray.functions.dedup import (
    MinHashStage,
    _shingles,
    embedding_neardup_pairs,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    shingle_batch,
    simhash_batch,
)
from fulltextsearch_ray.tokenizer import TOKEN_RE

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "",
    "one two",
    "single",
    "the quick brown fox jumped over a lazy dog",
    "alpha-beta gamma_delta 42 zeta",
    None,
    "x",
    "ἄλφα βῆτα γάμμα the quick",  # non-ASCII tokens
]


def test_shingle_batch_matches_per_doc():
    sh, dix = shingle_batch(pa.array(TEXTS, pa.string()), 3)
    ref = sorted((d, s) for d, t in enumerate(TEXTS) for s in _shingles(t or "", 3))
    assert sorted(zip(dix.tolist(), sh.to_pylist())) == ref
    # doc-contiguous ascending order (required by segmented reductions)
    assert (np.diff(dix) >= 0).all()


def test_minhash_signatures_match_per_doc():
    st = MinHashStage(num_perm=64, bands=16, n=3)
    batch = pa.table(
        {"doc_id": pa.array(range(len(TEXTS)), pa.int64()), "text": pa.array(TEXTS, pa.string())}
    )
    sig, present = st.signatures(batch)
    for d, t in enumerate(TEXTS):
        shingles = _shingles(t or "", 3)
        assert present[d] == bool(shingles)
        if shingles:
            np.testing.assert_array_equal(sig[:, d], minhash_signature(shingles, st.a, st.b))


def test_simhash_batch_matches_per_doc():
    def ref(text):
        toks = TOKEN_RE.findall((text or "").lower())
        if not toks:
            return "0" * 16
        terms, tfs = np.unique(np.array(toks, dtype=object), return_counts=True)
        h = np.array([md5_u64(t) for t in terms], dtype=np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        sums = np.where(bits == 1, tfs[:, None], -tfs[:, None]).sum(axis=0)
        v = np.uint64(0)
        for b in np.flatnonzero(sums > 0):
            v |= np.uint64(1) << np.uint64(b)
        return format(int(v), "016x")

    batch = pa.table(
        {"doc_id": pa.array(range(len(TEXTS)), pa.int64()), "text": pa.array(TEXTS, pa.string())}
    )
    out = simhash_batch(batch)
    # token-less docs emit NO row (the oracle's tf CTE has nothing to
    # group for them) — parity holds over the docs that do tokenize
    want = {i: ref(t) for i, t in enumerate(TEXTS) if ref(t) != "0" * 16}
    got = dict(zip(out["doc_id"].to_pylist(), out["simhash"].to_pylist()))
    assert got == want


@pytest.fixture()
def docs_ds(ray_session):
    texts = [
        "the quick brown fox jumps over",
        "the quick brown fox jumps over",       # exact dup of 1
        "totally different words appear here",
        "the quick brown fox leaps over",        # near dup of 1
        "unrelated content entirely separate",
    ]
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(1, 6), pa.int64()), "text": pa.array(texts, pa.string())})
    )


def test_minhash_lsh_finds_duplicates(docs_ds):
    rows = minhash_lsh_pairs(docs_ds, num_perm=64, bands=16, threshold=0.9).take_all()
    assert {(r["a"], r["b"]) for r in rows} == {(1, 2)}
    assert rows[0]["est_jaccard"] == 1.0


def test_minhash_bucket_cap_skips_degenerate_bucket(ray_session):
    # 40 identical docs: every band bucket holds all 40 → with
    # max_bucket=10 every bucket is skipped and NO pairs are emitted
    # (logged skip, not a quadratic emit)
    n = 40
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(n), pa.int64()),
             "text": pa.array(["same boilerplate text everywhere"] * n, pa.string())}
        )
    )
    rows = minhash_lsh_pairs(ds, num_perm=64, bands=16, threshold=0.5, max_bucket=10).take_all()
    assert rows == []
    # with an adequate cap the pairs come back
    rows = minhash_lsh_pairs(ds, num_perm=64, bands=16, threshold=0.5, max_bucket=64).take_all()
    assert len(rows) == n * (n - 1) // 2


def test_ngram_jaccard_exact_values(docs_ds):
    rows = ngram_jaccard_pairs(docs_ds, n=3, threshold=0.2).take_all()
    got = {(r["a"], r["b"]): r["jaccard"] for r in rows}
    # docs 1,2 identical → jaccard 1.0; docs 1,4 share 2 of 6 shingles
    assert got[(1, 2)] == 1.0
    assert abs(got[(1, 4)] - 2 / 6) < 1e-6
    assert (1, 3) not in got


def test_ngram_jaccard_df_cap_drops_stop_shingle(ray_session):
    # every doc shares one boilerplate shingle; with a df cap below the
    # corpus size that shingle contributes no pairs, so docs that ONLY
    # share it pair at jaccard 0 (filtered), while true near-dups keep
    # their (reduced) score — and the pair stage never sees an O(n²)
    # group.
    n = 30
    texts = [f"standard footer line plus unique{i} token{i} here{i}" for i in range(n)]
    texts[0] = "standard footer line plus unique1 token1 here1 extra"  # near-dup of doc 1
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts, pa.string())})
    )
    uncapped = ngram_jaccard_pairs(ds, n=3, threshold=0.01, shingle_df_cap=1024).take_all()
    capped = ngram_jaccard_pairs(ds, n=3, threshold=0.01, shingle_df_cap=10).take_all()
    # the shared 'standard footer line'/'footer line plus' shingles pair
    # every doc with every other when uncapped
    assert len(uncapped) == n * (n - 1) // 2
    # capped: only the true near-dup pair survives (docs 0 and 1 share
    # low-df shingles beyond the boilerplate)
    assert {(r["a"], r["b"]) for r in capped} == {(0, 1)}


def test_embedding_neardup_lsh_vs_exact(ray_session):
    rng = np.random.default_rng(1)
    base = rng.standard_normal((40, 16))
    vecs = np.vstack([base, base[:8] + rng.standard_normal((8, 16)) * 0.01])
    ds = ray.data.from_arrow(
        pa.table(
            {"vec_id": pa.array(range(len(vecs)), pa.int64()),
             "embedding": pa.array([r.astype(np.float32).tolist() for r in vecs], pa.list_(pa.float32()))}
        )
    )
    exact = embedding_neardup_pairs(ds, threshold=0.95, method="exact")
    exact_pairs = set(zip(exact["a"].to_pylist(), exact["b"].to_pylist()))
    lsh_rows = embedding_neardup_pairs(ds, threshold=0.95, bands=4, planes_per_band=4).take_all()
    lsh_pairs = {(r["a"], r["b"]) for r in lsh_rows}
    # LSH is a subset of exact with high recall on near-identical pairs
    assert lsh_pairs <= exact_pairs
    assert len(lsh_pairs) >= 0.75 * len(exact_pairs)
    # cosine values are identical where both report a pair
    lsh_vals = {(r["a"], r["b"]): r["cosine"] for r in lsh_rows}
    exact_vals = {
        (a, b): c
        for a, b, c in zip(
            exact["a"].to_pylist(), exact["b"].to_pylist(), exact["cosine"].to_pylist()
        )
    }
    for p, v in lsh_vals.items():
        assert v == exact_vals[p]


def test_embedding_neardup_bucket_cap(ray_session):
    n = 30
    vec = np.ones(8, dtype=np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {"vec_id": pa.array(range(n), pa.int64()),
             "embedding": pa.array([vec.tolist()] * n, pa.list_(pa.float32()))}
        )
    )
    rows = embedding_neardup_pairs(ds, threshold=0.9, bands=2, planes_per_band=4, max_bucket=8).take_all()
    assert rows == []  # identical vectors all land in one capped bucket


def test_pair_pipeline_small_and_distributed_paths_agree(ray_session, monkeypatch):
    """The one-gather small-input fast path and the hash-partitioned
    distributed path must produce identical pair sets."""
    import fulltextsearch_ray.functions.dedup as dd

    import pyarrow as pa
    import ray.data

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about ray data pipelines",
        "the quick brown fox jumps over the lazy dog again and once more",
    ]
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    small = dd.minhash_lsh_pairs(docs, num_perm=32, bands=8, threshold=0.3).take_all()
    monkeypatch.setattr(dd, "SMALL_PAIRS_ROW_BUDGET", 0)
    dist = dd.minhash_lsh_pairs(docs, num_perm=32, bands=8, threshold=0.3).take_all()
    key = lambda r: (r["a"], r["b"])
    assert sorted(small, key=key) == sorted(dist, key=key)
    assert len(small) >= 1


def test_simhash_neardup_skips_tokenless_docs(ray_session):
    """Null/empty/punctuation-only docs share fingerprint 0 but carry
    no content signal — they must NOT pair with each other (the SQL
    oracle's tf-derived fingerprints exclude them by construction, and
    the minhash path skips no-shingle docs for the same reason)."""
    import ray.data

    from fulltextsearch_ray.functions.dedup import simhash_neardup_pairs

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(["!!!", "???", None, "real text here", "real text here"]),
            }
        )
    )
    out = simhash_neardup_pairs(ds, max_hamming=3, bands=4).to_pandas()
    pairs = set(zip(out.a.tolist(), out.b.tolist()))
    assert (4, 5) in pairs  # the genuine duplicate pair survives
    assert all(a not in (1, 2, 3) and b not in (1, 2, 3) for a, b in pairs), pairs
