"""Lazy (row-group-paged) catalog + doc-length mode: forcing the
budgets to 0 must leave every query result identical to the eager
searcher while holding no full-catalog arrays in memory."""

import numpy as np
import pytest

from fulltextsearch_ray.pipelines.build import build_index
from fulltextsearch_ray.pipelines.query import IndexSearcher
from fulltextsearch_ray.sources.corpus import write_synth_corpus


@pytest.fixture(scope="module")
def pair(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lazycorpus"))
    write_synth_corpus(d, 250, rows_per_file=50)
    idx = str(tmp_path_factory.mktemp("lazyidx"))
    build_index(d, idx, text_col="content", num_buckets=4, overwrite=True)
    eager = IndexSearcher(idx)
    lazy = IndexSearcher(idx, catalog_budget_rows=0, doclen_budget_rows=0)
    return eager, lazy


def test_lazy_holds_no_full_arrays(pair):
    _eager, lazy = pair
    assert lazy.terms is None and lazy._terms_np is None
    assert lazy._dl_docs is None
    assert lazy._lazy_cats is not None and lazy._lazy_lens is not None


def test_lazy_term_stats_match(pair):
    eager, lazy = pair
    terms = eager._terms_np[:: max(len(eager._terms_np) // 50, 1)].tolist() + ["absent_zz"]
    for t in terms:
        assert lazy.term_stats(t) == eager.term_stats(t), t
        assert lazy._term_upper_bound(t) == eager._term_upper_bound(t), t


def test_lazy_search_results_match(pair):
    eager, lazy = pair
    for q in [
        "WORD(index0)", "WILD(cach*)", "WILD(*0)", "EDIT(cache1,1)",
        "OR(WORD(def),WORD(class))", "SEQ(WORD(def),WORD(class))",
        "AND(WORD(index0),WORD(def))",
    ]:
        assert lazy.search_to_string(q) == eager.search_to_string(q), q
    assert lazy.lookup("WILD(ind*)") == eager.lookup("WILD(ind*)")
    assert lazy.lookup("EDIT(merge1,1)") == eager.lookup("EDIT(merge1,1)")


def test_lazy_bm25_matches(pair):
    eager, lazy = pair
    for q in ["index builder", "def class return", "posting merge block"]:
        assert lazy.bm25_topk(q, k=10).equals(eager.bm25_topk(q, k=10)), q
        terms = q.split()
        assert lazy.bm25_topk_pruned(terms, k=10).equals(
            eager.bm25_topk_pruned(terms, k=10)
        ), q


def test_lazy_doc_lens_match(pair):
    eager, lazy = pair
    ids = eager._dl_docs[:: max(len(eager._dl_docs) // 40, 1)]
    np.testing.assert_array_equal(lazy._doc_lens(ids), eager._doc_lens(ids))


def test_lazy_term_stats_dataset_streams(pair):
    """Scale-mode term-statistics surface (round-2 VERDICT #4): a
    lazy-mode searcher (no ``terms`` array at all) must enumerate the
    whole vocabulary via the catalog DATASET, matching the eager
    searcher's arrays exactly; top_terms must agree with a driver
    lexsort of those arrays."""
    eager, lazy = pair
    assert lazy.terms is None  # nothing eager to lean on
    rows = lazy.term_stats_dataset().take_all()
    got = {r["term"]: (r["df"], r["cf"]) for r in rows}
    want = {
        t: (int(eager._df_docs[i]), int(eager._cf[i]))
        for i, t in enumerate(eager._terms_np)
    }
    assert got == want
    top = lazy.top_terms(10)
    cf = np.asarray(eager._cf)
    order = np.lexsort((eager._terms_np, -cf))[:10]
    assert top["term"].to_pylist() == [eager._terms_np[i] for i in order]
    assert top["cf"].to_pylist() == [int(cf[i]) for i in order]


def test_covering_handles_overlapping_runs(tmp_path):
    """Regression: runs from different segments can overlap arbitrarily
    (multi-session custom doc ids); a NARROW run sorted after a WIDE
    one must not end the stab walk-back early."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fulltextsearch_ray.pipelines.query import LazyRowGroupTable

    wide = pa.table({"doc_id": pa.array([0, 700, 1000], pa.uint64()),
                     "doc_len": pa.array([1, 2, 3], pa.int64())})
    narrow = pa.table({"doc_id": pa.array([500, 600], pa.uint64()),
                       "doc_len": pa.array([4, 5], pa.int64())})
    pq.write_table(wide, str(tmp_path / "wide.parquet"))
    pq.write_table(narrow, str(tmp_path / "narrow.parquet"))
    t = LazyRowGroupTable(
        [str(tmp_path / "wide.parquet"), str(tmp_path / "narrow.parquet")],
        ["doc_id", "doc_len"],
    )
    # runs sorted by min: [(0,1000), (500,600)].  Key 700 is covered
    # ONLY by the wide run; the old walk-back stopped at the narrow
    # run's max (600 < 700) and returned nothing.
    cov = t.covering(700)
    assert [t.runs[i][:2] for i in cov] == [(0, 1000)]
    assert t.covering(550) and len(t.covering(550)) == 2
    assert t.range_indices(650, 800) == [0]


def test_lazy_doclens_interleaved_segments(ray_session, tmp_path):
    """BM25 in paged-doclen mode over two sessions whose CUSTOM doc-id
    ranges interleave (one wide, one narrow inside it) must match the
    eager searcher exactly — the old per-group lookup could read a
    neighbor's doc_len."""
    import pyarrow as pa
    import ray.data

    from fulltextsearch_ray.pipelines.build import build_index
    from fulltextsearch_ray.pipelines.query import IndexSearcher

    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    rows_a = {"doc_id": [], "text": []}
    for i in range(40):  # wide session: ids 0..3900 step 100
        rows_a["doc_id"].append(i * 100)
        rows_a["text"].append(" ".join(words[(i + j) % 5] for j in range(1 + i % 7)))
    rows_b = {"doc_id": [], "text": []}
    for i in range(30):  # narrow session inside the wide range
        rows_b["doc_id"].append(1001 + i)
        rows_b["text"].append(" ".join(words[(i + j) % 5] for j in range(1 + i % 5)))
    idx = str(tmp_path / "idx")
    for rows in (rows_a, rows_b):
        ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(rows["doc_id"], pa.uint64()),
                                           "text": pa.array(rows["text"])}))
        build_index(ds, idx, text_col="text", doc_id_col="doc_id", num_buckets=2)
    eager = IndexSearcher(idx)
    paged = IndexSearcher(idx, doclen_budget_rows=0)
    for q in ("alpha", "beta gamma", "delta epsilon alpha"):
        assert eager.bm25_topk(q, k=10).equals(paged.bm25_topk(q, k=10)), q
