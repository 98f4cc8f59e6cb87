"""Session-5 regression tests: cross-batch duplicate doc_id detection
in ngram_jaccard (sentinel rows), per-file fetch-manifest persistence,
and legacy num_fields recovery during compaction."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fulltextsearch_ray.functions.dedup import ngram_jaccard_pairs
from fulltextsearch_ray.pipelines.build import build_index, compact_index
from fulltextsearch_ray.sources.enwiki import fetch_to_dir


def test_ngram_jaccard_cross_batch_duplicate_disjoint_shingles(ray_session):
    """A doc_id duplicated across INPUT BATCHES whose two texts share
    no word n-gram must still fail loudly: the within-batch uniqueness
    check cannot see it and the two copies' shingle rows never share a
    hash, so only the per-doc sentinel rows (same hash, same doc, same
    partition) can trip the pair stage's duplicate guard."""
    n_filler = 9000  # > any default map_batches batch_size: the two
    # copies of doc 7 are guaranteed to arrive in different batches
    ids = [7] + list(range(10, 10 + n_filler)) + [7]
    texts = (
        ["alpha beta gamma delta"]
        + [f"filler{i} word{i} token{i} item{i}" for i in range(n_filler)]
        + ["iota kappa lambda mu"]  # disjoint shingles from copy 1
    )
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    )
    with pytest.raises(Exception, match="must be unique"):
        ngram_jaccard_pairs(ds, n=3, threshold=0.1).take_all()


def test_ngram_jaccard_sentinels_do_not_change_results(ray_session):
    """The sentinel rows are bookkeeping only — pair output on a valid
    corpus is unchanged (exact values, no spurious pairs)."""
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "one two three four five six",
                        "one two three four five six",
                        "totally different words here now",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    rows = ngram_jaccard_pairs(ds, n=3, threshold=0.2).take_all()
    got = {(r["a"], r["b"]): r["jaccard"] for r in rows}
    assert got == {(1, 2): 1.0}


def test_fetch_to_dir_midrun_failure_keeps_manifest(tmp_path):
    """Provenance of files already fetched must survive a failure on a
    LATER url — otherwise a re-run with a same-basename different URL
    would serve the first URL's cached bytes as the second's."""
    d1 = tmp_path / "s1"
    d1.mkdir()
    f1 = d1 / "x.txt"
    f1.write_text("from url A")
    missing = tmp_path / "nope" / "x2.txt"  # never created
    dest = str(tmp_path / "mirror")
    with pytest.raises(Exception):
        fetch_to_dir(["file://" + str(f1), "file://" + str(missing)], dest)
    manifest = json.loads(open(os.path.join(dest, ".fetch_sources.json")).read())
    assert manifest["x.txt"] == "file://" + str(f1)
    # a DIFFERENT url claiming the same basename is hash-prefixed, not
    # served A's cached bytes
    d2 = tmp_path / "s2"
    d2.mkdir()
    f2 = d2 / "x.txt"
    f2.write_text("from url B")
    got = fetch_to_dir(["file://" + str(f2)], dest)
    assert open(got[0]).read() == "from url B"


def test_compact_recovers_num_fields_for_legacy_meta(ray_session, tmp_path):
    """num_fields=0 (legacy meta, field count unknown) forces the
    loosest BM25 prune bound; compaction rewrites every posting row,
    so it must derive the true count from the fields column instead of
    leaving the index degraded forever."""
    idx = str(tmp_path / "idx")
    kw = dict(
        text_col="title", text_cols=["title", "body"], doc_id_col="doc_id", num_buckets=2
    )

    def tbl(ids, titles, bodies):
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "title": pa.array(titles, pa.string()),
                "body": pa.array(bodies, pa.string()),
            }
        )

    build_index(ray.data.from_arrow(tbl([1, 2], ["apple pie", "rye loaf"],
                                        ["banana bread", "oat cake"])), idx, **kw)
    build_index(ray.data.from_arrow(tbl([3], ["cherry tart"], ["plum jam"])), idx, **kw)
    # forge a legacy meta: drop the field-count key entirely
    meta_path = os.path.join(idx, "meta.json")
    m = json.loads(open(meta_path).read())
    del m["num_fields"]
    with open(meta_path, "w") as f:
        json.dump(m, f)
    meta = compact_index(idx)
    assert meta.num_fields == 2


def test_ngram_jaccard_randomized_brute_force_parity(ray_session):
    """Pipeline output == O(n²) set-based Jaccard on a random corpus:
    validates the hash-partitioned packed-pair machinery (incl. the
    ridden set sizes and sentinel rows) against first principles."""
    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i}" for i in range(12)])
    n_docs, n = 40, 3
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(2, 20)))) for _ in range(n_docs)]
    # a few near-copies so high-jaccard pairs exist
    texts[5] = texts[4] + " extra"
    texts[9] = texts[8]

    def shingles(t):
        toks = t.split()  # vocab is lowercase alnum: engine tokenizer == split
        if 0 < len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}

    ss = [shingles(t) for t in texts]
    thresh = 0.2
    exp = {}
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            inter = len(ss[a] & ss[b])
            if inter:
                j = inter / len(ss[a] | ss[b])
                if j >= thresh:
                    exp[(a, b)] = j
    assert len(exp) >= 2  # the corpus actually exercises the pair path

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    rows = ngram_jaccard_pairs(ds, n=n, threshold=thresh, shingle_df_cap=10**6).take_all()
    got = {(r["a"], r["b"]): r["jaccard"] for r in rows}
    assert set(got) == set(exp)
    for k, v in exp.items():
        # pipeline rounds to 6 decimals (oracle hash convention)
        assert abs(got[k] - round(v, 6)) < 1e-9


# -- MaxScore soundness: negative idf, mid-entry splits, block_cf gate --------


def _mk_docs(texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


def _assert_topk_parity(exact, pruned, ctx):
    """Same top-k score multiset within ULP tolerance (the pruned path
    accumulates per-term, so summation ORDER differs by design; a
    wrongly-pruned doc shows as a beyond-ULP smaller kth score)."""
    es = sorted(exact["score"].to_pylist())
    ps = sorted(pruned["score"].to_pylist())
    assert len(es) == len(ps), ctx
    np.testing.assert_allclose(ps, es, rtol=0, atol=1e-9, err_msg=str(ctx))


def test_pruned_bm25_negative_idf_term_parity(ray_session):
    """A term whose (forged, legacy-entry-df-style) df exceeds N has
    idf < 0 and a NEGATIVE upper bound; summing it raw into the prune
    budget under-states what an unseen doc can score.  Pruned top-k
    must equal exhaustive top-k for every query mixing such a term."""
    from fulltextsearch_ray.pipelines.memory import build_in_memory

    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(15)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(3, 30)))) for _ in range(60)]
    s = build_in_memory(_mk_docs(texts), text_col="text", doc_id_col="doc_id")
    # forge df > N for the most common term (the legacy entry-df shape)
    i = int(np.argmax(s._df_docs))
    bad_term = str(s._terms_np[i])
    s._df_docs = s._df_docs.copy()  # the Arrow-backed view is read-only
    s._df_docs[i] = 5 * s.meta.num_docs
    assert s._term_upper_bound(bad_term) < 0  # the scenario is real
    for q in range(30):
        terms = [bad_term] + list(rng.choice(vocab, size=3, replace=False))
        for k in (1, 3, 10):
            _assert_topk_parity(s.bm25_topk(terms, k=k), s.bm25_topk_pruned(terms, k=k), (terms, k))


def test_pruned_bm25_mid_entry_split_parity(ray_session):
    """One doc's tf for a term exceeds block_cf → the entry splits
    across blocks and catalog max_tf under-states the doc's summed tf.
    The bound must detect the possibility (max_tf > block_cf/2) and
    fall back to the supremum; pruned == exhaustive."""
    from fulltextsearch_ray.pipelines.memory import build_in_memory

    texts = [
        "hot " * 100 + "rare",          # tf(hot)=100 >> block_cf
        "hot cold warm mild rare",
        "cold warm mild tepid",
        "warm mild tepid rare",
    ]
    s = build_in_memory(_mk_docs(texts), text_col="text", doc_id_col="doc_id", block_cf=8)
    assert s._min_block_cf == 8
    for terms in (["hot", "rare"], ["hot", "cold", "rare"], ["hot"], ["rare", "mild"]):
        for k in (1, 2, 4):
            _assert_topk_parity(s.bm25_topk(terms, k=k), s.bm25_topk_pruned(terms, k=k), terms)


def test_manifest_block_cf_gates_tight_bound(ray_session, tmp_path):
    """Fresh builds persist block_cf; a legacy manifest (key absent)
    forces the supremum bound (searcher._min_block_cf == 0)."""
    from fulltextsearch_ray.pipelines.query import IndexSearcher, K1

    idx = str(tmp_path / "idx")
    build_index(_mk_docs(["apple pie", "banana split"]), idx,
                text_col="text", doc_id_col="doc_id", num_buckets=2)
    s = IndexSearcher(idx)
    assert s._min_block_cf > 0
    tight = s._term_upper_bound("apple")
    # legacy manifest: strip the block_cf key
    man_path = None
    for root, _dirs, files in os.walk(idx):
        for f in files:
            if f == "manifest.json":
                man_path = os.path.join(root, f)
    m = json.loads(open(man_path).read())
    del m["block_cf"]
    with open(man_path, "w") as f:
        json.dump(m, f)
    s2 = IndexSearcher(idx)
    assert s2._min_block_cf == 0
    sup = s2._term_upper_bound("apple")
    assert sup >= tight  # supremum is the loosest sound bound
    # and it IS the supremum: idf * (K1+1)
    df = s2.term_stats("apple")[0]
    N = s2.meta.num_docs
    assert abs(sup - np.log((N - df + 0.5) / (df + 0.5) + 1.0) * (K1 + 1.0)) < 1e-12
    # results unchanged either way
    assert s.bm25_topk(["apple", "pie"], k=2).equals(s2.bm25_topk(["apple", "pie"], k=2))


def test_compact_mixed_meta_columns_both_survive(ray_session, tmp_path):
    """Two sessions with DIFFERENT meta columns compact into one
    docs_meta dir of mixed schemas; a directory-level read inferred
    the schema from the first fragment and silently dropped the other
    session's column — per-file reads keep both."""
    idx = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["apple pie"], pa.string()),
            "alpha": pa.array(["A1"], pa.string()),
        })),
        idx, text_col="text", doc_id_col="doc_id", meta_cols=("alpha",), num_buckets=2,
    )
    build_index(
        ray.data.from_arrow(pa.table({
            "doc_id": pa.array([2], pa.int64()),
            "text": pa.array(["banana split"], pa.string()),
            "beta": pa.array(["B2"], pa.string()),
        })),
        idx, text_col="text", doc_id_col="doc_id", meta_cols=("beta",), num_buckets=2,
    )
    from fulltextsearch_ray.pipelines.query import IndexSearcher

    compact_index(idx)
    s = IndexSearcher(idx)
    assert s.get_metadata(1).get("alpha") == "A1"
    assert s.get_metadata(2).get("beta") == "B2"


def test_build_rejects_duplicate_doc_ids_in_batch(ray_session, tmp_path):
    """Duplicate user doc_ids in one batch used to skip the occurrence
    sort (nondecreasing guard) and silently merge two documents into
    one posting entry with non-monotonic positions — must fail loud."""
    idx = str(tmp_path / "idx")
    tbl = pa.table({
        "doc_id": pa.array([5, 5], pa.int64()),
        "text": pa.array(["b a", "a"], pa.string()),
    })
    with pytest.raises(Exception, match="must be unique"):
        build_index(ray.data.from_arrow(tbl), idx,
                    text_col="text", doc_id_col="doc_id", num_buckets=2)


def test_codec_corrupt_inputs_fail_loudly():
    """Empty-but-expected payloads must raise at the codec boundary,
    not decode as 'no data'."""
    from fulltextsearch_ray.codecs import (
        decode_posting_block,
        decode_posting_columns,
        encode_posting_block,
        varint_decode,
        varint_encode,
    )

    with pytest.raises(ValueError, match="expected 5"):
        varint_decode(b"", count=5)
    # a block whose positions payload was lost entirely
    blk = encode_posting_block(
        np.array([1, 2], dtype=np.uint64),
        np.array([1, 1], dtype=np.uint64),
        np.array([1, 1], dtype=np.uint64),
    )
    with pytest.raises(ValueError, match="positions payload"):
        decode_posting_block(blk.docs, blk.fields, blk.tfs, b"")
    # all-zero dfs with non-empty payloads
    with pytest.raises(ValueError, match="every df is 0"):
        decode_posting_columns([blk.docs], [blk.fields], [blk.tfs], None, np.array([0]))


def test_similarity_guards(ray_session, tmp_path):
    """Element-level embedding nulls fail loud; a second ANN build
    refuses to merge into a live index; >64 LSH planes rejected;
    exclude_self is optional for external query ids."""
    from fulltextsearch_ray.functions.similarity import (
        brute_force_topk,
        build_ann_index,
        lsh_bucket,
        lsh_hyperplanes,
        query_ann_index,
    )

    # element-level null inside a list row (row-level null_count == 0)
    vecs = pa.array([[0.1, None, 0.2], [0.3, 0.4, 0.5]], pa.list_(pa.float32()))
    ds_bad = ray.data.from_arrow(
        pa.table({"vec_id": pa.array([1, 2], pa.int64()), "embedding": vecs})
    )
    with pytest.raises(Exception, match="null element"):
        brute_force_topk(ds_bad, np.array([1]), np.array([[1.0, 0.0, 0.0]]), k=2)

    # >64 hyperplanes would silently wrap to weight 0
    with pytest.raises(ValueError, match="64 hyperplanes"):
        lsh_bucket(np.ones((2, 8)), lsh_hyperplanes(8, bits=65))

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((30, 8)).astype(np.float64)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(30), pa.int64()),
                  "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float32()))})
    )
    idx = str(tmp_path / "ann")
    build_ann_index(ds, idx, n_clusters=4, iters=2)
    with pytest.raises(ValueError, match="already holds an index"):
        build_ann_index(ds, idx, n_clusters=4, iters=2, overwrite=False)
    build_ann_index(ds, idx, n_clusters=4, iters=2, overwrite=True)  # fine

    # external queries whose ids collide with corpus vec_ids: with
    # exclude_self=False the colliding corpus vector stays eligible
    q = mat[7:8] / np.linalg.norm(mat[7])
    with_excl = query_ann_index(idx, np.array([7]), q, k=1, nprobe=4)
    without = query_ann_index(idx, np.array([7]), q, k=1, nprobe=4, exclude_self=False)
    assert without["neighbor_id"].to_pylist() == [7]  # its own vector
    assert with_excl["neighbor_id"].to_pylist() != [7]


def test_dup_spans_rejects_duplicate_doc_ids(ray_session):
    """Duplicate doc_ids merged two docs' window streams and could emit
    spans with end_tok < start_tok (position reset inside one 'doc') —
    both span ops must fail loudly, like the index build and dedup."""
    from fulltextsearch_ray.functions.spans import cut_dup_spans, dup_spans

    t = "one two three four five six seven eight nine ten"
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([5, 5], pa.int64()),
                  "text": pa.array([t, t], pa.string())})
    )
    with pytest.raises(Exception, match="must be unique"):
        dup_spans(ds, gram_len=4, min_count=2).take_all()
    with pytest.raises(Exception, match="must be unique"):
        cut_dup_spans(ds, gram_len=4, min_count=2).take_all()


def test_spans_gram_len_validated(ray_session):
    from fulltextsearch_ray.functions.spans import dup_spans

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["a b c d e"], pa.string())})
    )
    with pytest.raises(Exception, match="gram_len"):
        dup_spans(ds, gram_len=0).take_all()


def test_connected_components_rejects_null_ids(ray_session):
    """A null pair endpoint round-trips NaN -> INT64_MIN and becomes a
    phantom node bridging unrelated components (canonical_docs then
    kills every member) — must fail loudly at the boundary."""
    from fulltextsearch_ray.functions.components import connected_components

    pairs = ray.data.from_arrow(
        pa.table({"a": pa.array([1, None], pa.int64()), "b": pa.array([2, 3], pa.int64())})
    )
    with pytest.raises(Exception, match="null ids"):
        connected_components(pairs).take_all()


def test_assign_doc_ids_rejects_duplicate_keys(ray_session):
    """Duplicate id tuples got run-order-dependent doc ids (stable
    argsort tie broken by block arrival order) — silent nondeterminism
    across retries; must fail loudly."""
    from fulltextsearch_ray.sources.corpus import assign_doc_ids

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(["a", "b", "a"], pa.string()),
                  "text": pa.array(["x", "y", "z"], pa.string())})
    )
    with pytest.raises(Exception, match="duplicate id tuples"):
        assign_doc_ids(ds, ["k"]).take_all()


def test_write_synth_corpus_resumes_after_interruption(tmp_path):
    """An interrupted run must resume from finished shards, not wipe
    them (the stamp used to be written only at the end)."""
    import pyarrow.parquet as pq

    from fulltextsearch_ray.sources.corpus import write_synth_corpus

    d = str(tmp_path / "synth")
    write_synth_corpus(d, 300, rows_per_file=100)
    # simulate interruption: delete the final shard, keep the stamp
    os.remove(os.path.join(d, "part-00002.parquet"))
    first = os.path.join(d, "part-00000.parquet")
    mtime = os.path.getmtime(first)
    write_synth_corpus(d, 300, rows_per_file=100)
    assert os.path.getmtime(first) == mtime  # finished shard untouched
    assert sum(pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
               for f in sorted(os.listdir(d)) if f.endswith(".parquet")) == 300


def test_shingles_matches_arrow_tokenizer_on_u0130():
    """_shingles must delegate to the SAME utf8proc tokenizer as
    shingle_batch — Python str.lower() diverges on U+0130."""
    from fulltextsearch_ray.functions.dedup import _shingles, shingle_batch

    text = "İstanbul kebap İyi"
    sh, _ = shingle_batch(pa.array([text], pa.string()), 2)
    assert set(_shingles(text, 2)) == set(sh.to_pylist())
