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
