"""Corpus-curation pipeline: the composed filter → exact-dedup →
near-dedup flow against a hand-built corpus with known outcomes."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fulltextsearch_ray.functions.text import lang_id_batch, quality_batch
from fulltextsearch_ray.pipelines.curate import curate_corpus, curate_features_batch

GOOD = (
    "the quick brown fox jumps over the lazy dog and keeps running through "
    "fields of golden wheat toward distant mountains beyond the river "
) * 3


@pytest.fixture()
def corpus(ray_session):
    texts = [
        GOOD + "unique tail one",          # 1: survives
        GOOD + "unique tail one",          # 2: exact dup of 1 → dropped
        GOOD + "unique tail uno",          # 3: near dup of 1 (tiny simhash delta) or survives
        "x",                               # 4: low quality → dropped
        (
            "harbors hold tall ships while sailors watch gray gulls circle "
            "above salted piers and wooden crates stacked beside iron anchors "
        ) * 3 + "entirely separate subject matter here",  # 5: survives (distinct content)
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(1, 6), pa.int64()), "text": pa.array(texts, pa.string())}
    )
    return ray.data.from_arrow(tbl), tbl


def test_fused_features_match_individual_ops(corpus):
    _ds, tbl = corpus
    fused = curate_features_batch(tbl)
    lang = lang_id_batch(tbl)
    qual = quality_batch(tbl)
    assert fused["pred_lang"].to_pylist() == lang["pred_lang"].to_pylist()
    assert fused["n_tokens"].to_pylist() == qual["n_tokens"].to_pylist()
    np.testing.assert_array_equal(
        fused["quality"].to_numpy(), qual["quality"].to_numpy()
    )


def test_curate_drops_dups_and_low_quality(corpus):
    ds, tbl = corpus
    out = curate_corpus(ds, min_quality=0.5).take_all()
    ids = sorted(r["doc_id"] for r in out)
    assert 1 in ids          # keeper of the exact-dup group
    assert 2 not in ids      # exact dup of 1
    assert 4 not in ids      # low quality
    assert 5 in ids
    # doc 3 is a near dup of doc 1 (one token differs): dropped iff its
    # simhash is within hamming 3 — verify against the operator itself
    from fulltextsearch_ray.functions.dedup import simhash_batch
    from fulltextsearch_ray.functions.similarity import popcount64 as _popcount64

    sims = simhash_batch(tbl)
    h = np.array([int(s, 16) for s in sims["simhash"].to_pylist()], dtype=np.uint64)
    ham13 = int(_popcount64(np.array([h[0] ^ h[2]], dtype=np.uint64))[0])
    assert (3 in ids) == (ham13 > 3)


def test_curate_without_dedup_keeps_filtered_only(corpus):
    ds, _tbl = corpus
    out = curate_corpus(ds, min_quality=0.5, exact_dedup=False, near_dedup=False).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3, 5]


def test_curate_lang_filter(corpus):
    ds, _tbl = corpus
    out = curate_corpus(ds, min_quality=0.0, langs=["de"]).take_all()
    assert out == []  # the corpus is english
    out = curate_corpus(ds, min_quality=0.0, langs=["en"], near_dedup=False).take_all()
    assert 1 in {r["doc_id"] for r in out}
