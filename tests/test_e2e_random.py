"""Randomized end-to-end search property test: build a persistent
index from a random corpus (including an incremental second session)
and compare DOC-LEVEL result sets against a brute-force Python
reference for the unambiguous query algebra:

  WORD(t)          -> docs whose token stream contains t
  OR(a, b)         -> union
  AND(a, b)        -> intersection
  WILD(p*)         -> union over matching vocabulary terms
  phrase "a b"     -> docs with the adjacent token pair

Occurrence-level semantics (duplicate-preserving OR, overlap chains)
are covered by the ported reference goldens in test_occurrences /
test_search_golden; this test guards the END-TO-END pipeline (ids,
segments, shuffle, codecs, catalog, matchers) under corpora the
fixtures never tried.  Tokenization parity comes from using the
engine's own tokenize() for the reference sets."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fulltextsearch_ray.pipelines.build import build_index
from fulltextsearch_ray.pipelines.query import IndexSearcher
from fulltextsearch_ray.tokenizer import tokenize


def _mk_corpus(rng, n_docs, vocab):
    texts = []
    for _ in range(n_docs):
        k = int(rng.integers(0, 12))
        texts.append(" ".join(rng.choice(vocab, size=k)) if k else "")
    return texts


def _docs_with(pred, toks_by_doc):
    return {d for d, toks in toks_by_doc.items() if pred(toks)}


def _hits_docs(searcher, query):
    tbl = searcher.search_table(query)
    return set(np.asarray(tbl["doc_id"].to_numpy(zero_copy_only=False)).tolist())


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_corpus_doc_sets(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(25)] + ["apple", "apply", "banana"]
    texts = _mk_corpus(rng, 60, np.array(vocab, dtype=object))
    idx = str(tmp_path / f"idx{seed}")
    # two sessions: ids continue, results must merge across segments
    half = len(texts) // 2
    for lo, part in ((0, texts[:half]), (half, texts[half:])):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(lo + 1, lo + 1 + len(part)), pa.uint64()),
                    "text": pa.array(part, pa.string()),
                }
            )
        )
        build_index(ds, idx, text_col="text", doc_id_col="doc_id", num_buckets=4)
    s = IndexSearcher(idx)

    toks_by_doc = {d + 1: tokenize(t) for d, t in enumerate(texts)}

    for _ in range(12):
        a, b = rng.choice(vocab, size=2, replace=False)
        want_a = _docs_with(lambda tk: a in tk, toks_by_doc)
        want_b = _docs_with(lambda tk: b in tk, toks_by_doc)
        assert _hits_docs(s, f"WORD({a})") == want_a, a
        assert _hits_docs(s, f"OR(WORD({a}),WORD({b}))") == (want_a | want_b), (a, b)
        assert _hits_docs(s, f"AND(WORD({a}),WORD({b}))") == (want_a & want_b), (a, b)
        # adjacent pair phrase
        def has_pair(tk, x=a, y=b):
            return any(u == x and v == y for u, v in zip(tk, tk[1:]))

        want_ph = _docs_with(has_pair, toks_by_doc)
        got_ph = _hits_docs(s, f"SEQ(WORD({a}),WORD({b}))")
        assert got_ph == want_ph, (a, b)

    # WILD over a shared prefix
    want_ap = _docs_with(
        lambda tk: any(t.startswith("appl") for t in tk), toks_by_doc
    )
    assert _hits_docs(s, "WILD(appl*)") == want_ap

    # BM25 candidates == OR doc set; scores are finite and sorted
    q = f"{vocab[0]} {vocab[1]}"
    top = s.bm25_topk(q, k=1000)
    want_or = _docs_with(
        lambda tk: vocab[0] in tk or vocab[1] in tk, toks_by_doc
    )
    assert set(top["doc_id"].to_pylist()) == want_or
    scores = top["score"].to_pylist()
    assert scores == sorted(scores, reverse=True)
