"""Duplicated-substring span detection + removal (functions/spans.py).

Hand-computed goldens on tiny corpora, a brute-force cross-check of
the window-count/merge semantics, and broadcast==distributed path
equality (budget forced to 0)."""

import numpy as np
import pyarrow as pa
import ray.data

from fulltextsearch_ray.functions.spans import (
    cut_dup_spans,
    dup_spans,
    grams_with_pos,
    spans_from_marks,
)


def _ds(texts, ids=None):
    ids = ids or list(range(1, len(texts) + 1))
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _brute_spans(texts, ids, gram_len, min_count):
    """Reference implementation: python dict of window counts, then
    per-doc merge of marked starts with gap <= gram_len."""
    docs = []
    for t in texts:
        toks = [w for w in __import__("re").split(r"[^a-z0-9_\-]+", t.lower()) if w]
        docs.append(toks)
    counts = {}
    for toks in docs:
        for i in range(len(toks) - gram_len + 1):
            g = " ".join(toks[i : i + gram_len])
            counts[g] = counts.get(g, 0) + 1
    spans = []
    for did, toks in zip(ids, docs):
        marks = [
            i
            for i in range(len(toks) - gram_len + 1)
            if counts[" ".join(toks[i : i + gram_len])] >= min_count
        ]
        if not marks:
            continue
        start, prev, n = marks[0], marks[0], 1
        for p in marks[1:]:
            if p - prev <= gram_len:
                prev, n = p, n + 1
            else:
                spans.append((did, start, prev + gram_len, n))
                start, prev, n = p, p, 1
        spans.append((did, start, prev + gram_len, n))
    return sorted(spans)


def _got_spans(ds, **kw):
    rows = dup_spans(ds, **kw).take_all()
    return sorted((r["doc_id"], r["start_tok"], r["end_tok"], r["n_grams"]) for r in rows)


def test_dup_spans_golden(ray_session):
    # "alpha beta gamma delta" appears in docs 1 and 2 -> one 4-token span each
    texts = [
        "alpha beta gamma delta unique-one tail",
        "head alpha beta gamma delta unique-two",
        "nothing shared here at all now",
    ]
    got = _got_spans(_ds(texts), gram_len=4, min_count=2)
    assert got == [(1, 0, 4, 1), (2, 1, 5, 1)]


def test_dup_spans_merges_overlapping_windows(ray_session):
    # a 6-token shared run -> 3 overlapping windows merge into ONE span
    shared = "one two three four five six"
    texts = [f"{shared} xxa xxb", f"xxc {shared} xxd"]
    got = _got_spans(_ds(texts), gram_len=4, min_count=2)
    assert got == [(1, 0, 6, 3), (2, 1, 7, 3)]


def test_dup_spans_within_one_doc(ray_session):
    # repetition INSIDE a single document counts toward min_count
    texts = ["ra rb rc rd zfill1 zfill2 ra rb rc rd", "completely different text body here"]
    got = _got_spans(_ds(texts), gram_len=4, min_count=2)
    assert got == [(1, 0, 4, 1), (1, 6, 10, 1)]


def test_dup_spans_adjacent_spans_merge(ray_session):
    # marks exactly gram_len apart (adjacent ranges) merge
    texts = ["pa pb pc pd qa qb qc qd", "pa pb pc pd x1 x2 x3 x4 qa qb qc qd"]
    got = _got_spans(_ds(texts), gram_len=4, min_count=2)
    assert got == [(1, 0, 8, 2), (2, 0, 4, 1), (2, 8, 12, 1)]


def test_dup_spans_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 40)))
        for _ in range(60)
    ]
    ids = list(range(1, len(texts) + 1))
    for L, m in [(3, 2), (4, 3)]:
        got = _got_spans(_ds(texts, ids), gram_len=L, min_count=m)
        assert got == _brute_spans(texts, ids, L, m)


def test_dup_spans_distributed_matches_broadcast(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(20)]
    texts = [" ".join(rng.choice(vocab, size=25)) for _ in range(40)]
    bc = _got_spans(_ds(texts), gram_len=3, min_count=2)
    dist = _got_spans(_ds(texts), gram_len=3, min_count=2, broadcast_budget=0)
    assert bc == dist and len(bc) > 0


def test_cut_dup_spans_golden(ray_session):
    texts = [
        "alpha beta gamma delta unique-one tail",
        "head alpha beta gamma delta unique-two",
        "nothing shared here at all now",
    ]
    rows = {r["doc_id"]: r for r in cut_dup_spans(_ds(texts), gram_len=4, min_count=2).take_all()}
    assert rows[1]["text_cut"] == "unique-one tail" and rows[1]["n_removed"] == 4
    assert rows[2]["text_cut"] == "head unique-two" and rows[2]["n_removed"] == 4
    # untouched doc keeps every token (normalized join) and appears in output
    assert rows[3]["text_cut"] == "nothing shared here at all now"
    assert rows[3]["n_removed"] == 0


def test_cut_dup_spans_fully_removed_doc_is_empty(ray_session):
    texts = ["da db dc dd", "da db dc dd", "fresh words only appear once"]
    rows = {r["doc_id"]: r for r in cut_dup_spans(_ds(texts), gram_len=4, min_count=2).take_all()}
    assert rows[1]["text_cut"] == "" and rows[1]["n_removed"] == 4
    assert rows[2]["text_cut"] == "" and rows[2]["n_removed"] == 4
    assert rows[3]["n_removed"] == 0


def test_cut_dup_spans_distributed_matches(ray_session):
    rng = np.random.default_rng(3)
    vocab = [f"u{i}" for i in range(15)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(30)]
    key = lambda rows: sorted((r["doc_id"], r["text_cut"], r["n_removed"]) for r in rows)
    bc = key(cut_dup_spans(_ds(texts), gram_len=3, min_count=2).take_all())
    dist = key(cut_dup_spans(_ds(texts), gram_len=3, min_count=2, broadcast_budget=0).take_all())
    assert bc == dist


def test_grams_with_pos_doc_boundaries():
    texts = pa.array(["a b c d", "e f", "g h i"], pa.string())
    h, parent, pos, counts = grams_with_pos(texts, 2)
    assert counts.tolist() == [4, 2, 3]
    # windows never straddle a doc boundary
    assert parent.tolist() == [0, 0, 0, 1, 2, 2]
    assert pos.tolist() == [0, 1, 2, 0, 0, 1]
    assert len(h) == 6


def test_spans_from_marks_empty():
    t = spans_from_marks(np.empty(0, np.int64), np.empty(0, np.int64), 4)
    assert t.num_rows == 0


def test_cut_dup_spans_distributed_null_text(ray_session):
    """Regression: a NULL-text document in the distributed (budget-0)
    cut used to be routed to the SPAN side of the co-group (the
    rebuild classifies rows by text validity) and crashed the doc
    lookup; the broadcast path always treated null as ''."""
    texts = ["w x y z w x y z", "w x y z q r s t", None, "unrelated words only here"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    key = lambda rows: sorted((r["doc_id"], r["text_cut"], r["n_removed"]) for r in rows)
    bc = key(cut_dup_spans(ds, gram_len=3, min_count=2).take_all())
    dist = key(
        cut_dup_spans(ds, gram_len=3, min_count=2, broadcast_budget=0).take_all()
    )
    assert bc == dist
    assert len(bc) == len(texts)
