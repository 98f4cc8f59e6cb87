"""Deterministic splits, stratified sampling, sequence packing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fulltextsearch_ray.functions.sampling import (
    pack_sequences,
    split_by_hash,
    stratified_sample,
)


def _ids_ds(n, extra=None):
    cols = {"doc_id": pa.array(range(n), pa.int64())}
    if extra:
        cols.update(extra)
    return ray.data.from_arrow(pa.table(cols))


def test_split_ratios_and_determinism(ray_session):
    out = split_by_hash(_ids_ds(4000)).take_all()
    frac = {s: 0 for s in ("train", "val", "test")}
    for r in out:
        frac[r["split"]] += 1
    assert 0.85 < frac["train"] / 4000 < 0.95
    assert 0.03 < frac["val"] / 4000 < 0.08
    # rerun → identical assignment
    again = split_by_hash(_ids_ds(4000)).take_all()
    assert {r["doc_id"]: r["split"] for r in out} == {r["doc_id"]: r["split"] for r in again}


def test_split_membership_stable_under_corpus_growth(ray_session):
    small = {r["doc_id"]: r["split"] for r in split_by_hash(_ids_ds(500)).take_all()}
    big = {r["doc_id"]: r["split"] for r in split_by_hash(_ids_ds(2000)).take_all()}
    assert all(big[k] == v for k, v in small.items())


def test_split_rejects_bad_ratios(ray_session):
    with pytest.raises(ValueError, match="sum to 1"):
        split_by_hash(_ids_ds(10), ratios={"a": 0.5, "b": 0.2})


def test_stratified_sample_rates(ray_session):
    n = 3000
    langs = pa.array([["en", "de", "xx"][i % 3] for i in range(n)], pa.string())
    ds = _ids_ds(n, {"lang": langs})
    kept = stratified_sample(ds, group_col="lang", rates={"en": 1.0, "de": 0.3}).take_all()
    by = {"en": 0, "de": 0, "xx": 0}
    for r in kept:
        by[r["lang"]] += 1
    assert by["en"] == n // 3  # rate 1.0 keeps everything
    assert 0.2 < by["de"] / (n // 3) < 0.4
    assert by["xx"] == 0  # default rate drops unlisted groups


def test_stratified_sample_null_groups_take_default(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(100), pa.int64()),
                "lang": pa.array(["en" if i % 2 else None for i in range(100)], pa.string()),
            }
        )
    )
    kept = stratified_sample(ds, group_col="lang", rates={"en": 1.0}).take_all()
    assert len(kept) == 50 and all(r["lang"] == "en" for r in kept)
    # and a null row CAN be kept under a nonzero default rate
    kept2 = stratified_sample(
        ds, group_col="lang", rates={"en": 0.0}, default_rate=1.0
    ).take_all()
    assert len(kept2) == 50 and all(r["lang"] is None for r in kept2)


def _texts_ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_pack_sequences_hand_example(ray_session):
    # docs with 3, 4, 0, 5 tokens; seq_len=4 → tape [0,12) cut at 4, 8
    texts = ["a b c", "d e f g", "", "h i j k l"]
    rows = sorted(
        pack_sequences(_texts_ds(texts), seq_len=4).take_all(),
        key=lambda r: (r["seq_id"], r["doc_id"]),
    )
    got = [(r["doc_id"], r["seq_id"], r["tok_lo"], r["tok_hi"]) for r in rows]
    assert got == [
        (0, 0, 0, 3),  # doc0 fills tape [0,3)
        (1, 0, 0, 1),  # doc1 token 0 completes seq 0
        (1, 1, 1, 4),  # doc1 tokens 1-3 into seq 1
        (3, 1, 0, 1),  # doc3 token 0 completes seq 1
        (3, 2, 1, 5),  # doc3 tokens 1-4 fill seq 2
    ]


def test_pack_sequences_invariants_vs_reference(ray_session):
    rng = np.random.default_rng(3)
    texts = [" ".join(f"t{j}" for j in range(rng.integers(0, 40))) for _ in range(200)]
    seq_len = 64
    rows = pack_sequences(_texts_ds(texts), seq_len=seq_len, bucket_size=32).take_all()

    # driver-side reference: one linear pass over the token tape
    expect = []
    pos = 0
    for i, t in enumerate(texts):
        n = len(t.split())
        for s in range(pos // seq_len, (pos + n - 1) // seq_len + 1) if n else []:
            expect.append((i, s, max(s * seq_len - pos, 0), min((s + 1) * seq_len - pos, n)))
        pos += n
    got = sorted((r["doc_id"], r["seq_id"], r["tok_lo"], r["tok_hi"]) for r in rows)
    assert got == sorted(expect)
    # every full sequence holds exactly seq_len tokens
    per_seq = {}
    for _, s, lo, hi in got:
        per_seq[s] = per_seq.get(s, 0) + (hi - lo)
    last = max(per_seq)
    assert all(v == seq_len for s, v in per_seq.items() if s != last)


def test_pack_sequences_sparse_huge_ids(ray_session):
    # ids spread over a 10^10 range: the bucket width must auto-widen
    # (driver partial-sum table stays bounded) and spans stay exact
    ids = [3, 10_000, 5_000_000_000, 9_999_999_999]
    texts = ["a b c", "d e", "f g h i", "j"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    )
    rows = sorted(
        pack_sequences(ds, seq_len=4).take_all(), key=lambda r: (r["seq_id"], r["doc_id"])
    )
    got = [(r["doc_id"], r["seq_id"], r["tok_lo"], r["tok_hi"]) for r in rows]
    # tape: 3+2+4+1 tokens in doc_id order, cut at 4, 8
    assert got == [
        (3, 0, 0, 3),
        (10_000, 0, 0, 1),
        (10_000, 1, 1, 2),
        (5_000_000_000, 1, 0, 3),
        (5_000_000_000, 2, 3, 4),
        (9_999_999_999, 2, 0, 1),
    ]


def test_pack_sequences_bucket_widening_exact(ray_session):
    # force the adaptive power-of-two bucket widening (max_buckets=2
    # with >2 occupied floor buckets) and prove spans are unchanged vs
    # an un-widened run — widening affects grouping granularity only
    ids = [0, 5, 9, 17, 33, 61]  # 6 distinct floor buckets at width 1
    texts = ["a b c", "d e", "f g h i", "j", "k l m n o", "p q"]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})

    def run(**kw):
        rows = pack_sequences(ray.data.from_arrow(tbl), seq_len=4, bucket_size=1, **kw).take_all()
        return sorted((r["doc_id"], r["seq_id"], r["tok_lo"], r["tok_hi"]) for r in rows)

    assert run(max_buckets=2) == run(max_buckets=1_000_000)


def test_pack_sequences_rejects_bad_seq_len(ray_session):
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(_texts_ds(["a"]), seq_len=0)
