"""Hypothesis property tests: codec round-trips and kernel invariants
over random occurrence streams (the reference's randomized layer-3
strategy, SURVEY.md §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fulltextsearch_ray.codecs import (
    decode_posting_block,
    decode_posting_columns,
    encode_posting_block,
    varint_decode,
    varint_encode,
)
from fulltextsearch_ray.groupvarint import group_varint_decode, group_varint_encode
from fulltextsearch_ray.occurrences import (
    Matches,
    OccurrenceList,
    format_matches,
    lex_sort,
    or_merge,
    phrase_chains,
)

u64s = st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200)
u32s = st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=200)


@given(u64s)
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip_property(values):
    v = np.array(values, dtype=np.uint64)
    assert varint_decode(varint_encode(v)).tolist() == values


@given(u32s)
@settings(max_examples=50, deadline=None)
def test_groupvarint_roundtrip_property(values):
    v = np.array(values, dtype=np.uint32)
    assert group_varint_decode(group_varint_encode(v), len(v)).tolist() == values


occurrences_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=1000),   # doc
        st.integers(min_value=1, max_value=4),      # field
        st.integers(min_value=1, max_value=500),    # token
    ),
    min_size=1,
    max_size=150,
    unique=True,
)


def _sorted_occ(triples):
    arr = np.array(sorted(triples), dtype=np.uint64)
    return arr[:, 0].copy(), arr[:, 1].copy(), arr[:, 2].copy()


@given(occurrences_strategy)
@settings(max_examples=50, deadline=None)
def test_posting_block_roundtrip_property(triples):
    d, f, t = _sorted_occ(triples)
    blk = encode_posting_block(d, f, t)
    dd, ff, tt, e_docs, e_fields, e_tfs = decode_posting_block(
        blk.docs, blk.fields, blk.tfs, blk.positions
    )
    assert np.array_equal(dd, d) and np.array_equal(ff, f) and np.array_equal(tt, t)
    assert int(e_tfs.sum()) == len(d)


@given(occurrences_strategy, st.integers(min_value=1, max_value=5))
@settings(max_examples=30, deadline=None)
def test_concat_decode_equals_per_block(triples, n_splits):
    """decode_posting_columns over arbitrary block splits must equal
    the unsplit decode (the query-path fast decoder)."""
    d, f, t = _sorted_occ(triples)
    # split at entry boundaries
    change = np.r_[True, (d[1:] != d[:-1]) | (f[1:] != f[:-1])]
    entry_starts = np.flatnonzero(change)
    cuts = sorted(set(
        entry_starts[i * len(entry_starts) // n_splits] for i in range(n_splits)
    ) | {0})
    cuts = cuts + [len(d)]
    blocks = []
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        if hi > lo:
            blocks.append(encode_posting_block(d[lo:hi], f[lo:hi], t[lo:hi]))
    out = decode_posting_columns(
        [b.docs for b in blocks], [b.fields for b in blocks],
        [b.tfs for b in blocks], [b.positions for b in blocks],
        np.array([b.df for b in blocks]),
    )
    _ed, _ef, _etf, od, of, ot = out
    assert np.array_equal(od, d) and np.array_equal(of, f) and np.array_equal(ot, t)


@given(st.lists(occurrences_strategy, min_size=1, max_size=4))
@settings(max_examples=30, deadline=None)
def test_or_merge_is_sorted_multiset_union(lists):
    occs = [OccurrenceList(*_sorted_occ(l)) for l in lists]
    merged = or_merge(occs)
    # multiset union preserved
    all_triples = sorted(tr for l in lists for tr in l)
    got = list(zip(merged.docs.tolist(), merged.fields.tolist(), merged.tokens.tolist()))
    assert got == all_triples


@given(occurrences_strategy)
@settings(max_examples=30, deadline=None)
def test_phrase_self_adjacency_oracle(triples):
    """phrase(X, X) must equal the brute-force set of (o, o') pairs
    with same (doc, field) and token' = token + 1."""
    occ = OccurrenceList(*_sorted_occ(triples))
    m = phrase_chains([occ, occ])
    got = set(zip(m.docs.tolist(), m.fields.tolist(), m.tokens.tolist()))
    s = set(zip(occ.docs.tolist(), occ.fields.tolist(), occ.tokens.tolist()))
    expect = {(d, f, t) for (d, f, t) in s if (d, f, t + 1) in s}
    assert got == expect


# -- FST dictionary properties (round 4) ------------------------------------

fst_words = st.lists(
    st.text(alphabet="abcXYZ 0é中", min_size=0, max_size=8),
    min_size=0,
    max_size=60,
)


@given(fst_words, st.data())
@settings(max_examples=40, deadline=None)
def test_fst_model_property(words, data):
    """build → byte round-trip → try_match/items equals a dict model,
    for arbitrary unicode terms and signed outputs."""
    from fulltextsearch_ray.fst import Fst, build_fst

    uniq = sorted(set(words))
    outs = [
        data.draw(st.integers(min_value=-(2**40), max_value=2**40))
        for _ in uniq
    ]
    fst = Fst.from_bytes(build_fst(zip(uniq, outs)).get_bytes())
    model = dict(zip(uniq, outs))
    assert list(fst.items()) == sorted(model.items())
    for w in uniq:
        assert fst.try_match(w) == (True, model[w])
    for w in words:
        probe = w + "x"
        assert fst.try_match(probe) == (
            (True, model[probe]) if probe in model else (False, None)
        )


@given(fst_words)
@settings(max_examples=30, deadline=None)
def test_fst_wildcard_edit_property(words):
    """FST automaton intersection == brute-force matching for random
    vocabularies (duplicates the sorted enumeration contract too)."""
    from fulltextsearch_ray.dfa import EditDfaMatcher, WildcardDfaMatcher
    from fulltextsearch_ray.fst import build_fst
    from fulltextsearch_ray.matchers import wildcard_match

    uniq = sorted(set(words))
    fst = build_fst((w, i) for i, w in enumerate(uniq))
    got = list(fst.match(WildcardDfaMatcher("a*")))
    assert got == [w for w in uniq if wildcard_match("a*", w)]
    got = list(fst.match(EditDfaMatcher("ab", 1)))
    want = [w for w in uniq if _edit_dist(w, "ab") <= 1]
    assert got == want


def _edit_dist(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
