"""Occurrence-kernel tests — posting-list literals from FIXTURES.md §3
(ported from the reference's OrQueryTest / OrMultiQueryTest /
TermQueryTest / PhraseQueryTest)."""

import numpy as np

from fulltextsearch_ray.occurrences import (
    Matches,
    and_docs,
    empty_occurrences,
    format_matches,
    or_merge,
    parse_posting_text,
    phrase_chains,
)


def occ(text):
    return parse_posting_text(text)


def fmt_single(o):
    return format_matches(Matches(o.docs, o.fields, o.tokens, 1))


def test_parse_posting_text():
    o = occ("[3,1,1], [4,1,1], [5,1,1], [50,10,81], [143787543,79815,2124]")
    assert o.docs.tolist() == [3, 4, 5, 50, 143787543]
    assert o.fields.tolist() == [1, 1, 1, 10, 79815]
    assert o.tokens.tolist() == [1, 1, 1, 81, 2124]
    assert fmt_single(o) == "{[3,1,1]}, {[4,1,1]}, {[5,1,1]}, {[50,10,81]}, {[143787543,79815,2124]}"


def test_or_full_interleave():
    left = occ("[1,1,1], [1,1,5], [1,1,10], [1,2,1], [1,3,5], [2,1,2]")
    right = occ("[1,1,2], [1,1,3], [1,1,4], [1,3,1], [1,3,2], [1,3,3], [1,3,4], [2,1,1]")
    merged = or_merge([left, right])
    assert fmt_single(merged) == (
        "{[1,1,1]}, {[1,1,2]}, {[1,1,3]}, {[1,1,4]}, {[1,1,5]}, {[1,1,10]}, "
        "{[1,2,1]}, {[1,3,1]}, {[1,3,2]}, {[1,3,3]}, {[1,3,4]}, {[1,3,5]}, "
        "{[2,1,1]}, {[2,1,2]}"
    )


def test_or_simple_and_swapped():
    left = occ("[1,1,1]")
    right = occ("[1,1,2], [1,1,3]")
    expected = "{[1,1,1]}, {[1,1,2]}, {[1,1,3]}"
    assert fmt_single(or_merge([left, right])) == expected
    assert fmt_single(or_merge([right, left])) == expected


def test_or_null_edges():
    left = occ("[1,1,1]")
    null = empty_occurrences()
    assert fmt_single(or_merge([left, null])) == "{[1,1,1]}"
    assert fmt_single(or_merge([null, left])) == "{[1,1,1]}"
    assert fmt_single(or_merge([null, null])) == ""


def test_or_multi_preserves_duplicates():
    a = occ("[1,1,1]")
    b = occ("[1,1,2]")
    c = occ("[1,1,2], [1,1,3]")
    merged = or_merge([a, b, c])
    assert fmt_single(merged) == "{[1,1,1]}, {[1,1,2]}, {[1,1,2]}, {[1,1,3]}"


def test_phrase_adjacency_basic():
    # "search only" in doc 5: search@3, only@4
    search = occ("[5,1,3]")
    only = occ("[5,1,4]")
    m = phrase_chains([search, only])
    assert format_matches(m) == "{[5,1,3], [5,1,4]}"


def test_phrase_two_docs():
    this = occ("[3,1,1], [4,1,1], [5,1,1], [6,1,8]")
    is_ = occ("[3,1,2], [4,1,4], [6,1,2], [6,1,9]")
    m = phrase_chains([this, is_])
    assert format_matches(m) == "{[3,1,1], [3,1,2]}, {[6,1,8], [6,1,9]}"


def test_phrase_four_words():
    search = occ("[5,1,3]")
    only = occ("[5,1,4]")
    supports = occ("[5,1,5]")
    boolean = occ("[5,1,6]")
    m = phrase_chains([search, only, supports, boolean])
    assert format_matches(m) == "{[5,1,3], [5,1,4], [5,1,5], [5,1,6]}"


def test_phrase_requires_same_field():
    a = occ("[1,1,1]")
    b = occ("[1,2,2]")  # next token but different field
    assert len(phrase_chains([a, b]).docs) == 0


def test_phrase_overlapping_chains():
    # "a a" over tokens 1,2,3 → chains (1,2) and (2,3)
    a1 = occ("[1,1,1], [1,1,2], [1,1,3]")
    a2 = occ("[1,1,1], [1,1,2], [1,1,3]")
    m = phrase_chains([a1, a2])
    assert format_matches(m) == "{[1,1,1], [1,1,2]}, {[1,1,2], [1,1,3]}"


def test_and_docs():
    a = occ("[1,1,1], [2,1,1], [3,1,5]")
    b = occ("[2,1,9], [3,1,1], [4,1,1]")
    assert and_docs([a, b]).tolist() == [2, 3]
    assert and_docs([a, b, empty_occurrences()]).tolist() == []


def test_phrase_chains_duplicate_multiplicity_symmetric():
    """One chain per way of picking one occurrence from each list: a
    duplicate occurrence in ANY list multiplies the chain count (the
    OR operator preserves duplicates, so an OR-merged input can carry
    them; a membership-only probe used to collapse probed-side
    duplicates while keeping first-list ones)."""
    a = occ("[1,1,1]")
    b_dup = or_merge([occ("[1,1,2]"), occ("[1,1,2]")])  # duplicate kept by OR
    m = phrase_chains([a, b_dup])
    assert len(m.docs) == 2  # 1 x 2 chains
    assert format_matches(m) == "{[1,1,1], [1,1,2]}, {[1,1,1], [1,1,2]}"
    # symmetric: duplicate in the FIRST list multiplies the same way
    a_dup = or_merge([occ("[1,1,1]"), occ("[1,1,1]")])
    m2 = phrase_chains([a_dup, occ("[1,1,2]")])
    assert len(m2.docs) == 2
    # 2 x 2 across both lists
    m3 = phrase_chains([a_dup, b_dup])
    assert len(m3.docs) == 4
    # duplicate-free inputs are unchanged
    m4 = phrase_chains([occ("[1,1,1], [1,1,2]"), occ("[1,1,2]")])
    assert format_matches(m4) == "{[1,1,1], [1,1,2]}"
