"""Matcher tests — wildcard/edit fixtures from FIXTURES.md §5 and
reference automaton semantics."""

import pyarrow as pa

from fulltextsearch_ray.matchers import (
    expand_pattern,
    levenshtein_mask,
    wildcard_match,
    wildcard_prefix,
    wildcard_to_regex,
)
from fulltextsearch_ray.parser import parse_query


AIRPORTS = sorted(
    [
        "Amsterdam Airport Schiphol",
        "Eindhoven Airport",
        "Groningen Airport Eelde",
        "Maastricht Aachen Airport",
        "Rotterdam The Hague Airport",
        "Schwarzheide/Schipkau Airport",
        "Teuge International Airport",
        "Twente Airport",
    ]
)


def _expand(pattern, terms):
    ast = parse_query(pattern)
    return expand_pattern(ast, pa.array(terms, type=pa.string()))


def test_wildcard_translation():
    # [\s\S] (any char INCLUDING newline), matching the FST path's
    # WildcardDfaMatcher semantics — '.' would diverge on '\n' terms
    assert wildcard_to_regex("ab*c?") == "ab[\\s\\S]*c[\\s\\S]"
    assert wildcard_prefix("abc*def") == "abc"
    assert wildcard_prefix("*x") == ""
    assert wildcard_prefix("plain") == "plain"


def test_wildcard_match_semantics():
    assert wildcard_match("th?s", "this")
    assert wildcard_match("th?s", "thus")
    assert not wildcard_match("th?s", "ths")
    assert wildcard_match("a*b", "ab")
    assert wildcard_match("*", "anything")
    assert not wildcard_match("a?c", "abcd")


def test_fst_fixture_schip():
    got = _expand("WILD(*Schip*)", AIRPORTS)
    assert got == ["Amsterdam Airport Schiphol", "Schwarzheide/Schipkau Airport"]


def test_word_expansion():
    terms = ["a", "ab", "abilities", "ability"]
    assert _expand("WORD(ab)", terms) == ["ab"]
    assert _expand("WORD(zz)", terms) == []


def test_wildcard_prefix_pushdown():
    terms = ["aardvark", "abil", "abilities", "ability", "zebra"]
    assert _expand("WILD(abil*)", terms) == ["abil", "abilities", "ability"]
    assert _expand("WILD(ab?l)", terms) == ["abil"]
    assert _expand("WILD(z*)", terms) == ["zebra"]
    assert _expand("WILD(q*)", terms) == []


def test_levenshtein_mask_basic():
    terms = ["this", "these", "thesis", "thee", "banana", ""]
    mask = levenshtein_mask("these", terms, 2)
    assert mask.tolist() == [True, True, True, True, False, False]
    mask0 = levenshtein_mask("these", terms, 0)
    assert mask0.tolist() == [False, True, False, False, False, False]


def test_edit_expansion_matches_reference_golden():
    # EDIT(these,2) over the 8-doc corpus vocabulary must include all
    # terms the reference golden hits: this(1), test(2), these? —
    # golden matches docs via terms {this, test, tests? ...}; here we
    # check the matcher directly on a term list.
    vocab = ["is", "test", "tests", "this", "the", "there", "joke"]
    mask = levenshtein_mask("these", sorted(vocab), 2)
    got = [t for t, ok in zip(sorted(vocab), mask) if ok]
    assert got == ["test", "the", "there", "this"]


def test_edit_distance_insert_delete():
    assert levenshtein_mask("abc", ["abcde"], 2).tolist() == [True]
    assert levenshtein_mask("abc", ["a"], 2).tolist() == [True]
    assert levenshtein_mask("abc", ["abcdef"], 2).tolist() == [False]
    assert levenshtein_mask("", ["ab"], 2).tolist() == [True]
    assert levenshtein_mask("", ["abc"], 2).tolist() == [False]


def test_prefix_upper_bound_surrogate_gap_and_max_codepoint():
    """Successor of U+D7FF must skip the surrogate block (chr(0xD800)
    is not a valid Arrow string and crashed the range scan); a trailing
    U+10FFFF falls back to the next-shorter prefix's bound."""
    from fulltextsearch_ray.matchers import prefix_upper_bound

    assert prefix_upper_bound("ab") == "ac"
    assert prefix_upper_bound("a퟿") == "a"
    assert prefix_upper_bound("a\U0010ffff") == "b"
    assert prefix_upper_bound("\U0010ffff") is None
    assert prefix_upper_bound("\U0010ffff\U0010ffff") is None
    assert prefix_upper_bound("") is None
    # ordering contract: every string with the prefix sorts below the bound
    for p in ["ab", "a퟿", "a\U0010ffff"]:
        hi = prefix_upper_bound(p)
        assert p < hi and (p + "zzz") < hi


def test_wild_prefix_ending_at_u_d7ff_both_paths():
    """A wildcard whose literal prefix ends in U+D7FF (valid Hangul
    Jamo) must range-scan without crashing, on the Arrow path and the
    numpy path, with identical results."""
    import numpy as np
    import pyarrow as pa

    from fulltextsearch_ray.matchers import expand_pattern
    from fulltextsearch_ray.parser import parse_query

    terms = sorted(["a퟿", "a퟿x", "a", "able", "zz"])
    arr = pa.array(terms, pa.string())
    q = parse_query("WILD(a퟿*)")
    got_arrow = expand_pattern(q, arr)
    got_numpy = expand_pattern(q, arr, np.array(terms, dtype=object))
    assert got_arrow == got_numpy == ["a퟿", "a퟿x"]
