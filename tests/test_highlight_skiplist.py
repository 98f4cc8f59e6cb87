"""Highlight (TextDocument.Annotate semantics) and SkipList.LowerBound
seek tests — incl. the reference benchmark's probe protocol."""

import numpy as np

from fulltextsearch_ray.codecs import SkipList, format_posting_text
from fulltextsearch_ray.functions.highlight import annotate
from fulltextsearch_ray.occurrences import parse_posting_text


def test_annotate_uppercases_hits():
    text = "This is test document for search unit tests"
    # hits at token ids 1 and 6 ("this", "search")
    assert annotate(text, [1, 6]) == "THIS is test document for SEARCH unit tests"


def test_annotate_preserves_punctuation():
    text = "Hello, World! Hello again."
    assert annotate(text, [2]) == "Hello, WORLD! Hello again."
    assert annotate(text, []) == text


def test_annotate_hyphen_token():
    text = "full-text search"
    assert annotate(text, [1]) == "FULL-TEXT search"


def test_format_posting_text_roundtrip():
    s = "[1,1,1], [1,2,5], [143787543,79815,2124]"
    occ = parse_posting_text(s)
    assert format_posting_text(occ.docs, occ.fields, occ.tokens) == s


def test_skiplist_lower_bound_probes():
    # reference benchmark protocol: occurrences (1,1,1000+i), probes at
    # hit / before-range / after-range (ConsoleUtil/Program.cs:158-204)
    n = 10_000
    sl = SkipList(
        np.ones(n, dtype=np.uint64),
        np.ones(n, dtype=np.uint64),
        np.arange(1000, 1000 + n, dtype=np.uint64),
    )
    assert sl.lower_bound(1, 1, 1500) == 500   # hit
    assert sl.lower_bound(1, 1, 1) == 0        # before range
    assert sl.lower_bound(1, 1, 99999) == n    # after range
    assert sl.lower_bound(0) == 0
    assert sl.lower_bound(2) == n


def test_skiplist_multi_doc():
    occ = parse_posting_text("[1,1,1], [1,1,5], [2,1,2], [5,3,7]")
    sl = SkipList(occ.docs, occ.fields, occ.tokens)
    assert sl.lower_bound(1, 1, 2) == 1
    assert sl.lower_bound(2) == 2
    assert sl.lower_bound(3) == 3
    assert sl.lower_bound(5, 3, 8) == 4
