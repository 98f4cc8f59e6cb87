"""Numpy kernels over occurrence triples ``(doc_id, field_id, token_id)``.

The occurrence is the reference engine's atom (``IndexModels/Occurrence.cs:5-37``):
"term appears as the token_id-th token of field field_id of document
doc_id", totally ordered lexicographically by (doc, field, token).
Here an occurrence *list* is three parallel ``uint64`` arrays, and all
query-algebra operators (OR-merge with duplicates, phrase adjacency,
doc-level AND) are vectorized array kernels instead of the reference's
pull-based iterator states (``Query/OrQuery.cs``, ``Query/PhraseQuery.cs``).

Matches (``IMatch``) are represented as ``(docs, fields, tokens, width)``
where ``width`` is the phrase length: a match covers token positions
``token .. token+width-1``.  ``width == 1`` is a single term match.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

__all__ = [
    "OccurrenceList",
    "Matches",
    "empty_occurrences",
    "lex_sort",
    "or_merge",
    "MixedMatches",
    "or_merge_mixed",
    "phrase_chains",
    "and_docs",
    "format_matches",
    "parse_posting_text",
]


class OccurrenceList(NamedTuple):
    docs: np.ndarray    # uint64
    fields: np.ndarray  # uint64
    tokens: np.ndarray  # uint64


class Matches(NamedTuple):
    docs: np.ndarray
    fields: np.ndarray
    tokens: np.ndarray  # first token of the (phrase) match
    width: int          # number of consecutive occurrences per match


class MixedMatches(NamedTuple):
    """Matches of heterogeneous phrase widths (e.g. OR over SEQ and
    WORD children), ordered by the reference's ``MatchComparer`` —
    lexicographic over occurrence sequences, shorter prefix first.
    Since a width-w match is the consecutive run (d,f,t)…(d,f,t+w-1),
    that order is exactly sort-by ``(doc, field, token, width)``."""

    docs: np.ndarray
    fields: np.ndarray
    tokens: np.ndarray
    widths: np.ndarray  # int64 per match


def or_merge_mixed(subs: "Sequence[Matches | MixedMatches]") -> MixedMatches:
    """N-ary OR over mixed-width match streams, duplicates preserved
    (the reference's OrMultiQuery over arbitrary compiled children)."""
    d_parts, f_parts, t_parts, w_parts = [], [], [], []
    for m in subs:
        if len(m.docs) == 0:
            continue
        d_parts.append(_as_u64(m.docs))
        f_parts.append(_as_u64(m.fields))
        t_parts.append(_as_u64(m.tokens))
        if isinstance(m, MixedMatches):
            w_parts.append(np.asarray(m.widths, dtype=np.int64))
        else:
            w_parts.append(np.full(len(m.docs), m.width, dtype=np.int64))
    if not d_parts:
        e = np.empty(0, dtype=np.uint64)
        return MixedMatches(e, e.copy(), e.copy(), np.empty(0, dtype=np.int64))
    d = np.concatenate(d_parts)
    f = np.concatenate(f_parts)
    t = np.concatenate(t_parts)
    w = np.concatenate(w_parts)
    order = np.lexsort((w, t, f, d))
    return MixedMatches(d[order], f[order], t[order], w[order])


def empty_occurrences() -> OccurrenceList:
    z = np.empty(0, dtype=np.uint64)
    return OccurrenceList(z.copy(), z.copy(), z.copy())


def _as_u64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.uint64))


def _key_view(docs, fields, tokens) -> np.ndarray:
    """Big-endian packed (d,f,t) rows viewed as opaque 24-byte keys.

    Big-endian byte order makes bytewise void comparison equal to
    numeric lexicographic order, so sort/searchsorted/unique on the
    view implement the reference's occurrence total order exactly —
    for arbitrary 64-bit ids (no bit-packing overflow).
    """
    n = len(docs)
    rec = np.empty(n, dtype=[("d", ">u8"), ("f", ">u8"), ("t", ">u8")])
    rec["d"] = docs
    rec["f"] = fields
    rec["t"] = tokens
    return rec.view("V24")


def lex_sort(occ: OccurrenceList) -> OccurrenceList:
    """Sort occurrences by (doc, field, token) — the global match order."""
    order = np.lexsort((occ.tokens, occ.fields, occ.docs))
    return OccurrenceList(occ.docs[order], occ.fields[order], occ.tokens[order])


def _is_lex_sorted(d: np.ndarray, f: np.ndarray, t: np.ndarray) -> bool:
    """O(n) check that (doc, field, token) is already non-decreasing —
    query-path inputs (cached postings, _eval outputs) always are, so
    the single-input merges can skip an O(n log n) re-sort."""
    if len(d) < 2:
        return True
    asc = (d[1:] > d[:-1]) | (
        (d[1:] == d[:-1])
        & ((f[1:] > f[:-1]) | ((f[1:] == f[:-1]) & (t[1:] >= t[:-1])))
    )
    return bool(asc.all())


def or_merge(lists: Sequence[OccurrenceList]) -> OccurrenceList:
    """N-ary OR: ordered union that PRESERVES duplicates.

    Matches the reference's OrQuery/OrMultiQuery semantics
    (``Query/OrMultiQueryTest.cs:21-32`` — equal occurrences from
    different branches are each emitted).  Equal triples are mutually
    indistinguishable, so concat + stable lexsort reproduces the
    streamed merge order.
    """
    lists = [l for l in lists if len(l.docs)]
    if not lists:
        return empty_occurrences()
    if len(lists) == 1:
        # single-branch OR (every exact WORD query): the cached posting
        # list is already in match order — skip the O(n log n) re-sort
        l = OccurrenceList(_as_u64(lists[0].docs), _as_u64(lists[0].fields), _as_u64(lists[0].tokens))
        if _is_lex_sorted(l.docs, l.fields, l.tokens):
            return l
        return lex_sort(l)
    docs = np.concatenate([_as_u64(l.docs) for l in lists])
    fields = np.concatenate([_as_u64(l.fields) for l in lists])
    tokens = np.concatenate([_as_u64(l.tokens) for l in lists])
    return lex_sort(OccurrenceList(docs, fields, tokens))


def phrase_chains(lists: Sequence[OccurrenceList]) -> Matches:
    """SEQ: n-way positional adjacency intersection.

    Emits every chain of occurrences ``o_1..o_n`` (one from each input
    list) with equal (doc, field) and consecutive token ids — including
    overlapping chains — which is what the reference's leapfrog
    produces (``Query/PhraseQuery.cs:28-70``; goldens in
    ``Query/PhraseQueryTest.cs``).  Vectorized as an iterative
    semi-join on the packed (doc, field, token+i) key.
    """
    n = len(lists)
    if n == 0 or any(len(l.docs) == 0 for l in lists):
        return Matches(*empty_occurrences(), width=max(n, 1))
    d = _as_u64(lists[0].docs)
    f = _as_u64(lists[0].fields)
    t = _as_u64(lists[0].tokens)
    for i in range(1, n):
        li = lists[i]
        keys = np.sort(_key_view(_as_u64(li.docs), _as_u64(li.fields), _as_u64(li.tokens)))
        probe = _key_view(d, f, t + np.uint64(i))
        # multiplicity-preserving semi-join: a duplicate occurrence in
        # EITHER list multiplies the chain count (one chain per way of
        # picking one occurrence from each list) — term posting lists
        # are duplicate-free, but OR-merged inputs keep duplicates and
        # a membership-only probe would collapse them asymmetrically
        cnt = np.searchsorted(keys, probe, side="right") - np.searchsorted(
            keys, probe, side="left"
        )
        mask = cnt > 0
        if not mask.any():
            d, f, t = d[:0], f[:0], t[:0]
            break
        rep = cnt[mask]
        d, f, t = np.repeat(d[mask], rep), np.repeat(f[mask], rep), np.repeat(t[mask], rep)
    if _is_lex_sorted(d, f, t):
        # masking + repeat preserve list-0's order, which callers feed
        # sorted — the closing sort is usually a skippable no-op
        return Matches(d, f, t, width=n)
    out = lex_sort(OccurrenceList(d, f, t))
    return Matches(out.docs, out.fields, out.tokens, width=n)


def and_docs(lists: Sequence[OccurrenceList]) -> np.ndarray:
    """Doc-level conjunction: sorted doc ids present in every list.

    AND is parsed-but-unimplemented in the reference
    (``FullTextQueryCompiler.cs`` throws NotSupported); this is our
    documented surface extension (SURVEY.md §7.0.2), also used by the
    conjunctive BM25 mode.
    """
    if not lists:
        return np.empty(0, dtype=np.uint64)
    out = np.unique(_as_u64(lists[0].docs))
    for l in lists[1:]:
        out = np.intersect1d(out, np.unique(_as_u64(l.docs)), assume_unique=True)
        if len(out) == 0:
            break
    return out


def format_matches(m: "Matches | MixedMatches") -> str:
    """Reference conformance string: ``{[d,f,t]}, {[d,f,t], [d,f,t+1]}``.

    Same rendering as the reference's ``ExecuteToString`` /
    ``SequenceMatch.ToString`` used by its golden tests
    (``SearchTest.cs:29-41``, FIXTURES.md §2).
    """
    if isinstance(m, MixedMatches):
        widths = m.widths.tolist()
    else:
        widths = [m.width] * len(m.docs)
    parts = []
    for d, f, t, w in zip(m.docs.tolist(), m.fields.tolist(), m.tokens.tolist(), widths):
        inner = ", ".join(f"[{d},{f},{t + k}]" for k in range(w))
        parts.append("{" + inner + "}")
    return ", ".join(parts)


def parse_posting_text(text: str) -> OccurrenceList:
    """Parse the reference's text posting format ``[d,f,t], [d,f,t]...``

    (``IndexTypes/Common/PostingListArray.cs:30-41``) — used to load
    the ported operator-unit-test fixtures.
    """
    triples = []
    for chunk in text.split("],"):
        chunk = chunk.strip().strip("[]")
        if not chunk:
            continue
        d, f, t = (int(x) for x in chunk.split(","))
        triples.append((d, f, t))
    if not triples:
        return empty_occurrences()
    arr = np.array(triples, dtype=np.uint64)
    return OccurrenceList(arr[:, 0].copy(), arr[:, 1].copy(), arr[:, 2].copy())
