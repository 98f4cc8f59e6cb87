"""Term-dictionary pattern matchers: WORD / WILD / EDIT expansion.

The reference drives backtracking DFAs over a trie/FST
(``Automata/Wildcard/AutomatonWildcard.cs``, ``Automata/Levenshtein/*``,
``Collections/TernaryDictionary.cs:182-240``).  In the Ray-Data design
the dictionary is a **sorted Arrow term column** (the segment catalog),
so matchers become vectorized column kernels:

* WORD  — binary search / equality on the sorted term column;
* WILD  — literal-prefix pushdown (range scan on the sorted column)
  followed by an anchored-regex kernel (``*``→``.*``, ``?``→``.``,
  everything else literal — same language as ``AutomatonWildcard``);
* EDIT  — length-band prefilter then a fully vectorized Levenshtein
  DP over all candidate terms at once (2D numpy; classic ins/del/sub
  distance, no transpositions — same metric as
  ``Automata/Levenshtein/AutomatonLevenshtein.cs``).

Expansion returns matching terms in sorted (ordinal) order, the order
the reference's dictionary enumerates (SURVEY.md §2.5).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .parser import AstQuery, EditQuery, WildQuery, WordQuery

__all__ = [
    "wildcard_to_regex",
    "wildcard_prefix",
    "wildcard_match",
    "prefix_upper_bound",
    "expand_pattern",
    "levenshtein_mask",
]


def wildcard_to_regex(pattern: str) -> str:
    """Translate a WILD pattern to an anchored Python regex.

    ``*`` → ``.*``, ``?`` → ``.``; all other characters literal.  Like
    the reference's runtime (which builds the NFA from the *unescaped*
    value, ``FullTextQueryCompiler.cs`` BuildWildcardMatcher), escape
    information is not preserved — ``*``/``?`` are always wildcards.
    """
    parts = []
    for ch in pattern:
        if ch == "*":
            # [\s\S], not '.': the FST path's WildcardDfaMatcher matches
            # ANY character incl. newline — the two documented-equivalent
            # paths must agree on terms containing '\n' (unreachable via
            # the tokenizer today, but nothing here enforces that)
            parts.append("[\\s\\S]*")
        elif ch == "?":
            parts.append("[\\s\\S]")
        else:
            parts.append(re.escape(ch))
    return "".join(parts)


def wildcard_prefix(pattern: str) -> str:
    """Longest literal prefix before the first wildcard char (pushdown)."""
    for i, ch in enumerate(pattern):
        if ch in "*?":
            return pattern[:i]
    return pattern


def wildcard_match(pattern: str, text: str) -> bool:
    return re.fullmatch(wildcard_to_regex(pattern), text) is not None


def prefix_upper_bound(prefix: str) -> "str | None":
    """Smallest valid string GREATER than every string starting with
    ``prefix`` (exclusive upper key for a sorted range scan), or None
    when no such key exists.  The successor of U+D7FF skips the
    surrogate block D800-DFFF — lone surrogates are not valid
    Python/Arrow string codepoints (``chr(0xD800)`` crashes Arrow
    kernels) and no valid string sorts inside the gap; a trailing
    U+10FFFF has no single-codepoint successor, so the bound comes
    from the next-shorter prefix."""
    while prefix and prefix[-1] == "\U0010ffff":
        prefix = prefix[:-1]
    if not prefix:
        return None
    c = ord(prefix[-1])
    return prefix[:-1] + chr(0xE000 if c == 0xD7FF else c + 1)


def _terms_to_codepoint_matrix(terms: list[str], width: int) -> tuple[np.ndarray, np.ndarray]:
    """(n_terms, width) int32 codepoint matrix (-1 padded) + lengths."""
    n = len(terms)
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=n)
    mat = np.full((n, width), -1, dtype=np.int32)
    for i, t in enumerate(terms):
        lt = min(len(t), width)
        mat[i, :lt] = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)[:lt]
    return mat, lens


def levenshtein_mask(query: str, terms: list[str], k: int) -> np.ndarray:
    """Vectorized edit-distance filter: True where dist(query, term) <= k.

    One DP over ALL candidate terms simultaneously: state is an
    (n_terms, len(query)+1) distance matrix advanced once per term
    character column — no per-term Python loop.
    """
    n = len(terms)
    if n == 0:
        return np.zeros(0, dtype=bool)
    q = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    m = len(q)
    max_len = max((len(t) for t in terms), default=0)
    mat, lens = _terms_to_codepoint_matrix(terms, max_len)

    # dp[i, j] = distance(term_i[:step], query[:j])
    dp = np.broadcast_to(np.arange(m + 1, dtype=np.int64), (n, m + 1)).copy()
    result = np.zeros(n, dtype=bool)
    # terms of length 0..: record rows as their length is reached
    result |= (lens == 0) & (m <= k)
    for step in range(1, max_len + 1):
        c = mat[:, step - 1]  # (n,)
        prev = dp
        dp = np.empty_like(prev)
        dp[:, 0] = step
        sub_cost = (c[:, None] != q[None, :]).astype(np.int64)
        # dp[:, j] = min(prev[:, j] + 1, prev[:, j-1] + sub, dp[:, j-1] + 1)
        cand = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + sub_cost)
        # the dp[:, j-1] + 1 dependency is a running minimum along j:
        # dp[:,j] = min(cand[:,j-1], dp[:,j-1]+1) — do a left-to-right
        # scan; m is tiny (query length), so this loop is over query
        # chars only, vectorized across all terms.
        for j in range(1, m + 1):
            dp[:, j] = np.minimum(cand[:, j - 1], dp[:, j - 1] + 1)
        done = lens == step
        if done.any():
            result[done] = dp[done, m] <= k
        # early exit: all active rows already exceeded k everywhere
        active = lens > step
        if not active.any():
            break
        if (dp[active].min(axis=1) > k).all():
            # no active term can come back under k
            break
    return result


def expand_pattern(
    ast: AstQuery,
    terms: pa.ChunkedArray | pa.Array,
    terms_np: "np.ndarray | None" = None,
) -> list[str]:
    """Expand a terminal pattern AST over a SORTED term column.

    Returns matching terms in ordinal order — the reference's
    dictionary enumeration order (terms arrive sorted from the trie
    walk, ``FullTextQueryCompiler.cs`` → ``GetTerms``).

    ``terms_np`` is an optional numpy object view of the SAME sorted
    column (e.g. cached by ``IndexSearcher``): with it, WORD lookup and
    the WILD prefix range become O(log vocab) binary searches instead
    of O(vocab) column scans.
    """
    if isinstance(ast, WordQuery):
        # exact membership (no lowercasing — reference matches raw value)
        if terms_np is not None:
            i = int(np.searchsorted(terms_np, ast.value))
            found = i < len(terms_np) and terms_np[i] == ast.value
        else:
            found = pc.any(pc.equal(terms, ast.value)).as_py()
        return [ast.value] if found else []
    if isinstance(ast, WildQuery):
        prefix = wildcard_prefix(ast.value)
        candidates = terms
        if prefix:
            # range scan on the sorted column: [prefix, prefix+￿...)
            hi_key = prefix_upper_bound(prefix)
            if terms_np is not None:
                lo = int(np.searchsorted(terms_np, prefix))
                hi = int(np.searchsorted(terms_np, hi_key)) if hi_key is not None else len(terms_np)
                if hi <= lo:
                    return []
                candidates = candidates.slice(lo, hi - lo)
            else:
                lo = int(pc.index(pc.greater_equal(candidates, prefix), True).as_py())
                if lo < 0:
                    return []
                arr = candidates.slice(lo)
                if hi_key is not None:
                    above = pc.index(pc.greater_equal(arr, hi_key), True).as_py()
                    if above >= 0:
                        arr = arr.slice(0, above)
                candidates = arr
        pat = wildcard_to_regex(ast.value)
        mask = pc.match_substring_regex(candidates, f"^(?:{pat})$")
        return candidates.filter(mask).to_pylist()
    if isinstance(ast, EditQuery):
        # length-band prefilter: |len(term) - len(q)| <= k
        lens = pc.utf8_length(terms)
        band = pc.and_(
            pc.greater_equal(lens, max(len(ast.value) - ast.distance, 0)),
            pc.less_equal(lens, len(ast.value) + ast.distance),
        )
        cands = terms.filter(band).to_pylist()
        mask = levenshtein_mask(ast.value, cands, ast.distance)
        return [t for t, ok in zip(cands, mask) if ok]
    raise TypeError(f"not a terminal pattern: {ast!r}")
