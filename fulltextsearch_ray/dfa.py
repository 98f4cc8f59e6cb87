"""Stack-based DFA matchers for dictionary-automaton intersection.

The FST (:mod:`fulltextsearch_ray.fst`) enumerates exactly the terms a
matcher accepts by walking dictionary arcs while the matcher advances
in lock-step.  Protocol (the reference's ``IDfaMatcher<char>``,
``Src/Protsyk.PMS.FullText.Core/Common/Automata/AutomataMatcher.cs`` —
behavior observed, no code copied):

* ``next(ch) -> bool`` — try consuming ``ch``; on success the matcher
  pushes its new state and returns True, on failure state is unchanged
  (nothing to pop).
* ``pop()`` — undo the most recent successful ``next``.
* ``is_final() -> bool`` — does the consumed prefix form an accepted
  word?
* ``reset()`` — back to the start state.

Matchers here simulate NFAs directly (position bitsets / DP rows) —
no subset-construction blowup, states are O(pattern length) ints.
Same query language as :mod:`fulltextsearch_ray.matchers` (``*``/``?``
wildcards always active; edit distance = Levenshtein).
"""

from __future__ import annotations

__all__ = [
    "AnyDfaMatcher",
    "SequenceDfaMatcher",
    "WildcardDfaMatcher",
    "EditDfaMatcher",
    "matcher_for",
]


class SequenceDfaMatcher:
    """Fixed-sequence matcher (reference ``Collections/SequenceMatcher.cs``
    — behavior observed, no code copied): accepts exactly ``seq``, or —
    with ``accept_prefixes=True`` — every string that STARTS WITH
    ``seq`` (the consumed input may run past the sequence freely).

    This is the cheap walker for the two anchored dictionary scans:
    WORD dispatch (the reference query compiler wraps every WordQuery
    in ``SequenceMatcher(word, false)`` —
    ``IndexTypes/FullTextQueryCompiler.cs:115``) and pure-prefix WILD
    patterns (``abc*``), where the O(pattern) bitset NFA per character
    is wasted work: this matcher advances in O(1)."""

    def __init__(self, seq: str, accept_prefixes: bool = False):
        self.seq = seq
        self.accept_prefixes = accept_prefixes
        self._idx = 0  # chars consumed

    def reset(self) -> None:
        self._idx = 0

    def next(self, ch: str) -> bool:
        i = self._idx
        if i >= len(self.seq):
            if not self.accept_prefixes:
                return False
            self._idx = i + 1  # past the sequence: any char extends
            return True
        if self.seq[i] == ch:
            self._idx = i + 1
            return True
        return False

    def pop(self) -> None:
        self._idx -= 1

    def is_final(self) -> bool:
        if self.accept_prefixes:
            return self._idx >= len(self.seq)
        return self._idx == len(self.seq)


class AnyDfaMatcher:
    """Accepts every string up to ``max_len`` (the dump/AnyMatcher path,
    reference ``NullQuery``/dump enumeration)."""

    def __init__(self, max_len: int = 1 << 30):
        self.max_len = max_len
        self._depth = 0

    def reset(self) -> None:
        self._depth = 0

    def next(self, ch: str) -> bool:
        if self._depth >= self.max_len:
            return False
        self._depth += 1
        return True

    def pop(self) -> None:
        self._depth -= 1

    def is_final(self) -> bool:
        return True


class WildcardDfaMatcher:
    """NFA simulation of a ``*``/``?`` wildcard pattern.

    State = bitset of pattern positions (bit i ⇒ pattern[i:] still has
    to match); ``*`` closure advances for free.  Mirrors the language
    of the reference's ``AutomatonWildcard`` (Automata/Wildcard) and of
    :func:`fulltextsearch_ray.matchers.wildcard_to_regex`."""

    def __init__(self, pattern: str, max_len: int = 1 << 30):
        self.pattern = pattern
        self.max_len = max_len
        self._m = len(pattern)
        self._star = [i for i, c in enumerate(pattern) if c == "*"]
        start = self._closure(1)  # bit 0 = position 0
        self._stack = [start]

    def _closure(self, mask: int) -> int:
        # epsilon: a '*' position may advance without consuming
        changed = True
        while changed:
            changed = False
            for i in self._star:
                if mask & (1 << i) and not mask & (1 << (i + 1)):
                    mask |= 1 << (i + 1)
                    changed = True
        return mask

    def reset(self) -> None:
        del self._stack[1:]

    def next(self, ch: str) -> bool:
        if len(self._stack) - 1 >= self.max_len:
            return False
        mask = self._stack[-1]
        m = self._m
        pat = self.pattern
        new = 0
        probe = mask
        while probe:
            i = (probe & -probe).bit_length() - 1
            probe &= probe - 1
            if i >= m:
                continue
            c = pat[i]
            if c == "*":
                new |= 1 << i  # star consumes and stays
            elif c == "?" or c == ch:
                new |= 1 << (i + 1)
        if not new:
            return False
        new = self._closure(new)
        self._stack.append(new)
        return True

    def pop(self) -> None:
        self._stack.pop()

    def is_final(self) -> bool:
        return bool(self._stack[-1] & (1 << self._m))


class EditDfaMatcher:
    """Levenshtein-automaton simulation: accepts strings within edit
    distance ``k`` of ``term`` (reference Automata/Levenshtein).

    State = one DP row (distance of the consumed prefix to every prefix
    of ``term``), capped at ``k + 1`` so the state space is finite;
    fails fast when the whole row exceeds ``k``."""

    def __init__(self, term: str, k: int):
        self.term = term
        self.k = k
        cap = k + 1
        self._stack = [tuple(min(j, cap) for j in range(len(term) + 1))]

    def reset(self) -> None:
        del self._stack[1:]

    def next(self, ch: str) -> bool:
        row = self._stack[-1]
        t = self.term
        k = self.k
        cap = k + 1
        prev = row[0]
        first = min(prev + 1, cap)
        new = [first]
        best = first
        append = new.append
        for j in range(1, len(row)):
            cur = row[j]
            v = prev if ch == t[j - 1] else prev + 1
            if cur + 1 < v:
                v = cur + 1
            if new[j - 1] + 1 < v:
                v = new[j - 1] + 1
            if v > cap:
                v = cap
            append(v)
            if v < best:
                best = v
            prev = cur
        if best > k:
            return False
        self._stack.append(tuple(new))
        return True

    def pop(self) -> None:
        self._stack.pop()

    def is_final(self) -> bool:
        return self._stack[-1][-1] <= self.k


def matcher_for(
    ast,
) -> "AnyDfaMatcher | SequenceDfaMatcher | WildcardDfaMatcher | EditDfaMatcher":
    """Terminal pattern AST → DFA matcher (same dispatch as
    ``matchers.expand_pattern`` and the reference query compiler).
    WORD → exact sequence walk (the FST usually resolves it via
    ``try_match`` before reaching here); WILD that is a pure prefix
    pattern (one trailing ``*``, no other wildcards) → prefix-accepting
    sequence walk (O(1) per char instead of the bitset NFA); general
    WILD → NFA; EDIT → Levenshtein rows."""
    from .parser import EditQuery, WildQuery, WordQuery

    if isinstance(ast, WordQuery):
        return SequenceDfaMatcher(ast.value)
    if isinstance(ast, WildQuery):
        v = ast.value
        if v.endswith("*") and "?" not in v and "*" not in v[:-1]:
            return SequenceDfaMatcher(v[:-1], accept_prefixes=True)
        return WildcardDfaMatcher(v)
    if isinstance(ast, EditQuery):
        return EditDfaMatcher(ast.value, ast.distance)
    raise TypeError(f"not a terminal pattern: {ast!r}")
