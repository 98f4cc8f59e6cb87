"""Variable-length character encodings for dictionary keys — the
reference's C7 text-encoding family (``Common/Compression/``:
``HuffmanEncodingBuilder``, ``HuTuckerBuilder`` /
``HuTuckerSimpleBuilder``, ``BalancedByWeightBuilder``,
``VarLenCharEncoding`` — behavior observed, no code copied).

Three prefix-free char codes over an observed alphabet + a terminal
symbol (``\\x00``) that marks end-of-string inside packed bytes:

- ``huffman`` — minimum-redundancy code (bit-length optimal, order NOT
  preserved).
- ``hutucker`` — optimal ALPHABETIC code: codewords of
  alphabetically-ordered symbols are themselves in lexicographic
  order, so ENCODED keys sort exactly like the source strings — range
  scans and lower-bound seeks work directly on encoded bytes.
  Computed with the interval DP for optimal alphabetic binary trees
  (numpy-vectorized inner minimization; alphabets are char-scale so
  O(n³) flops are trivial).
- ``balanced`` — Shannon-Fano-style split by cumulative weight over
  the alphabetic symbol order (also order-preserving, not optimal).

The main serving path stores the term dictionary as Parquet
(dictionary+zstd — SURVEY §1.5); these codecs exist for format-matrix
parity and for the opt-in packed-key representation
(:func:`encode_sorted_terms`), whose order-preservation is tested.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

TERMINAL = "\x00"

Bits = tuple[int, ...]


# ---------------------------------------------------------------------------
# code builders: symbol->frequency  →  symbol->bit tuple
# ---------------------------------------------------------------------------


def build_huffman(freqs: dict[str, int]) -> dict[str, Bits]:
    """Classic Huffman with deterministic tie-breaking (weight, then
    insertion order; first-popped subtree becomes the 0 branch)."""
    _check_freqs(freqs)
    heap: list[tuple[int, int, object]] = []
    for i, (sym, f) in enumerate(sorted(freqs.items())):
        heapq.heappush(heap, (int(f), i, sym))
    next_id = len(heap)
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, next_id, (n1, n2)))
        next_id += 1
    codes: dict[str, Bits] = {}
    # iterative walk: a skewed tree's depth equals the longest code,
    # which exceeds Python's recursion limit on 1000+-symbol alphabets
    stack: list[tuple[object, Bits]] = [(heap[0][2], ())]
    while stack:
        node, prefix = stack.pop()
        if isinstance(node, str):
            codes[node] = prefix or (0,)  # single-symbol alphabet edge case
        else:
            stack.append((node[1], prefix + (1,)))
            stack.append((node[0], prefix + (0,)))
    return codes


def build_balanced(freqs: dict[str, int]) -> dict[str, Bits]:
    """Shannon-Fano-style: recursively split the ALPHABETICALLY ordered
    symbol run where cumulative weight balances — order-preserving."""
    _check_freqs(freqs)
    syms = sorted(freqs)
    w = np.array([freqs[s] for s in syms], dtype=np.float64)
    cum = np.concatenate([[0.0], np.cumsum(w)])
    codes: dict[str, Bits] = {}
    # iterative (depth = code length; see build_huffman)
    stack: list[tuple[int, int, Bits]] = [(0, len(syms), ())]
    while stack:
        lo, hi, prefix = stack.pop()
        if hi - lo == 1:
            codes[syms[lo]] = prefix or (0,)
            continue
        total = cum[hi] - cum[lo]
        # cut index minimizing |left - right| with both sides non-empty
        lefts = cum[lo + 1 : hi] - cum[lo]
        cut = lo + 1 + int(np.argmin(np.abs(2 * lefts - total)))
        stack.append((cut, hi, prefix + (1,)))
        stack.append((lo, cut, prefix + (0,)))
    return codes


def build_hutucker(freqs: dict[str, int]) -> dict[str, Bits]:
    """Optimal alphabetic prefix code (Hu-Tucker cost) via the interval
    DP for optimal alphabetic binary trees.

    ``cost[i,j]`` = optimal external-path weight of a tree over leaves
    ``i..j-1`` = ``min_k cost[i,k] + cost[k,j]`` + total weight.  The
    inner minimization over ``k`` is one vectorized numpy pass per
    ``(i, length)`` — n≤ a few thousand symbols is instant."""
    _check_freqs(freqs)
    syms = sorted(freqs)
    n = len(syms)
    if n == 1:
        return {syms[0]: (0,)}
    w = np.array([freqs[s] for s in syms], dtype=np.float64)
    cum = np.concatenate([[0.0], np.cumsum(w)])
    INF = np.inf
    cost = np.full((n + 1, n + 1), INF)
    cut = np.zeros((n + 1, n + 1), dtype=np.int64)
    for i in range(n):
        cost[i, i + 1] = 0.0  # a single leaf costs nothing beyond its weight path
    for span in range(2, n + 1):
        for i in range(0, n - span + 1):
            j = i + span
            ks = np.arange(i + 1, j)
            totals = cost[i, ks] + cost[ks, j]
            best = int(np.argmin(totals))
            cost[i, j] = totals[best] + (cum[j] - cum[i])
            cut[i, j] = ks[best]
    codes: dict[str, Bits] = {}
    # iterative (depth = code length; see build_huffman)
    stack: list[tuple[int, int, Bits]] = [(0, n, ())]
    while stack:
        i, j, prefix = stack.pop()
        if j - i == 1:
            codes[syms[i]] = prefix or (0,)
            continue
        k = int(cut[i, j])
        stack.append((k, j, prefix + (1,)))
        stack.append((i, k, prefix + (0,)))
    return codes


def _check_freqs(freqs: dict[str, int]) -> None:
    if not freqs:
        raise ValueError("empty frequency table")
    for s in freqs:
        if len(s) != 1:
            raise ValueError(f"symbols must be single characters, got {s!r}")


BUILDERS = {
    "huffman": build_huffman,
    "hutucker": build_hutucker,
    "balanced": build_balanced,
}


# ---------------------------------------------------------------------------
# encoding object: text ↔ packed bits with terminal symbol
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VarLenTextEncoding:
    codes: dict[str, Bits]

    @classmethod
    def from_frequencies(cls, freqs: dict[str, int], builder: str = "hutucker") -> "VarLenTextEncoding":
        f = dict(freqs)
        f.setdefault(TERMINAL, 1)
        return cls(BUILDERS[builder](f))

    @classmethod
    def from_text(cls, text: str, builder: str = "hutucker") -> "VarLenTextEncoding":
        freqs: dict[str, int] = {}
        for ch in text:
            freqs[ch] = freqs.get(ch, 0) + 1
        return cls.from_frequencies(freqs, builder)

    @classmethod
    def from_codes(cls, codes: dict[str, Bits]) -> "VarLenTextEncoding":
        """Reconstruct from an explicit codebook (reference
        ``VarLenCharEncoding.FromCodes``) — validates prefix-freedom."""
        seen = sorted("".join(map(str, bits)) for bits in codes.values())
        for a, b in zip(seen, seen[1:]):
            if b.startswith(a):
                raise ValueError(f"code {a} is a prefix of {b}: not prefix-free")
        return cls(dict(codes))

    def encode_bits(self, value: str, *, terminated: bool = True) -> Bits:
        if TERMINAL in value:
            # the in-band terminal would truncate decode mid-string and
            # collide distinct keys ('a\x00b' == 'a\x00c' packed)
            raise ValueError("cannot encode text containing the NUL terminal character")
        out: list[int] = []
        for ch in value:
            out.extend(self.codes[ch])
        if terminated:
            out.extend(self.codes[TERMINAL])
        return tuple(out)

    def encode(self, value: str) -> bytes:
        """Pack ``value``'s bits (+ terminal code) into bytes, zero
        padded — the reference's ``EncodeBits`` layout (MSB first)."""
        bits = np.array(self.encode_bits(value), dtype=np.uint8)
        return np.packbits(bits).tobytes()

    def decode(self, data: bytes | Bits) -> str:
        """Decode packed bytes (stop at terminal) or a raw bit tuple
        (consume fully, no terminal required — reference ``Decode``)."""
        stop_at_terminal = isinstance(data, (bytes, bytearray))
        if stop_at_terminal:
            bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        else:
            bits = np.asarray(data, dtype=np.uint8)
        # walk a decoding trie built lazily from the codebook
        trie = self._trie()
        out: list[str] = []
        node = trie
        for b in bits:
            node = node[int(b)]
            if node is None:
                raise ValueError("invalid bit sequence: no symbol on this path")
            if isinstance(node, str):
                if stop_at_terminal and node == TERMINAL:
                    return "".join(out)
                out.append(node)
                node = trie
        if stop_at_terminal:
            raise ValueError("no terminal symbol found in encoded data")
        if node is not trie:
            raise ValueError("truncated bit sequence: ends mid-codeword")
        return "".join(out)

    def _trie(self):
        if not hasattr(self, "_trie_cache"):
            root: list = [None, None]
            for sym, bits in self.codes.items():
                node = root
                for b in bits[:-1]:
                    if node[b] is None:
                        node[b] = [None, None]
                    node = node[b]
                node[bits[-1]] = sym
            object.__setattr__(self, "_trie_cache", root)
        return self._trie_cache

    def mean_bits_per_char(self, freqs: dict[str, int]) -> float:
        total = sum(freqs.values())
        return sum(len(self.codes[s]) * f for s, f in freqs.items() if s in self.codes) / total


# ---------------------------------------------------------------------------
# dictionary-key application
# ---------------------------------------------------------------------------


def encode_sorted_terms(terms: list[str], builder: str = "hutucker") -> tuple[VarLenTextEncoding, list[bytes]]:
    """Encode a SORTED term list with an order-preserving code.  With
    ``hutucker``/``balanced`` the returned PACKED byte strings compare
    in the same order as the terms (tested property), so a packed-key
    term dictionary still supports binary search and prefix range
    scans.  (Terminated encodings are mutually prefix-free, so the
    first differing bit of two distinct keys always lands inside real
    bits of both — zero padding can neither flip an order nor collide
    two keys.)"""
    freqs: dict[str, int] = {}
    for t in terms:
        for ch in t:
            freqs[ch] = freqs.get(ch, 0) + 1
    enc = VarLenTextEncoding.from_frequencies(freqs, builder)
    return enc, [enc.encode(t) for t in terms]


# ---------------------------------------------------------------------------
# encoded-byte-space DFA matching (reference DecodingMatcher*)
# ---------------------------------------------------------------------------


class DecodingDfaMatcher:
    """Byte-space DFA matcher: runs a CHAR matcher directly over
    bit-packed :class:`VarLenTextEncoding` keys — wildcard/edit
    matching over the compressed dictionary without decoding it.

    Behavioral reference: ``DecodingMatcherForVarLenCharEncoding``
    (``Src/.../Common/Compression/DecodingMatcherForVarLenCharEncoding.cs``,
    used by ``PersistentDictionaryTst.GetTerms`` — behavior observed, no
    code copied).  ``next(byte)`` feeds 8 bits through the decode trie;
    every completed symbol advances the inner char matcher; a failed
    char step (or an invalid code path) unwinds the partial byte and
    reports False with state unchanged.

    Padding rule (tightened vs the reference, which feeds whatever the
    zero padding happens to decode): once the TERMINAL symbol decodes,
    the key is complete — remaining bits are ignored and the match
    outcome freezes, so zero padding can never push spurious symbols
    into the matcher.  ``is_final()`` is True only once the terminal
    has been seen with the inner matcher final at that point."""

    def __init__(self, matcher, encoding: VarLenTextEncoding):
        self.m = matcher
        self._root = encoding._trie()
        # per consumed byte: (decode_node, chars_pushed, done)
        self._stack: list[tuple] = [(self._root, 0, False)]

    def reset(self) -> None:
        del self._stack[1:]
        self.m.reset()

    def next(self, byte: int) -> bool:
        node, _, done = self._stack[-1]
        if done:
            # key already terminated: only zero padding may follow
            if byte != 0:
                return False
            self._stack.append((node, 0, True))
            return True
        pushed = 0
        for i in range(7, -1, -1):
            child = node[(byte >> i) & 1]
            if child is None:  # invalid code path
                for _ in range(pushed):
                    self.m.pop()
                return False
            if isinstance(child, list):
                node = child
                continue
            # a symbol completed
            if child == TERMINAL:
                self._stack.append((self._root, pushed, True))
                return True
            if not self.m.next(child):
                for _ in range(pushed):
                    self.m.pop()
                return False
            pushed += 1
            node = self._root
        self._stack.append((node, pushed, False))
        return True

    def pop(self) -> None:
        _node, pushed, _done = self._stack.pop()
        for _ in range(pushed):
            self.m.pop()

    def is_final(self) -> bool:
        return self._stack[-1][2] and self.m.is_final()


def match_encoded_keys(keys: list[bytes], matcher, encoding: VarLenTextEncoding) -> list[int]:
    """Indices of SORTED packed keys accepted by a char ``matcher``,
    evaluated entirely in encoded byte space (no key is decoded).

    Walks the key list like a trie: consecutive keys share byte
    prefixes, so each byte of shared prefix is fed to the
    :class:`DecodingDfaMatcher` once and reused — the scan does
    O(total distinct-prefix bytes) matcher steps, the same work a
    byte-trie/TST walk over the encoded dictionary would do."""
    return _match_byte_keys(keys, DecodingDfaMatcher(matcher, encoding))


def _match_byte_keys(keys: list[bytes], dm) -> list[int]:
    """Shared-prefix walk of SORTED byte keys against a byte-space
    matcher ``dm`` (``next(byte)->bool`` leaving state unchanged on
    failure, ``pop()``, ``is_final()``)."""
    out: list[int] = []
    depth = 0  # bytes of the previous key currently consumed & accepted
    dead = -1  # depth at which the matcher rejected (prefix pruned), -1 = alive
    prev = b""
    for idx, key in enumerate(keys):
        p = 0
        n = min(len(prev), len(key))
        while p < n and prev[p] == key[p]:
            p += 1
        if dead >= 0 and p > dead:
            # shares the byte that was rejected: skip without rescanning
            prev = key
            continue
        dead = -1
        while depth > p:
            dm.pop()
            depth -= 1
        ok = True
        for b in key[depth:]:
            if not dm.next(b):
                ok = False
                dead = depth  # the byte AT this depth failed
                break
            depth += 1
        if ok and dm.is_final():
            out.append(idx)
        prev = key
    return out


# ---------------------------------------------------------------------------
# UTF-8 byte space: table-driven DFA decoder + byte-space matcher
# ---------------------------------------------------------------------------

# Byte classes (0 = invalid everywhere: C0-C1 overlong leads, F5-FF):
#   1 ASCII 00-7F | 2 cont 80-8F | 3 cont 90-9F | 4 cont A0-BF |
#   5 lead C2-DF | 6 E0 (needs A0-BF) | 7 E1-EC,EE-EF | 8 ED (needs
#   80-9F, excludes surrogates) | 9 F0 (needs 90-BF) | 10 F1-F3 |
#   11 F4 (needs 80-8F, caps at U+10FFFF).
# The class/state transition table is the classic public-domain UTF-8
# DFA construction (Hoehrmann-style); the reference ships its own copy
# in ``Common/UTF8DfaDecoder.cs`` (behavior observed, no code copied —
# tables derived here from the RFC 3629 well-formed byte ranges, so
# overlongs, surrogates and >U+10FFFF are rejected, not just F8-FF).
_U8_CLASS = np.zeros(256, dtype=np.int8)
_U8_CLASS[0x00:0x80] = 1
_U8_CLASS[0x80:0x90] = 2
_U8_CLASS[0x90:0xA0] = 3
_U8_CLASS[0xA0:0xC0] = 4
_U8_CLASS[0xC2:0xE0] = 5
_U8_CLASS[0xE0] = 6
_U8_CLASS[0xE1:0xED] = 7
_U8_CLASS[0xED] = 8
_U8_CLASS[0xEE:0xF0] = 7
_U8_CLASS[0xF0] = 9
_U8_CLASS[0xF1:0xF4] = 10
_U8_CLASS[0xF4] = 11
# states: 0 start/accept | 1 need 1 cont (any) | 2 need 2 cont (any) |
# 3 after E0 | 4 after ED | 5 after F0 | 6 after F4 | 7 need 3 cont
_U8_NEXT = np.full((8, 12), -1, dtype=np.int8)
_U8_NEXT[0, 1] = 0
_U8_NEXT[0, 5] = 1
_U8_NEXT[0, 6] = 3
_U8_NEXT[0, 7] = 2
_U8_NEXT[0, 8] = 4
_U8_NEXT[0, 9] = 5
_U8_NEXT[0, 10] = 7
_U8_NEXT[0, 11] = 6
_U8_NEXT[1, 2:5] = 0
_U8_NEXT[2, 2:5] = 1
_U8_NEXT[3, 4] = 1  # E0: only A0-BF (rejects 3-byte overlongs)
_U8_NEXT[4, 2:4] = 1  # ED: only 80-9F (rejects UTF-16 surrogates)
_U8_NEXT[5, 3:5] = 2  # F0: only 90-BF (rejects 4-byte overlongs)
_U8_NEXT[6, 2] = 2  # F4: only 80-8F (rejects > U+10FFFF)
_U8_NEXT[7, 2:5] = 2
# payload bits contributed by a LEAD byte of each class (continuation
# bytes always contribute their low 6 bits)
_U8_MASK = (0, 0x7F, 0x3F, 0x3F, 0x3F, 0x1F, 0x0F, 0x0F, 0x0F, 0x07, 0x07, 0x07)


def decode_utf8_dfa(data: bytes) -> str:
    """Decode UTF-8 with the table DFA (reference
    ``UTF8DfaDecoder.Decode`` — behavior observed, no code copied).
    Raises ``ValueError`` on any byte sequence the DFA rejects.  Used
    by :class:`Utf8DfaMatcher`; bulk decode in pipelines stays on
    Arrow/CPython codecs."""
    out: list[str] = []
    state = 0
    symbol = 0
    for b in data:
        nxt = _U8_NEXT[state, _U8_CLASS[b]]
        if nxt < 0:
            raise ValueError(f"not UTF-8 at byte {b:#04x}")
        symbol = (symbol << 6) | (b & 0x3F) if state else b & _U8_MASK[_U8_CLASS[b]]
        state = int(nxt)
        if state == 0:
            out.append(chr(symbol))
            symbol = 0
    if state:
        raise ValueError("truncated UTF-8 sequence")
    return "".join(out)


class Utf8DfaMatcher:
    """Byte-space matcher over UTF-8 key bytes: decodes incrementally
    with the table DFA and advances an inner CHAR matcher once per
    completed codepoint — WILD/EDIT run directly over the UTF-8 byte
    trie of a dictionary, no key decoded up front.

    Behavioral reference: ``DecodingMatcherForUTF8``
    (``Src/.../Common/Compression/DecodingMatcherForUTF8.cs`` —
    behavior observed, no code copied).  One deliberate divergence:
    the reference feeds UTF-16 code units to its char matcher (a C#
    ``(char)symbol`` cast that TRUNCATES astral codepoints mod 2^16);
    this repo's matchers consume full Python codepoints, so astral
    symbols match correctly instead of aliasing.

    Protocol matches :mod:`fulltextsearch_ray.dfa`: ``next(byte)``
    leaves state unchanged on failure; ``pop()`` undoes the last
    successful ``next``; mid-sequence states are never final."""

    def __init__(self, matcher):
        self.m = matcher
        # per consumed byte: (pending_symbol_bits, dfa_state, pushed_char)
        self._stack: list[tuple[int, int, bool]] = [(0, 0, False)]

    def reset(self) -> None:
        del self._stack[1:]
        self.m.reset()

    def next(self, byte: int) -> bool:
        symbol, state, _ = self._stack[-1]
        cls = _U8_CLASS[byte]
        nxt = _U8_NEXT[state, cls]
        if nxt < 0:
            # invalid byte, continuation without a lead, a new lead
            # while continuations are expected, or an ill-formed
            # (overlong / surrogate / >U+10FFFF) sequence: reject,
            # state unchanged — the key simply does not match
            return False
        symbol = (symbol << 6) | (byte & 0x3F) if state else byte & _U8_MASK[cls]
        if nxt:
            self._stack.append((symbol, int(nxt), False))
            return True
        if not self.m.next(chr(symbol)):
            return False
        self._stack.append((0, 0, True))
        return True

    def pop(self) -> None:
        _, _, pushed = self._stack.pop()
        if pushed:
            self.m.pop()

    def is_final(self) -> bool:
        return self._stack[-1][1] == 0 and self.m.is_final()


def match_utf8_keys(keys: list[bytes], matcher) -> list[int]:
    """Indices of SORTED UTF-8-encoded keys accepted by a char
    ``matcher``, evaluated in byte space with shared-prefix reuse
    (same walk as :func:`match_encoded_keys`; a byte-level dictionary
    laid out as a trie/TST gets the identical step count)."""
    return _match_byte_keys(keys, Utf8DfaMatcher(matcher))
