"""C7 text-encoding family (reference TextEncodingTests.cs ported:
round-trips over the multilingual fixture, FromCodes reconstruction
golden) plus order-preservation and optimality properties the
reference relies on implicitly."""

import itertools

import numpy as np
import pytest

from fulltextsearch_ray.textcodec import (
    TERMINAL,
    VarLenTextEncoding,
    build_balanced,
    build_huffman,
    build_hutucker,
    encode_sorted_terms,
)


def _reference_fixture_text() -> str:
    # the reference test corpus (TextEncodingTests.cs Test<T>)
    parts = []
    for j in range(1000):
        parts.append("Hello" + str(j))
        parts.append("Здоровенькі" + str(j))
        parts.append("Були" + str(j))
        parts.append("Окружение" + str(j))
        parts.append("שלום" + str(j))
        parts.append("עולם" + str(j))
        parts.append("ТестыТексты" + str(j))
        parts.append("ТестыТексты" + str(j))
        parts.append("Ϩڀर஁Ⲫ" + str(j))
    return "".join(parts)


@pytest.mark.parametrize("builder", ["huffman", "hutucker", "balanced"])
def test_roundtrip_reference_fixture(builder):
    text = _reference_fixture_text()
    enc = VarLenTextEncoding.from_text(text, builder)
    data = enc.encode(text)
    assert enc.decode(data) == text
    # a real encoding: strictly fewer bits than 2 bytes/char
    assert len(data) < 2 * len(text)


def test_from_codes_reference_golden():
    # exact reference expectation (TextEncodingTests.EncodingReconstruction)
    codes = {
        "_": (1, 1, 1),
        "a": (0, 1, 0),
        "e": (0, 0, 0),
        "f": (1, 1, 0, 1),
        "h": (1, 0, 1, 0),
        "i": (1, 0, 0, 0),
        "m": (0, 1, 1, 1),
        "n": (0, 0, 1, 0),
        "s": (1, 0, 1, 1),
        "t": (0, 1, 1, 0),
        "l": (1, 1, 0, 0, 1),
        "o": (0, 0, 1, 1, 0),
        "p": (1, 0, 0, 1, 1),
        "r": (1, 1, 0, 0, 0),
        "u": (0, 0, 1, 1, 1),
        "x": (1, 0, 0, 1, 0),
    }
    enc = VarLenTextEncoding.from_codes(codes)
    bits = (1, 0, 1, 0, 0, 0, 0, 1, 1, 0, 0, 1, 1, 1, 0, 0, 1, 0, 0, 1, 1, 0)
    assert enc.decode(bits) == "hello"


def test_from_codes_rejects_non_prefix_free():
    with pytest.raises(ValueError, match="prefix"):
        VarLenTextEncoding.from_codes({"a": (0,), "b": (0, 1)})


@pytest.mark.parametrize("builder", ["hutucker", "balanced"])
def test_alphabetic_codes_preserve_order(builder):
    rng = np.random.default_rng(7)
    alphabet = list("abcdefgzé߷")
    terms = sorted(
        {"".join(rng.choice(alphabet, size=rng.integers(1, 9))) for _ in range(300)}
    )
    enc, encoded = encode_sorted_terms(terms, builder)
    assert encoded == sorted(encoded), "packed keys must sort like the terms"
    assert len(set(encoded)) == len(terms), "packed keys must stay distinct"
    # round-trip through the packed form
    assert [enc.decode(e) for e in encoded] == terms


def test_huffman_beats_or_ties_alphabetic_codes():
    text = _reference_fixture_text()
    freqs: dict[str, int] = {}
    for ch in text:
        freqs[ch] = freqs.get(ch, 0) + 1
    freqs[TERMINAL] = 1
    hu = VarLenTextEncoding(build_huffman(freqs)).mean_bits_per_char(freqs)
    ht = VarLenTextEncoding(build_hutucker(freqs)).mean_bits_per_char(freqs)
    ba = VarLenTextEncoding(build_balanced(freqs)).mean_bits_per_char(freqs)
    assert hu <= ht + 1e-9  # Huffman is cost-optimal overall
    assert ht <= ba + 1e-9  # Hu-Tucker is optimal among alphabetic codes


def _brute_force_alphabetic_cost(weights):
    """Min external path weight over ALL binary trees on ordered leaves."""
    n = len(weights)
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def best(i, j):
        if j - i == 1:
            return 0
        total = sum(weights[i:j])
        return total + min(best(i, k) + best(k, j) for k in range(i + 1, j))

    return best(0, n)


def test_hutucker_matches_brute_force_optimum():
    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(2, 9))
        w = [int(x) for x in rng.integers(1, 50, size=n)]
        syms = [chr(ord("a") + i) for i in range(n)]
        codes = build_hutucker(dict(zip(syms, w)))
        got = sum(len(codes[s]) * wi for s, wi in zip(syms, w))
        assert got == _brute_force_alphabetic_cost(tuple(w)), (n, w)


def test_decode_without_terminal_raises():
    # explicit codebook where an all-zero stream can never reach the
    # terminal symbol: decode must fail loudly, never return garbage
    enc = VarLenTextEncoding.from_codes({TERMINAL: (1, 1), "a": (0,), "b": (1, 0)})
    with pytest.raises(ValueError, match="terminal"):
        enc.decode(b"\x00\x00")
    # and a path that falls off the code trie is an error too
    sparse = VarLenTextEncoding.from_codes({TERMINAL: (1, 1), "a": (0, 0)})
    with pytest.raises(ValueError, match="no symbol"):
        sparse.decode(b"\x40")  # 01... — dead branch


# -- encoded-byte-space DFA matching (reference DecodingMatcher*) -----------


def test_match_encoded_keys_parity_all_builders():
    """Wildcard/edit/any matching in encoded byte space == decode-then-
    match, for every code builder (no key is ever decoded)."""
    import random

    from fulltextsearch_ray.dfa import (
        AnyDfaMatcher,
        EditDfaMatcher,
        WildcardDfaMatcher,
    )
    from fulltextsearch_ray.matchers import levenshtein_mask, wildcard_match
    from fulltextsearch_ray.textcodec import encode_sorted_terms, match_encoded_keys

    rng = random.Random(7)
    words = sorted(
        {
            "".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 12)))
            for _ in range(1500)
        }
    )
    for builder in ("hutucker", "huffman", "balanced"):
        enc, keys = encode_sorted_terms(words, builder=builder)
        assert match_encoded_keys(keys, AnyDfaMatcher(), enc) == list(range(len(words)))
        for pat in ["a*", "*h", "a?c*", "*abc*", "????", "a*b*c"]:
            got = match_encoded_keys(keys, WildcardDfaMatcher(pat), enc)
            want = [i for i, w in enumerate(words) if wildcard_match(pat, w)]
            assert got == want, (builder, pat)
        for q, k in [("abcd", 1), ("hgfe", 2)]:
            got = match_encoded_keys(keys, EditDfaMatcher(q, k), enc)
            mask = levenshtein_mask(q, words, k)
            assert got == [i for i, m in enumerate(mask) if m], (builder, q, k)


def test_decoding_matcher_unit():
    """Byte-level protocol: partial-byte failure leaves state unchanged;
    pop() unwinds exactly one byte; terminal freezes the outcome."""
    from fulltextsearch_ray.dfa import WildcardDfaMatcher
    from fulltextsearch_ray.textcodec import (
        DecodingDfaMatcher,
        VarLenTextEncoding,
        encode_sorted_terms,
    )

    enc, keys = encode_sorted_terms(["abc", "abd", "xyz"])
    dm = DecodingDfaMatcher(WildcardDfaMatcher("ab?"), enc)
    key = keys[0]
    for b in key:
        assert dm.next(b)
    assert dm.is_final()
    for _ in key:
        dm.pop()
    # after a full unwind the other keys still evaluate correctly
    assert not dm.is_final()
    ok = all(dm.next(b) for b in keys[2])  # "xyz" vs "ab?" must fail
    assert not ok


def test_builders_handle_deep_skewed_trees():
    """Regression: recursive tree walks hit Python's recursion limit on
    1000+-symbol skewed alphabets (doubling weights force code length
    ~ alphabet size for Huffman)."""
    import math

    from fulltextsearch_ray.textcodec import BUILDERS

    n = 1100
    syms = [chr(0x100 + i) for i in range(n)]
    freqs = {s: int(math.pow(2, min(i, 500))) for i, s in enumerate(syms)}
    for name, build in BUILDERS.items():
        codes = build(freqs)
        assert len(codes) == n, name


def test_encode_rejects_nul_and_decode_rejects_truncation():
    from fulltextsearch_ray.textcodec import VarLenTextEncoding

    enc = VarLenTextEncoding.from_text("abcabcab")
    with pytest.raises(ValueError, match="NUL"):
        enc.encode("a\x00b")
    bits = enc.encode_bits("abc", terminated=False)
    assert enc.decode(bits) == "abc"
    with pytest.raises(ValueError, match="mid-codeword"):
        enc.decode(bits[:-1])


# -- UTF-8 byte-space DFA (reference UTF8DfaDecoder / DecodingMatcherForUTF8)


def test_utf8_dfa_decoder_reference_vector():
    # ported reference test (UTF8DfaDecoderTests.Decoding) + astral chars
    from fulltextsearch_ray.textcodec import decode_utf8_dfa

    for text in [
        "Hello Здоровенькі ᆵሄ⅙⅙Ⅸ ТестыТексты Були שלום עולם",
        "",
        "ascii only",
        "astral \U0001f389\U00010348 mix",
    ]:
        assert decode_utf8_dfa(text.encode("utf-8")) == text


def test_utf8_dfa_decoder_rejects_invalid():
    from fulltextsearch_ray.textcodec import decode_utf8_dfa

    for bad in [b"\xf8", b"\x80", b"\xc3", b"\xc3A", b"hello\xffworld", b"\xe0\x80"]:
        with pytest.raises(ValueError):
            decode_utf8_dfa(bad)
    # RFC 3629 ill-formed (Python's strict codec rejects all of these):
    # overlongs, UTF-16 surrogates, >U+10FFFF, C0/C1/F5-F7 leads
    for bad in [
        b"\xc0\xae",
        b"\xc1\xbf",
        b"\xe0\x80\xaf",
        b"\xe0\x9f\xbf",
        b"\xed\xa0\x80",
        b"\xf0\x8f\xbf\xbf",
        b"\xf4\x90\x80\x80",
        b"\xf5\x80\x80\x80",
    ]:
        with pytest.raises(ValueError):
            decode_utf8_dfa(bad)
    # tight boundary accepts
    assert decode_utf8_dfa(b"\xf4\x8f\xbf\xbf") == "\U0010ffff"
    assert decode_utf8_dfa(b"\xed\x9f\xbf") == "퟿"
    assert decode_utf8_dfa(b"\xee\x80\x80") == ""
    assert decode_utf8_dfa(b"\xe0\xa0\x80") == "ࠀ"
    assert decode_utf8_dfa(b"\xc2\x80") == "\x80"


def test_utf8_dfa_decoder_fuzz_parity_with_python_codec():
    """decode_utf8_dfa accepts exactly what Python's strict UTF-8
    codec accepts, and decodes identically."""
    import random

    from fulltextsearch_ray.textcodec import decode_utf8_dfa

    rng = random.Random(7)
    for _ in range(3000):
        data = bytes(rng.randrange(256) for _ in range(rng.randint(0, 8)))
        try:
            want = data.decode("utf-8")
        except UnicodeDecodeError:
            with pytest.raises(ValueError):
                decode_utf8_dfa(data)
        else:
            assert decode_utf8_dfa(data) == want


def test_match_utf8_keys_skips_ill_formed_keys():
    """A corrupt/foreign key in the sorted list is simply not matched
    — the walk must not crash on it."""
    from fulltextsearch_ray.dfa import AnyDfaMatcher
    from fulltextsearch_ray.textcodec import match_utf8_keys

    keys = sorted([b"abc", "проба".encode(), b"\xc0\xae", b"\xed\xa0\x80", b"\xf5\x80\x80\x80"])
    good = {keys.index(b"abc"), keys.index("проба".encode())}
    assert set(match_utf8_keys(keys, AnyDfaMatcher())) == good


def test_match_utf8_keys_parity():
    """WILD/EDIT/ANY over raw UTF-8 key bytes == decode-then-match,
    including multi-byte and astral codepoints (where the reference's
    UTF-16 char cast would alias — divergence documented)."""
    import random

    from fulltextsearch_ray.dfa import (
        AnyDfaMatcher,
        EditDfaMatcher,
        SequenceDfaMatcher,
        WildcardDfaMatcher,
    )
    from fulltextsearch_ray.matchers import levenshtein_mask, wildcard_match
    from fulltextsearch_ray.textcodec import match_utf8_keys

    rng = random.Random(11)
    alphabet = "abcдёжשፕ\U0001f389"
    words = sorted(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10)))
            for _ in range(1200)
        }
    )
    keys = [w.encode("utf-8") for w in words]
    assert keys == sorted(keys)  # UTF-8 byte order == codepoint order
    assert match_utf8_keys(keys, AnyDfaMatcher()) == list(range(len(words)))
    for pat in ["a*", "*ж", "д?c*", "*дё*", "???", "a*б*c", "\U0001f389*"]:
        got = match_utf8_keys(keys, WildcardDfaMatcher(pat))
        want = [i for i, w in enumerate(words) if wildcard_match(pat, w)]
        assert got == want, pat
    for q, k in [("aжc", 1), ("дёдё", 2), ("\U0001f389\U0001f389", 1)]:
        got = match_utf8_keys(keys, EditDfaMatcher(q, k))
        mask = levenshtein_mask(q, words, k)
        assert got == [i for i, m in enumerate(mask) if m], (q, k)
    w = words[37]
    assert match_utf8_keys(keys, SequenceDfaMatcher(w)) == [37]


def test_utf8_matcher_protocol_unit():
    """Failed next() leaves state unchanged mid-sequence; pop() unwinds
    exactly one byte; mid-sequence states are never final."""
    from fulltextsearch_ray.dfa import WildcardDfaMatcher
    from fulltextsearch_ray.textcodec import Utf8DfaMatcher

    m = Utf8DfaMatcher(WildcardDfaMatcher("д?"))
    lead, cont = "д".encode("utf-8")
    assert m.next(lead)
    assert not m.is_final()  # mid-sequence
    assert not m.next(0x41)  # new lead while a continuation is pending
    assert not m.next(0xF9)  # invalid byte class
    assert m.next(cont)  # state was unchanged: correct continuation works
    assert not m.is_final()  # pattern needs one more char
    assert m.next(ord("x"))
    assert m.is_final()
    m.pop()  # unwind 'x'
    m.pop()  # unwind the continuation byte
    m.pop()  # unwind the lead byte
    assert not m.is_final()
    # a rejected char (matcher says no) also leaves byte state unchanged
    m2 = Utf8DfaMatcher(WildcardDfaMatcher("a"))
    assert not m2.next(ord("b"))
    assert m2.next(ord("a")) and m2.is_final()
