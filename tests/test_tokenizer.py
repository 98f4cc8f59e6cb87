"""Tokenizer parity tests — fixtures from FIXTURES.md §8 / reference BasicTokenizer."""

import numpy as np

from fulltextsearch_ray.tokenizer import (
    MAX_TOKEN_SIZE,
    token_counts,
    tokenize,
    tokenize_batch,
    tokenize_with_positions,
)


def test_case_folding_and_splitting():
    assert tokenize("This is test") == ["this", "is", "test"]
    assert tokenize("Programs.") == ["programs"]
    assert tokenize("Hello World!") == ["hello", "world"]


def test_hyphen_and_underscore_are_token_chars():
    assert tokenize("full-text") == ["full-text"]
    assert tokenize("Petro-Mariya-Sophie") == ["petro-mariya-sophie"]
    assert tokenize("a_b c") == ["a_b", "c"]


def test_punctuation_splits():
    assert tokenize("boolean operators: and, or") == ["boolean", "operators", "and", "or"]
    assert tokenize("exciting. Programs can help. This is fantastic!!!") == [
        "exciting", "programs", "can", "help", "this", "is", "fantastic",
    ]


def test_truncation_at_64_keeps_true_length():
    long_tok = "x" * 70
    assert tokenize(f"a {long_tok} b") == ["a", "x" * MAX_TOKEN_SIZE, "b"]
    positions = tokenize_with_positions(f"a {long_tok} b")
    assert positions[1] == ("x" * MAX_TOKEN_SIZE, 2, 70)


def test_non_ascii_letters_are_token_chars():
    assert tokenize("héllo_wörld spark") == ["héllo_wörld", "spark"]


def test_token_ids_one_based_per_doc():
    batch = tokenize_batch(["Hello World!", "This is test"])
    assert batch.counts.tolist() == [2, 3]
    assert batch.doc_index.tolist() == [0, 0, 1, 1, 1]
    assert batch.token_ids.tolist() == [1, 2, 1, 2, 3]
    assert batch.terms.to_pylist() == ["hello", "world", "this", "is", "test"]


def test_token_counts_matches_batch():
    texts = ["Hello World!", "", "a b c d"]
    assert token_counts(texts).tolist() == [2, 0, 4]
    batch = tokenize_batch(texts)
    assert np.array_equal(batch.counts, np.array([2, 0, 4]))


def test_positions_offsets():
    pos = tokenize_with_positions("Hello World!")
    assert pos == [("hello", 0, 5), ("world", 6, 5)]
