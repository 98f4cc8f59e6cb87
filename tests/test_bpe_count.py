"""GPT-2-style pretokenizer counting (RE2 kernel, no Ray needed)."""

import pyarrow as pa

from fulltextsearch_ray.functions.text import bpe_token_count_batch


def _run(texts):
    out = bpe_token_count_batch(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    return out["n_ws"].to_pylist(), out["n_bpe"].to_pylist()


def test_whitespace_counts():
    ws, _ = _run(["a b  c", "  ", "", "one"])
    assert ws == [3, 0, 0, 1]


def test_bpe_pretokens_basic():
    # "Hello world" → ["Hello", " world"]; contraction splits off "'s"
    _, bpe = _run(["Hello world", "it's fine", "x93y", "!?."])
    assert bpe[0] == 2
    assert bpe[1] == 3  # "it" + "'s" + " fine"
    assert bpe[2] == 3  # "x" + "93" + "y"  (letters/digits split)
    assert bpe[3] == 1  # punctuation run is one pretoken


def test_bpe_upper_bounds_words():
    ws, bpe = _run(["plain words only here"])
    assert bpe[0] == ws[0]  # whole-word text: pretokens == words
