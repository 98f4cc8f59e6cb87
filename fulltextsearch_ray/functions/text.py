"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All stages are fully vectorized ``map_batches`` batch functions over
the ``documents``-shaped corpus ``(doc_id, text, ...)``: tokenization
is one Arrow C++ pass per batch (``tokenizer.flat_tokens``), stopword
membership is ``pc.is_in``, per-doc reductions are ``np.bincount`` /
Arrow group-bys — no per-document Python loop anywhere.  Each operator
has an exact DuckDB SQL twin in ``__ray_entry__.oracle_sql`` (the
heuristics are deliberately SQL-expressible so the driver's oracle
gate covers them).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..tokenizer import flat_tokens
from .common import md5_hex, round6

# language → stopword list for the counting heuristic; prediction is
# argmax hit-count with ties broken by this priority order.
LANG_ORDER = ["en", "de", "es", "fr", "zh"]
STOPWORDS = {
    "en": ["the", "a", "is", "and", "of", "to", "in", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"],
    "es": ["el", "la", "es", "y", "de", "que", "en", "un", "por", "los"],
    "fr": ["le", "la", "est", "et", "de", "que", "un", "une", "pour", "les"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不", "人", "这"],
}
QUALITY_STOPWORDS = STOPWORDS["en"]


def _stop_hits(toks: pa.Array, parent: np.ndarray, n_docs: int, words: list[str]) -> np.ndarray:
    """Per-doc count of tokens contained in ``words`` (one is_in kernel
    + one bincount)."""
    mask = np.asarray(
        pc.is_in(toks, value_set=pa.array(words, pa.string())).to_numpy(zero_copy_only=False)
    )
    return np.bincount(parent[mask], minlength=n_docs).astype(np.int64)


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Stopword-count language heuristic; mirrors oracle SQL exactly."""
    n_docs = batch.num_rows
    toks, parent, _counts = flat_tokens(batch["text"])
    hits = np.stack([_stop_hits(toks, parent, n_docs, STOPWORDS[lang]) for lang in LANG_ORDER])
    best = np.argmax(hits, axis=0)  # first max wins → LANG_ORDER priority
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(np.array(LANG_ORDER, dtype=object)[best], type=pa.string()),
            "stopword_hits": pa.array(hits[best, np.arange(n_docs)], type=pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality features + composite score.

    score = 0.4*min(n_tokens/100, 1) + 0.3*(1 - stop_ratio)
          + 0.3*min(mean_token_len/8, 1), rounded via round6.
    """
    n_docs = batch.num_rows
    toks, parent, counts = flat_tokens(batch["text"])
    n_tokens = counts.astype(np.float64)
    n_stop = _stop_hits(toks, parent, n_docs, QUALITY_STOPWORDS).astype(np.float64)
    lens = np.asarray(pc.utf8_length(toks).to_numpy(zero_copy_only=False), dtype=np.float64)
    tok_chars = np.bincount(parent, weights=lens, minlength=n_docs)
    safe_n = np.maximum(n_tokens, 1.0)
    stop_ratio = n_stop / safe_n
    mean_len = tok_chars / safe_n
    score = (
        0.4 * np.minimum(n_tokens / 100.0, 1.0)
        + 0.3 * (1.0 - stop_ratio)
        + 0.3 * np.minimum(mean_len / 8.0, 1.0)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens.astype(np.int64)),
            "stop_ratio": pa.array(round6(stop_ratio)),
            "mean_token_len": pa.array(round6(mean_len)),
            "quality": pa.array(round6(score)),
        }
    )


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Token counting: regex tokens + distinct terms per document."""
    n_docs = batch.num_rows
    toks, parent, counts = flat_tokens(batch["text"])
    n_distinct = np.zeros(n_docs, dtype=np.int64)
    if len(toks):
        distinct = (
            pa.table({"d": pa.array(parent), "t": toks}).group_by(["d", "t"]).aggregate([])
        )
        d = np.asarray(distinct["d"].to_numpy(zero_copy_only=False))
        n_distinct = np.bincount(d, minlength=n_docs).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(counts, type=pa.int64()),
            "n_distinct": pa.array(n_distinct, type=pa.int64()),
        }
    )


# GPT-2-family pretokenizer pattern (public: Radford et al. 2019 /
# tiktoken docs), minus the trailing `\s+(?!\S)` lookahead — RE2 (both
# pyarrow.compute and DuckDB) has no lookahead, so runs of spaces
# before a word count as one whitespace token here instead of
# splitting; both gate sides share the divergence by construction.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Pretokenizer-level counts — the sizing signal a training
    pipeline budgets by: ``n_ws`` whitespace-separated pieces and
    ``n_bpe`` GPT-2-style pretokens (upper bound on BPE token count,
    exact for whole-word vocabularies).  One RE2 kernel per column —
    no per-row Python."""
    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ws": pc.count_substring_regex(text, r"\S+").cast(pa.int64()),
            "n_bpe": pc.count_substring_regex(text, BPE_PRETOKEN_RE).cast(pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table, n: int = 3) -> pa.Table:
    """Document fingerprint = lexicographic min of md5(shingle) over
    word n-gram shingles (space-joined).  Docs with < n tokens use the
    whole token sequence as one shingle (token-less docs: md5(''))."""
    from .common import md5_hex_batch
    from .dedup import shingle_batch

    n_docs = batch.num_rows
    sh, dix = shingle_batch(batch["text"], n)
    fps = np.full(n_docs, md5_hex(""), dtype=object)
    if len(sh):
        md5s = md5_hex_batch(sh)
        mins = (
            pa.table({"d": pa.array(dix), "m": md5s}).group_by("d").aggregate([("m", "min")])
        )
        fps[np.asarray(mins["d"].to_numpy(zero_copy_only=False))] = np.asarray(
            mins["m_min"].to_pylist(), dtype=object
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fps.tolist(), type=pa.string()),
        }
    )
