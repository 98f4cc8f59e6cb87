"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All stages are vectorized ``map_batches`` batch functions over the
``documents``-shaped corpus ``(doc_id, text, ...)``; each has an exact
DuckDB SQL twin in ``__ray_entry__.oracle_sql`` (the heuristics are
deliberately SQL-expressible so the driver's oracle gate covers them).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..tokenizer import TOKEN_RE
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


def _tokens(texts: list[str]) -> list[list[str]]:
    findall = TOKEN_RE.findall
    return [findall((t or "").lower()) for t in texts]


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Stopword-count language heuristic; mirrors oracle SQL exactly."""
    texts = batch["text"].to_pylist()
    toks = _tokens(texts)
    sets = {lang: frozenset(words) for lang, words in STOPWORDS.items()}
    preds, hits = [], []
    for tl in toks:
        counts = [sum(1 for t in tl if t in sets[lang]) for lang in LANG_ORDER]
        best = int(np.argmax(counts))  # first max wins → LANG_ORDER priority
        preds.append(LANG_ORDER[best])
        hits.append(counts[best])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(preds, type=pa.string()),
            "stopword_hits": pa.array(hits, type=pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality features + composite score.

    score = 0.4*min(n_tokens/100, 1) + 0.3*(1 - stop_ratio)
          + 0.3*min(mean_token_len/8, 1), rounded via round6.
    """
    texts = [t or "" for t in batch["text"].to_pylist()]
    toks = _tokens(texts)
    stop = frozenset(QUALITY_STOPWORDS)
    n_tokens = np.array([len(t) for t in toks], dtype=np.float64)
    n_stop = np.array([sum(1 for x in t if x in stop) for t in toks], dtype=np.float64)
    tok_chars = np.array([sum(len(x) for x in t) for t in toks], dtype=np.float64)
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
    """Token counting: whitespace-ish regex tokens + distinct terms."""
    texts = [t or "" for t in batch["text"].to_pylist()]
    toks = _tokens(texts)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array([len(t) for t in toks], type=pa.int64()),
            "n_distinct": pa.array([len(set(t)) for t in toks], type=pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table, n: int = 3) -> pa.Table:
    """Document fingerprint = lexicographic min of md5(shingle) over
    word n-gram shingles (space-joined).  Docs with < n tokens use the
    whole token sequence as one shingle."""
    texts = [t or "" for t in batch["text"].to_pylist()]
    toks = _tokens(texts)
    fps = []
    for tl in toks:
        if len(tl) >= n:
            shingles = (" ".join(tl[i : i + n]) for i in range(len(tl) - n + 1))
        else:
            shingles = (" ".join(tl),)
        fps.append(min(md5_hex(s) for s in shingles))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fps, type=pa.string()),
        }
    )
