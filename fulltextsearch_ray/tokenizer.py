"""Vectorized tokenizer with parity to the reference ``BasicTokenizer``.

Reference behavior reproduced (behavior observed at
``/root/reference/Src/Protsyk.PMS.FullText.Core/IndexTypes/Common/BasicTokenizer.cs:96-109``,
``:62`` and ``FullTextIndexBuilder.cs:97-115``; no code copied):

* A token is a maximal run of characters that are Unicode
  letters/digits or ``'-'`` / ``'_'``.
* Tokens are lowercased.
* Terms longer than ``MAX_TOKEN_SIZE`` (64) characters are truncated to
  64 chars *as dictionary terms*, while the recorded position length
  keeps the true length.
* Token ids are **1-based word positions** per (document, field).

Known, documented divergences from .NET (all outside the conformance
fixtures): Python's ``\\w`` additionally matches Unicode categories
``Nl``/``No`` (e.g. Roman numerals) which .NET ``char.IsLetterOrDigit``
excludes, and a handful of locale-special lowercasings ('İ') differ.

The hot path is a single C-level ``findall`` per document plus Arrow /
numpy vectorized post-processing — no per-token Python loop.
"""

from __future__ import annotations

import re
from typing import Iterable, NamedTuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAX_TOKEN_SIZE = 64
DEFAULT_FIELD_ID = 1

# Token chars: \w (Unicode letters, digits, underscore) plus '-'.
TOKEN_RE = re.compile(r"[\w\-]+")


class TokenizedBatch(NamedTuple):
    """Exploded tokens for a batch of documents (parallel arrays)."""

    terms: pa.Array           # string; truncated to MAX_TOKEN_SIZE chars
    counts: np.ndarray        # int64, tokens per input document
    doc_index: np.ndarray     # int64, index into the input batch per token
    token_ids: np.ndarray     # uint64, 1-based position per document


def tokenize(text: str) -> list[str]:
    """Tokenize a single document into lowercased (truncated) terms."""
    return [t[:MAX_TOKEN_SIZE] for t in TOKEN_RE.findall(text.lower())]


def tokenize_with_positions(text: str) -> list[tuple[str, int, int]]:
    """(term, char_offset, true_length) per token — the highlight path.

    Mirrors the reference's forward-index ``TextPosition`` contract:
    offset/length are pre-truncation character spans.
    """
    out = []
    for m in TOKEN_RE.finditer(text):
        tok = m.group(0)
        out.append((tok.lower()[:MAX_TOKEN_SIZE], m.start(), len(tok)))
    return out


def token_counts(texts: Iterable[str]) -> np.ndarray:
    """Per-document token count (``doc_len`` for BM25), vectorized-ish."""
    findall = TOKEN_RE.findall
    return np.fromiter((len(findall(t)) for t in texts), dtype=np.int64)


def tokenize_batch(texts: Iterable[str]) -> TokenizedBatch:
    """Tokenize a batch of documents into parallel exploded arrays.

    One ``findall`` call per document (C speed); term truncation is a
    single vectorized Arrow kernel; ids/indices are numpy arithmetic.
    """
    findall = TOKEN_RE.findall
    per_doc = [findall(t.lower()) for t in texts]
    n_docs = len(per_doc)
    counts = np.fromiter((len(p) for p in per_doc), dtype=np.int64, count=n_docs)
    total = int(counts.sum())

    flat: list[str] = []
    for p in per_doc:
        flat.extend(p)
    terms = pa.array(flat, type=pa.string())
    # Truncate >64-char terms (vectorized; no-op for the common case).
    terms = pc.utf8_slice_codeunits(terms, 0, MAX_TOKEN_SIZE)

    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    doc_index = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    # 1-based token id within each document.
    token_ids = (np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], counts) + 1).astype(np.uint64)
    return TokenizedBatch(terms, counts, doc_index, token_ids)
