"""Document reconstruction + match highlighting (the forward-index path).

The reference keeps a forward index (positions + original text) and
``TextDocument.Annotate(hits)`` uppercases matched tokens for the CLI's
search display (``IndexModels/TextDocument.cs:6-104``,
``ConsoleUtil/Program.cs:262``).  Here the original text stays in the
source Parquet, so highlighting re-tokenizes ONE document on demand —
no separate positions store needed (SURVEY.md §1.5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..tokenizer import tokenize_with_positions


def annotate(text: str, hit_token_ids: "list[int] | np.ndarray") -> str:
    """Uppercase the tokens at the given 1-based token ids — the
    reference's ``TextDocument.Annotate`` display semantics."""
    hits = set(int(h) for h in hit_token_ids)
    out = []
    last = 0
    for tid, (_term, offset, length) in enumerate(tokenize_with_positions(text), start=1):
        if tid in hits:
            out.append(text[last:offset])
            out.append(text[offset : offset + length].upper())
            last = offset + length
    out.append(text[last:])
    return "".join(out)


def annotate_from_positions(
    text: str,
    hit_token_ids: "list[int] | np.ndarray",
    offsets: "list[int]",
    lengths: "list[int]",
) -> str:
    """Uppercase the tokens at the given 1-based token ids using STORED
    character spans (the forward store) — no tokenizer run.  Identical
    output to :func:`annotate` for any index built over the same text."""
    out = []
    last = 0
    for tid in sorted({int(h) for h in hit_token_ids}):
        if tid < 1 or tid > len(offsets):
            continue
        off, length = offsets[tid - 1], lengths[tid - 1]
        out.append(text[last:off])
        out.append(text[off : off + length].upper())
        last = off + length
    out.append(text[last:])
    return "".join(out)


def annotate_matches_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Batch highlighting stage: rows (doc_id, text, token_ids:list) →
    (doc_id, annotated).  Used after joining match results back to the
    source table (the reference's search-display pipeline, Q8)."""
    out = []
    for text, tids in zip(batch[text_col].to_pylist(), batch["token_ids"].to_pylist()):
        out.append(annotate(text or "", tids or []))
    return pa.table({"doc_id": batch["doc_id"], "annotated": pa.array(out, pa.string())})
