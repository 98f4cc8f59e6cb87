"""Forward index: per-document token character spans.

The reference persists a forward store — per-(doc, field) TextPosition
lists plus the original text — and serves highlight/GetPositions from
it without re-tokenizing (behavior observed at
``Src/.../Persistent/PersistentBuilder.cs:92-131``,
``PersistentIndex.cs:93-118``; no code copied).  Here the original
text stays in the source Parquet (lineage recorded in the manifest);
this stage persists the SPANS: for every document the (char offset,
char length) of each token, delta-friendly int32 list columns in doc
order.  Query-time highlight then slices the original text directly —
no tokenizer run, no scan of non-matching documents.

Build cost is one extra corpus pass (opt-in ``store_forward=True``):
span extraction needs the Python regex ``finditer`` (Arrow's split
kernels do not expose match offsets), paid once at build instead of on
every highlight.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..tokenizer import TOKEN_RE

FORWARD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("offsets", pa.list_(pa.int32())),
        ("lengths", pa.list_(pa.int32())),
    ]
)


def forward_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, text) batch → (doc_id, offsets, lengths) span rows."""
    ids = batch["doc_id"]
    offs, lens = [], []
    finditer = TOKEN_RE.finditer
    for text in batch[text_col].to_pylist():
        o, l = [], []
        for m in finditer(text or ""):
            o.append(m.start())
            l.append(m.end() - m.start())
        offs.append(o)
        lens.append(l)
    return pa.table(
        {
            "doc_id": ids.cast(pa.uint64()) if ids.type != pa.uint64() else ids,
            "offsets": pa.array(offs, pa.list_(pa.int32())),
            "lengths": pa.array(lens, pa.list_(pa.int32())),
        }
    )


class ForwardFileStage:
    """Fused per-file stage for the parquet fast path: read one file,
    assign positional doc ids, emit span rows (mirrors
    ``ReadInvertStage``'s item protocol: 1-row batches of
    ``{file, offset}``)."""

    def __init__(self, text_col: str, chunk_rows: int = 2048):
        self.text_col = text_col
        self.chunk_rows = chunk_rows

    def __call__(self, batch: pa.Table):
        import pyarrow.parquet as pq

        for f, off in zip(batch["file"].to_pylist(), batch["offset"].to_pylist()):
            t = pq.read_table(f, columns=[self.text_col])
            ids = pa.array(np.arange(off, off + t.num_rows, dtype=np.uint64), pa.uint64())
            t = t.append_column("doc_id", ids)
            for s in range(0, t.num_rows, self.chunk_rows):
                yield forward_batch(t.slice(s, self.chunk_rows), self.text_col)
