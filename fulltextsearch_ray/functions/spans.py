"""Exact duplicated-substring span detection and removal.

The token-k-gram span dedup used by large-scale training-data
pipelines (Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better"): any length-``gram_len`` token window whose
corpus-wide occurrence count reaches ``min_count`` marks its token
range as duplicated; overlapping/adjacent marked windows merge into
maximal spans per document.  Lee et al. build suffix arrays; at Ray
scale the equivalent is hash-first — group windows by a 64-bit md5
prefix (``common.md5_u64_batch``, bit-identical to the DuckDB oracle's
``('0x' || substr(md5(g),1,16))::UBIGINT``, so the oracle mirrors the
grouping EXACTLY, collisions included) and count with a
combiner-then-groupby.

Scale shape
-----------
* Pass 1 (count): per-batch window hashing + per-batch partial counts
  (combiner) -> ONE groupby over distinct window hashes -> the
  duplicated-hash set.  Shuffle volume is bounded by distinct windows
  per batch, never total window occurrences.
* Pass 2 (mark): below ``broadcast_budget`` duplicated hashes the set
  ships once via ``ray.put`` and every batch marks its windows with
  one ``searchsorted`` — no second shuffle.  Past the budget the mark
  becomes a hash-partitioned semi-join (windows and dup-hashes tagged,
  unioned, grouped by ``h % P``) followed by a doc-partitioned span
  merge — neither side ever touches the driver.
* ``cut_dup_spans`` below the budget is ONE fused map_batches pass
  (mark + window-coverage + Arrow list rebuild per batch — no span
  table, no shuffle; coverage by marked windows equals coverage by
  merged spans).  Past the budget documents co-group with their spans
  by ``doc_id % P`` and each rebuild task holds one partition, never
  the corpus.

Everything is vectorized: window construction is the same shifted
Arrow ``binary_join_element_wise`` as ``dedup.shingle_batch``, span
merging is one boolean-diff pass over (doc, pos)-sorted marks, and
coverage for the cut is a difference-array prefix sum over the token
tape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..tokenizer import flat_tokens
from .common import default_partitions, list_array_auto, md5_u64_batch

_SPANS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("start_tok", pa.int64()),
        ("end_tok", pa.int64()),
        ("n_grams", pa.int64()),
    ]
)


def _grams_full(texts: "pa.Array | pa.ChunkedArray", gram_len: int, with_pos: bool = True):
    """(hash, window doc_index, window pos, tokens, token doc_index,
    per-doc token counts) for every length-``gram_len`` token window of
    a batch; docs with fewer tokens emit no windows (matching the
    oracle's ``len >= L`` filter).  Windows come out doc-contiguous
    with ascending positions.  ``with_pos=False`` skips the window
    doc-index/position bookkeeping (gparent/pos return empty) — the
    corpus-wide COUNT pass only needs the hashes and runs over every
    batch of the corpus."""
    if gram_len < 1:
        raise ValueError(f"gram_len must be >= 1 (got {gram_len})")
    toks, parent, counts = flat_tokens(texts)
    T = len(toks)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    if T < gram_len:
        return (*empty, toks, parent, counts)
    cols = [toks.slice(i, T - gram_len + 1) for i in range(gram_len)]
    joined = pc.binary_join_element_wise(*cols, " ")
    inside = parent[: T - gram_len + 1] == parent[gram_len - 1 :]
    if not inside.any():
        return (*empty, toks, parent, counts)
    grams = joined.filter(pa.array(inside))
    # int64 VIEW of the uint64 md5 prefix: Ray Data shuffles/groupbys
    # reject uint64 values past int64-max, and the reinterpret is a
    # bijection so grouping semantics (and the oracle mirror) are
    # unchanged.  The hash never appears in any output column.
    h = md5_u64_batch(grams).view(np.int64)
    if not with_pos:
        return h, empty[1], empty[2], toks, parent, counts
    idx = np.flatnonzero(inside)
    gparent = parent[idx]
    starts = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = idx - starts[gparent]
    return h, gparent, pos, toks, parent, counts


def grams_with_pos(
    texts: "pa.Array | pa.ChunkedArray", gram_len: int
) -> "tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]":
    """(hash, doc_index, pos, per-doc token counts) — see
    :func:`_grams_full`."""
    h, gparent, pos, _, _, counts = _grams_full(texts, gram_len)
    return h, gparent, pos, counts


def _require_unique_ids(ids: np.ndarray, where: str) -> None:
    """Duplicate doc_ids merge two documents' window streams — the
    mark sort then sees a POSITION RESET inside one 'doc' and emits
    corrupt spans (end_tok < start_tok) or silently merged coverage.
    Same contract as the index build and the dedup ops: fail loudly."""
    if len(ids) > 1 and np.unique(ids).size != len(ids):
        u = np.sort(ids)
        bad = np.unique(u[1:][u[1:] == u[:-1]])[:5]
        raise ValueError(f"{where}: doc_id must be unique; duplicates: {bad.tolist()}")


def _mark_against(dup_sorted: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Boolean mask of window hashes present in the SORTED duplicated-
    hash array — one searchsorted, no Python loop."""
    if not len(h) or not len(dup_sorted):
        return np.zeros(len(h), dtype=bool)
    j = np.searchsorted(dup_sorted, h)
    j[j == len(dup_sorted)] = 0  # wrap: compare against [0], never matches h>max
    return dup_sorted[j] == h


def spans_from_marks(mdoc: np.ndarray, mpos: np.ndarray, gram_len: int) -> pa.Table:
    """Merge (doc, pos)-SORTED marked window starts into maximal spans:
    consecutive marks in one doc merge while the gap is <= gram_len
    (overlap or adjacency of the covered token ranges)."""
    n = len(mdoc)
    if not n:
        return _SPANS_SCHEMA.empty_table()
    brk = np.ones(n, dtype=bool)
    brk[1:] = (mdoc[1:] != mdoc[:-1]) | ((mpos[1:] - mpos[:-1]) > gram_len)
    starts = np.flatnonzero(brk)
    last = np.r_[starts[1:], n] - 1
    return pa.table(
        {
            "doc_id": pa.array(mdoc[starts].astype(np.int64)),
            "start_tok": pa.array(mpos[starts].astype(np.int64)),
            "end_tok": pa.array((mpos[last] + gram_len).astype(np.int64)),
            "n_grams": pa.array((last - starts + 1).astype(np.int64)),
        }
    )


def _dup_hash_dataset(
    ds: ray.data.Dataset, text_col: str, gram_len: int, min_count: int
) -> ray.data.Dataset:
    """Single-column dataset of window hashes with corpus-wide
    occurrence count >= min_count."""

    def partial(b: pa.Table) -> pa.Table:
        h = _grams_full(b[text_col], gram_len, with_pos=False)[0]
        uh, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {"h": pa.array(uh, pa.int64()), "cnt": pa.array(cnt.astype(np.int64))}
        )

    counts = (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .sum("cnt", ignore_nulls=True)
    )

    def keep(b: pa.Table) -> pa.Table:
        c = np.asarray(b["sum(cnt)"].to_numpy(zero_copy_only=False))
        return b.filter(pa.array(c >= min_count)).select(["h"])

    return counts.map_batches(keep, batch_format="pyarrow")


def _dup_hash_ref(
    ds: ray.data.Dataset,
    text_col: str,
    gram_len: int,
    min_count: int,
    broadcast_budget: int,
):
    """(object-store ref of the SORTED duplicated-hash array, or None
    past the budget; the materialized dup dataset for the distributed
    fallback).  Materialized once — count() and the gather below would
    otherwise each re-execute the counting pipeline."""
    dup = _dup_hash_dataset(ds, text_col, gram_len, min_count).materialize()
    if dup.count() > broadcast_budget:
        return None, dup
    parts = [
        np.asarray(b["h"], dtype=np.int64)
        for b in dup.iter_batches(batch_format="numpy")
    ]
    dup_sorted = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    return ray.put(dup_sorted), dup


def _make_mark_fn(dup_ref, gram_len: int, text_col: str, id_col: str):
    """Task-based mark pass: the sorted duplicated-hash array ships
    once via ``ray.put``; ``ray.get`` inside the task is a zero-copy
    plasma mmap after the first fetch per worker (no actor-pool
    spin-up — the state is one read-only array, not expensive init).
    Each batch marks its windows with one searchsorted and merges
    spans locally (a doc's windows are always whole inside its batch
    row)."""

    def mark(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        _require_unique_ids(ids, "dup_spans")
        h, gparent, pos, _ = grams_with_pos(batch[text_col], gram_len)
        marked = _mark_against(dup, h)
        if not marked.any():
            return _SPANS_SCHEMA.empty_table()
        return spans_from_marks(ids[gparent[marked]], pos[marked], gram_len)

    return mark


_CUT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("text_cut", pa.string()), ("n_removed", pa.int64())]
)


def _make_cut_fn(dup_ref, gram_len: int, text_col: str, id_col: str):
    """Fused broadcast cut: mark + window-coverage + text rebuild in
    one batch pass.  Coverage by raw marked windows equals coverage by
    merged maximal spans (merging only joins overlapping/adjacent
    ranges), so the span table is never built."""

    def cut(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        h, gparent, pos, toks, parent, counts = _grams_full(batch[text_col], gram_len)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        _require_unique_ids(ids, "cut_dup_spans")
        marked = _mark_against(dup, h)
        T = len(toks)
        starts = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        diff = np.zeros(T + 1, dtype=np.int64)
        if marked.any():
            base = starts[gparent[marked]]
            mp = pos[marked]
            np.add.at(diff, base + mp, 1)
            np.add.at(diff, base + mp + gram_len, -1)  # windows never straddle docs
        keep = np.cumsum(diff[:T]) == 0
        kept_counts = (
            np.bincount(parent[keep], minlength=len(counts)).astype(np.int64)
            if T
            else np.zeros(len(counts), np.int64)
        )
        offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=offsets[1:])
        kept_toks = toks.filter(pa.array(keep)) if T else toks
        if isinstance(kept_toks, pa.ChunkedArray):
            kept_toks = kept_toks.combine_chunks()
        kept_list = list_array_auto(offsets, kept_toks)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "text_cut": pc.binary_join(kept_list, " "),
                "n_removed": pa.array(counts - kept_counts),
            }
        )

    return cut


def dup_spans(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_len: int = 4,
    min_count: int = 2,
    broadcast_budget: int = 5_000_000,
    num_partitions: "int | None" = None,
) -> ray.data.Dataset:
    """Maximal duplicated token spans per document:
    (doc_id, start_tok, end_tok, n_grams), token positions 0-based,
    ``end_tok`` exclusive.  See the module docstring for the two-pass
    scale shape."""
    ref, dup = _dup_hash_ref(ds, text_col, gram_len, min_count, broadcast_budget)
    if ref is not None:
        return ds.select_columns([id_col, text_col]).map_batches(
            _make_mark_fn(ref, gram_len, text_col, id_col),
            batch_format="pyarrow",
        )
    return _dup_spans_distributed(ds, dup, text_col, id_col, gram_len, num_partitions)


def _dup_spans_distributed(
    ds: ray.data.Dataset,
    dup: ray.data.Dataset,
    text_col: str,
    id_col: str,
    gram_len: int,
    num_partitions: "int | None",
) -> ray.data.Dataset:
    # distributed mark: hash-partitioned semi-join of window occurrences
    # against the duplicated-hash set, then doc-partitioned span merge.
    P = num_partitions or default_partitions()
    mark_schema = pa.schema(
        [
            ("h", pa.int64()),
            ("doc_id", pa.int64()),
            ("pos", pa.int64()),
            ("_dup", pa.int64()),
            ("_part", pa.int64()),
        ]
    )

    def emit_windows(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        _require_unique_ids(ids, "dup_spans")
        h, gparent, pos, _ = grams_with_pos(b[text_col], gram_len)
        if not len(h):
            return mark_schema.empty_table()
        return pa.table(
            {
                "h": pa.array(h, pa.int64()),
                "doc_id": pa.array(ids[gparent]),
                "pos": pa.array(pos),
                "_dup": pa.nulls(len(h), pa.int64()),
                "_part": pa.array(h % P),
            }
        )

    def tag_dup(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return mark_schema.empty_table()
        h = np.asarray(b["h"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "h": pa.array(h, pa.int64()),
                "doc_id": pa.nulls(len(h), pa.int64()),
                "pos": pa.nulls(len(h), pa.int64()),
                "_dup": pa.array(np.ones(len(h), dtype=np.int64)),
                "_part": pa.array(h % P),
            }
        )

    unioned = (
        ds.select_columns([id_col, text_col])
        .map_batches(emit_windows, batch_format="pyarrow")
        .union(dup.map_batches(tag_dup, batch_format="pyarrow"))
    )

    def semi(group: pa.Table) -> pa.Table:
        if not group.num_rows:
            return pa.schema(
                [("doc_id", pa.int64()), ("pos", pa.int64()), ("_dpart", pa.int64())]
            ).empty_table()
        is_dup = np.asarray(pc.is_valid(group["_dup"]).to_numpy(zero_copy_only=False))
        dup_set = np.unique(np.asarray(group["h"].to_numpy(zero_copy_only=False), dtype=np.int64)[is_dup])
        wins = group.filter(pa.array(~is_dup))
        wh = np.asarray(wins["h"].to_numpy(zero_copy_only=False), dtype=np.int64)
        keep = _mark_against(dup_set, wh)  # dup_set is sorted (np.unique)
        docs = np.asarray(wins["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)[keep]
        pos = np.asarray(wins["pos"].to_numpy(zero_copy_only=False), dtype=np.int64)[keep]
        return pa.table(
            {
                "doc_id": pa.array(docs),
                "pos": pa.array(pos),
                "_dpart": pa.array(docs % P),
            }
        )

    marks = unioned.groupby("_part").map_groups(semi, batch_format="pyarrow")

    def merge_group(group: pa.Table) -> pa.Table:
        if not group.num_rows:
            return _SPANS_SCHEMA.empty_table()
        docs = np.asarray(group["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        pos = np.asarray(group["pos"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.lexsort((pos, docs))
        docs, pos = docs[order], pos[order]
        # identical-content duplicate docs across batches collide on
        # (doc, pos) here — the cross-batch half of the uniqueness
        # contract (the per-batch half is checked at emit_windows)
        dup = (docs[1:] == docs[:-1]) & (pos[1:] == pos[:-1])
        if dup.any():
            bad = np.unique(docs[1:][dup])[:5]
            raise ValueError(f"dup_spans: doc_id must be unique; duplicates: {bad.tolist()}")
        return spans_from_marks(docs, pos, gram_len)

    return marks.groupby("_dpart").map_groups(merge_group, batch_format="pyarrow")


def cut_dup_spans(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_len: int = 4,
    min_count: int = 2,
    broadcast_budget: int = 5_000_000,
    num_partitions: "int | None" = None,
) -> ray.data.Dataset:
    """Remove every duplicated span from every document (the
    aggressive variant: ALL occurrences go, which keeps the semantics
    join-free and exactly SQL-mirrorable).  Output
    (doc_id, text_cut, n_removed) where ``text_cut`` is the kept
    tokens space-joined in order (the tokenizer's lowercased
    normalization, like every text op in this package) and
    ``n_removed`` counts dropped tokens.

    Below ``broadcast_budget`` duplicated hashes the whole cut is ONE
    fused map_batches pass (mark + coverage + rebuild per batch — no
    span table, no shuffle: coverage by marked windows equals coverage
    by merged spans).  Past the budget, documents co-group with their
    spans by ``doc_id % P`` — each rebuild task holds one partition,
    never the corpus.

    ``id_col`` values must be UNIQUE: the distributed rebuild resolves
    spans to docs by id (duplicates would attach every span to only the
    first matching row; its guarded lookup raises rather than silently
    diverging from the broadcast path, which tolerates duplicates)."""
    ref, dup = _dup_hash_ref(ds, text_col, gram_len, min_count, broadcast_budget)
    if ref is not None:
        return ds.select_columns([id_col, text_col]).map_batches(
            _make_cut_fn(ref, gram_len, text_col, id_col),
            batch_format="pyarrow",
        )
    spans = _dup_spans_distributed(ds, dup, text_col, id_col, gram_len, num_partitions)
    P = num_partitions or default_partitions()
    tag_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("start_tok", pa.int64()),
            ("end_tok", pa.int64()),
            ("_part", pa.int64()),
        ]
    )

    def tag_docs(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return tag_schema.empty_table()
        ids = np.asarray(b[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                # fill nulls: the rebuild routes rows by text validity
                # (doc vs span), so a null-text DOCUMENT would land on
                # the span side and crash the lookup — the broadcast
                # path already treats null text as "" (flat_tokens)
                "text": pc.fill_null(b[text_col], ""),
                "start_tok": pa.nulls(b.num_rows, pa.int64()),
                "end_tok": pa.nulls(b.num_rows, pa.int64()),
                "_part": pa.array(ids % P),
            }
        )

    def tag_spans(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return tag_schema.empty_table()
        ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "text": pa.nulls(b.num_rows, pa.string()),
                "start_tok": b["start_tok"],
                "end_tok": b["end_tok"],
                "_part": pa.array(ids % P),
            }
        )

    unioned = (
        ds.select_columns([id_col, text_col])
        .map_batches(tag_docs, batch_format="pyarrow")
        .union(spans.map_batches(tag_spans, batch_format="pyarrow"))
    )

    def rebuild(group: pa.Table) -> pa.Table:
        if not group.num_rows:
            return _CUT_SCHEMA.empty_table()
        is_doc = np.asarray(pc.is_valid(group["text"]).to_numpy(zero_copy_only=False))
        docs = group.filter(pa.array(is_doc))
        spns = group.filter(pa.array(~is_doc))
        ids = np.asarray(docs["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        toks, parent, counts = flat_tokens(docs["text"])
        T = len(toks)
        starts = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        # coverage over the partition's token tape via difference array
        diff = np.zeros(T + 1, dtype=np.int64)
        if spns.num_rows:
            sid = np.asarray(spns["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
            s0 = np.asarray(spns["start_tok"].to_numpy(zero_copy_only=False), dtype=np.int64)
            s1 = np.asarray(spns["end_tok"].to_numpy(zero_copy_only=False), dtype=np.int64)
            id_order = np.argsort(ids)
            id_sorted = ids[id_order]
            # guarded lookup: a span whose doc is absent from this
            # partition (corrupt partitioning) or a duplicated doc_id
            # (spans resolve to only the FIRST matching row — see the
            # uniqueness contract in cut_dup_spans) must fail loudly
            # instead of raising an opaque IndexError / silently
            # cutting a neighboring doc's coverage
            hit = np.searchsorted(id_sorted, sid)
            if len(id_sorted) == 0:
                raise ValueError("cut_dup_spans: partition has spans but no docs")
            if (id_sorted[1:] == id_sorted[:-1]).any():
                d = id_sorted[1:][id_sorted[1:] == id_sorted[:-1]][:5]
                raise ValueError(
                    f"cut_dup_spans: doc_id must be unique; duplicates: {d.tolist()}"
                )
            hit = np.minimum(hit, len(id_sorted) - 1)
            if not (id_sorted[hit] == sid).all():
                missing = sid[id_sorted[hit] != sid][:5]
                raise ValueError(
                    f"cut_dup_spans: span docs absent from their partition: {missing.tolist()}"
                )
            didx = id_order[hit]
            base = starts[didx]
            np.add.at(diff, base + s0, 1)
            np.add.at(diff, base + np.minimum(s1, counts[didx]), -1)
        covered = np.cumsum(diff[:T]) > 0
        keep = ~covered
        kept_counts = np.bincount(parent[keep], minlength=len(counts)).astype(np.int64)
        offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=offsets[1:])
        kept_toks = toks.filter(pa.array(keep))
        if isinstance(kept_toks, pa.ChunkedArray):
            kept_toks = kept_toks.combine_chunks()
        kept_list = list_array_auto(offsets, kept_toks)
        text_cut = pc.binary_join(kept_list, " ")
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "text_cut": text_cut,
                "n_removed": pa.array(counts - kept_counts),
            }
        )

    return unioned.groupby("_part").map_groups(rebuild, batch_format="pyarrow")
