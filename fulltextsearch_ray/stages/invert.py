"""map_batches stages for inverted-index construction.

The build shape (SURVEY.md §3.4):

    read_parquet → map_batches(InvertStage)        # tokenize + LOCAL invert
      → groupby("term").map_groups(merge_runs)     # THE shuffle, key=term
      → write_parquet (term-sorted posting blocks)

``InvertStage`` is the crucial scale lever: instead of exploding one
row per occurrence into the shuffle (10×+ the corpus size), each input
batch is inverted LOCALLY into one encoded posting run per distinct
term — the partial/combiner pattern.  A stop-word term then contributes
one compressed run per batch (not one row per occurrence), which also
bounds the skew a single groupby key can see: the merge of a hot term
handles ~#batches compressed runs, not raw occurrences.

This replaces the reference's single-threaded in-RAM
``SortedDictionary<string, List<Occurrence>>`` accumulation
(``FullTextIndexBuilder.cs:11,104-140``) with per-batch bounded state.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..codecs import (
    PostingBlock,
    decode_posting_block,
    encode_posting_block,
    varint_decode,
    varint_encode_offsets,
)
from ..state.index import POSTINGS_SCHEMA
from ..tokenizer import DEFAULT_FIELD_ID, tokenize_batch

# Target occurrences per encoded posting block. Bounds both the decode
# unit at query time and row size in the shuffle.
DEFAULT_BLOCK_CF = 1 << 16


_HEAP_WARMED = False


def _warm_heap(mb: int = 0) -> None:
    """Keep worker heap pages resident (and optionally pre-fault them).

    This environment (like many virtualized hosts) provisions memory
    lazily: the FIRST touch of fresh pages can be 10-40x slower than
    warm pages, making per-task numpy time wildly bimodal (observed
    1.2s vs 16s on identical blocks).  Fix, applied once per worker
    process:

    * ``mallopt(M_MMAP_MAX=0)`` + huge ``M_TRIM_THRESHOLD`` so large
      numpy allocations come from the persistent brk heap instead of
      fresh (cold) mmaps that are unmapped on free — pages then fault
      once per WORKER instead of once per allocation;
    * ``mb > 0`` additionally pre-faults that many MiB up front
      (OPT-IN; the default callers rely on the mallopt half alone and
      let first-batch work fault the heap once).

    Paid once per worker PROCESS (module-global memo): Ray reuses task
    workers, so with task-pool stages the warmup amortizes exactly as
    it did under actors.  The settings are deliberately process-wide —
    every stage of this engine wants single-threaded Arrow kernels
    (parallelism comes from Ray) and a persistent brk heap, so
    "leaking" into a reused worker that later runs merge/sort/write
    tasks is the intended steady state, not contamination.
    """
    global _HEAP_WARMED
    if _HEAP_WARMED:
        return
    _HEAP_WARMED = True
    # Stage parallelism comes from Ray, not Arrow's internal pool:
    # without this every worker's Arrow kernels fan out over ALL host
    # cores, oversubscribing the box and silently inflating low-
    # parallelism benchmarks (Arrow's pool ignores ray num_cpus).
    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-4, 0)        # M_MMAP_MAX = 0
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD = 1 GiB
    except OSError:  # non-glibc platform: warmup below still helps
        pass
    if mb > 0:
        buf = np.empty(mb * 1024 * 1024 // 8, dtype=np.int64)
        buf[::512] = 1  # touch every page
        del buf


def term_bucket(term: str, num_buckets: int) -> int:
    """Stable term → partition bucket (crc32 — deterministic across
    processes/nodes, unlike Python's salted hash())."""
    return zlib.crc32(term.encode("utf-8")) % num_buckets


def _posting_rows(
    terms_sorted: np.ndarray,
    bounds: np.ndarray,
    occ_docs: np.ndarray,
    occ_fields: np.ndarray,
    occ_tokens: np.ndarray,
    num_buckets: int,
    block_cf: int,
) -> pa.Table:
    """Encode per-term occurrence slices into posting block rows,
    chunking long lists at ~``block_cf`` occurrences.  Chunk points
    snap to DOC boundaries (the first entry of a new doc) so a
    document never spans two blocks — per-block ``n_docs`` counts sum
    to the true per-term df in the catalog roll-up.  Fallbacks, in
    order, when a single doc / entry exceeds ``block_cf``: entry
    boundary (a multi-field doc splits, inflating that term's summed
    n_docs by one per extra block), then mid-entry.
    """
    cols: dict[str, list] = {k: [] for k in POSTINGS_SCHEMA.names}
    for i, term in enumerate(terms_sorted):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        bucket = term_bucket(term, num_buckets)
        block_id = 0
        d = occ_docs[lo:hi]
        f = occ_fields[lo:hi]
        echange = np.empty(hi - lo, dtype=bool)
        dchange = np.empty(hi - lo, dtype=bool)
        if hi > lo:
            echange[0] = True
            np.logical_or(d[1:] != d[:-1], f[1:] != f[:-1], out=echange[1:])
            dchange[0] = True
            np.not_equal(d[1:], d[:-1], out=dchange[1:])
        entry_starts = np.flatnonzero(echange) + lo
        doc_starts = np.flatnonzero(dchange) + lo
        s = lo
        while s < hi:
            cap = s + block_cf
            if cap >= hi:
                e = hi
            else:
                j = int(np.searchsorted(doc_starts, cap, side="right")) - 1
                e = int(doc_starts[j])
                if e <= s:  # one doc exceeds block_cf: split at an entry
                    j = int(np.searchsorted(entry_starts, cap, side="right")) - 1
                    e = int(entry_starts[j])
                    if e <= s:  # one ENTRY exceeds block_cf: split mid-entry
                        e = min(cap, hi)
            blk: PostingBlock = encode_posting_block(
                occ_docs[s:e], occ_fields[s:e], occ_tokens[s:e]
            )
            blk_docs = occ_docs[s:e]
            cols["term"].append(term)
            cols["bucket"].append(bucket)
            cols["block_id"].append(block_id)
            cols["first_doc"].append(blk.first_doc)
            cols["last_doc"].append(blk.last_doc)
            cols["df"].append(blk.df)
            cols["cf"].append(blk.cf)
            cols["max_tf"].append(blk.max_tf)
            cols["n_docs"].append(
                1 + int(np.count_nonzero(blk_docs[1:] != blk_docs[:-1])) if e > s else 0
            )
            cols["docs"].append(blk.docs)
            cols["fields"].append(blk.fields)
            cols["tfs"].append(blk.tfs)
            cols["positions"].append(blk.positions)
            block_id += 1
            s = e
    return pa.table(
        {name: pa.array(cols[name], type=POSTINGS_SCHEMA.field(name).type) for name in POSTINGS_SCHEMA.names}
    )


def _binary_column(buf: np.ndarray, ends: np.ndarray, value_bounds: np.ndarray) -> pa.Array:
    """Zero-copy Arrow binary column: slice one global varint buffer
    into per-term payloads via an offsets buffer (no bytes copies)."""
    byte_ends = np.r_[np.int64(0), ends]
    if len(buf) >= (1 << 31):  # real exception: asserts vanish under -O
        raise ValueError("batch payload exceeds int32 binary offsets — lower batch_size")
    offsets = byte_ends[value_bounds].astype(np.int32)
    # py_buffer wraps the ndarrays via the buffer protocol (keeps them
    # alive, zero-copy) — .tobytes() here duplicated every encoded
    # payload on a memory-bandwidth-bound stage
    return pa.Array.from_buffers(
        pa.binary(), len(value_bounds) - 1,
        [None, pa.py_buffer(np.ascontiguousarray(offsets)),
         pa.py_buffer(np.ascontiguousarray(buf))],
    )


def _posting_rows_vectorized(
    terms_sorted: np.ndarray,
    bounds: np.ndarray,
    occ_docs: np.ndarray,
    occ_fields: np.ndarray,
    occ_tokens: np.ndarray,
    num_buckets: int,
    block_cf: int = DEFAULT_BLOCK_CF,
) -> pa.Table:
    """Encode ALL terms of a batch in four global varint passes.

    No per-term Python loop (except the trivial crc32 bucket pass):
    entry detection, delta resets at term/entry starts, per-term stats
    and the byte-slicing into per-term binary payloads are all numpy /
    Arrow-buffer operations.  Emits ONE block row per (term, batch)
    for terms within ``block_cf``; oversized (stop-word-heavy) terms
    take the chunking loop path so every stored block stays bounded.
    """
    T = len(terms_sorted)
    n = len(occ_docs)
    if n == 0:
        return POSTINGS_SCHEMA.empty_table()
    const_field = occ_fields is None  # single-field corpus fast path
    cf_per_term = np.diff(bounds)
    big = cf_per_term > block_cf
    if big.any():
        # split: vectorized path for normal terms, chunked loop for the
        # few heavy ones (skew path — bounded block sizes)
        occ_keep = np.repeat(~big, cf_per_term)
        sub_bounds = np.zeros(int((~big).sum()) + 1, dtype=np.int64)
        np.cumsum(cf_per_term[~big], out=sub_bounds[1:])
        tables = []
        if sub_bounds[-1] > 0:
            tables.append(
                _posting_rows_vectorized(
                    terms_sorted[~big], sub_bounds,
                    occ_docs[occ_keep],
                    None if const_field else occ_fields[occ_keep],
                    occ_tokens[occ_keep],
                    num_buckets, block_cf,
                )
            )
        big_keep = ~occ_keep
        big_bounds = np.zeros(int(big.sum()) + 1, dtype=np.int64)
        np.cumsum(cf_per_term[big], out=big_bounds[1:])
        big_fields = (
            np.full(int(big_bounds[-1]), DEFAULT_FIELD_ID, dtype=np.uint64)
            if const_field
            else occ_fields[big_keep]
        )
        tables.append(
            _posting_rows(
                terms_sorted[big], big_bounds,
                occ_docs[big_keep], big_fields, occ_tokens[big_keep],
                num_buckets, block_cf,
            )
        )
        return pa.concat_tables(tables).combine_chunks()
    term_of_occ = np.repeat(np.arange(T, dtype=np.int64), cf_per_term)

    # entry = distinct (term, doc, field)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(occ_docs[1:], occ_docs[:-1], out=change[1:])
    if not const_field:
        change[1:] |= occ_fields[1:] != occ_fields[:-1]
    change[1:] |= term_of_occ[1:] != term_of_occ[:-1]
    entry_starts = np.flatnonzero(change)
    e_docs = occ_docs[entry_starts]
    e_term = term_of_occ[entry_starts]
    tfs = np.diff(np.r_[entry_starts, n]).astype(np.uint64)

    df_per_term = np.bincount(e_term, minlength=T)
    e_bounds = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(df_per_term, out=e_bounds[1:])

    # doc gaps reset at term starts (gap vs 0 == absolute)
    d_deltas = np.empty_like(e_docs)
    d_deltas[0] = e_docs[0]
    np.subtract(e_docs[1:], e_docs[:-1], out=d_deltas[1:])
    d_deltas[e_bounds[:-1]] = e_docs[e_bounds[:-1]]
    # token gaps reset at entry starts
    t_deltas = np.empty_like(occ_tokens)
    t_deltas[0] = occ_tokens[0]
    np.subtract(occ_tokens[1:], occ_tokens[:-1], out=t_deltas[1:])
    t_deltas[entry_starts] = occ_tokens[entry_starts]

    docs_b, docs_ends = varint_encode_offsets(d_deltas)
    if const_field and DEFAULT_FIELD_ID < 128:
        # constant field id ⇒ every entry encodes to one identical
        # varint byte; build the buffer directly, no uint64 array
        E = len(e_docs)
        fields_b = np.full(E, DEFAULT_FIELD_ID, dtype=np.uint8)
        fields_ends = np.arange(1, E + 1, dtype=np.int64)
    else:
        fields_b, fields_ends = varint_encode_offsets(occ_fields[entry_starts])
    tfs_b, tfs_ends = varint_encode_offsets(tfs)
    pos_b, pos_ends = varint_encode_offsets(t_deltas)

    first_doc = e_docs[e_bounds[:-1]]
    last_doc = e_docs[e_bounds[1:] - 1]
    max_tf = np.maximum.reduceat(tfs, e_bounds[:-1]).astype(np.int64)
    # distinct docs per term: entries where the doc (or term) changes
    dchange = np.empty(len(e_docs), dtype=bool)
    dchange[0] = True
    np.not_equal(e_docs[1:], e_docs[:-1], out=dchange[1:])
    dchange[1:] |= e_term[1:] != e_term[:-1]
    n_docs_per_term = np.bincount(e_term[dchange], minlength=T)
    # term_bucket is THE bucket contract (query-side pruning depends on
    # it) — never inline the hash here or the two can silently diverge
    buckets = np.fromiter(
        (term_bucket(t, num_buckets) for t in terms_sorted),
        dtype=np.int32, count=T,
    )
    return pa.table(
        {
            "term": pa.array(terms_sorted, pa.string()),
            "bucket": pa.array(buckets, pa.int32()),
            "block_id": pa.array(np.zeros(T, dtype=np.int32)),
            "first_doc": pa.array(first_doc, pa.uint64()),
            "last_doc": pa.array(last_doc, pa.uint64()),
            "df": pa.array(df_per_term.astype(np.int64)),
            "cf": pa.array(cf_per_term.astype(np.int64)),
            "max_tf": pa.array(max_tf),
            "n_docs": pa.array(n_docs_per_term.astype(np.int64)),
            "docs": _binary_column(docs_b, docs_ends, e_bounds),
            "fields": _binary_column(fields_b, fields_ends, e_bounds),
            "tfs": _binary_column(tfs_b, tfs_ends, e_bounds),
            "positions": _binary_column(pos_b, pos_ends, bounds.astype(np.int64)),
        }
    )


DOCSTATS_TERM_PREFIX = "\x00docs:"  # '\x00' can never appear in a token


def encode_docstats_row(doc_ids: np.ndarray, doc_lens: np.ndarray, shas: list[str], num_occ: int) -> dict:
    """Pack one batch's per-doc stats as a sentinel posting row.

    Fusing doc stats into the invert pass halves the corpus passes
    (one tokenize instead of two) and drops a whole actor pool; the
    rows travel through the same shuffle/write (bucket = -1, term =
    '\\x00docs:<first_doc>' so each batch stays its own group) and are
    split back out into the docs table after the postings write.
    """
    from ..codecs import varint_encode

    # ONE id sort aligns all three parallel payloads — a prior version
    # sorted docs/doc_lens but left the sha blob in batch-row order,
    # pairing each doc with a NEIGHBOR's sha256 whenever the batch's
    # ids arrived unsorted (assign_doc_ids rank path)
    order = np.argsort(doc_ids, kind="stable") if len(doc_ids) else np.empty(0, np.int64)
    sorted_ids = doc_ids[order]
    return {
        "term": f"{DOCSTATS_TERM_PREFIX}{int(sorted_ids[0]) if len(doc_ids) else 0}",
        "bucket": -1,
        "block_id": 0,
        "first_doc": int(sorted_ids[0]) if len(doc_ids) else 0,
        "last_doc": int(sorted_ids[-1]) if len(doc_ids) else 0,
        "df": int(len(doc_ids)),
        "cf": int(num_occ),
        "max_tf": 0,
        "n_docs": int(len(doc_ids)),
        "docs": varint_encode(sorted_ids) if len(doc_ids) else b"",
        "fields": b"",
        "tfs": varint_encode(doc_lens[order]) if len(doc_ids) else b"",
        "positions": "".join(shas[int(i)] for i in order).encode("ascii"),
    }


def canonical_doc_texts(batch: pa.Table, text_col: str, text_cols) -> list[str]:
    """THE canonical per-doc text the sha256 invariant hashes: the
    '\\x1f'-join of ``text_cols`` (None → "") or the single
    ``text_col``.  One definition shared by the fused invert sentinel
    (InvertStage._docstats_table) and the standalone DocStatsStage —
    the two must produce byte-identical hash inputs or docs and
    docs_meta silently disagree (a prior fork did exactly that)."""
    if text_cols:
        cols = [batch[c].to_pylist() for c in text_cols]
        return ["\x1f".join(v or "" for v in row) for row in zip(*cols)]
    return [t if t is not None else "" for t in batch[text_col].to_pylist()]


def decode_docstats_rows(tbl: pa.Table) -> pa.Table:
    """Sentinel rows → docs table (doc_id, doc_len, sha256)."""
    ids, lens, shas = [], [], []
    for i in range(tbl.num_rows):
        d = varint_decode(tbl["docs"][i].as_py())
        l = varint_decode(tbl["tfs"][i].as_py())
        blob = tbl["positions"][i].as_py().decode("ascii")
        ids.append(d)
        lens.append(l)
        shas.extend(blob[j : j + 64] for j in range(0, len(blob), 64))
    if not ids:
        return pa.table(
            {"doc_id": pa.array([], pa.uint64()), "doc_len": pa.array([], pa.int64()),
             "sha256": pa.array([], pa.string())}
        )
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(ids), pa.uint64()),
            "doc_len": pa.array(np.concatenate(lens).astype(np.int64)),
            "sha256": pa.array(shas, pa.string()),
        }
    )


class InvertStage:
    """Callable batch stage: (doc_id, text) batch → posting run rows
    plus one fused doc-stats sentinel row per batch (doc_len for BM25,
    sha256 invariant).

    Runs as a TASK pool via :func:`invert_batch_fn` (construction is
    config-only; the heap warmup is memoized per worker process).
    """

    def __init__(
        self,
        text_col: str = "text",
        doc_id_col: str = "doc_id",
        num_buckets: int = 64,
        block_cf: int = DEFAULT_BLOCK_CF,
        field_id: int = DEFAULT_FIELD_ID,
        emit_docstats: bool = False,
        text_cols: "list[str] | None" = None,
    ):
        # text_cols: compound documents — field ids 1..N assigned in
        # column order (the reference's AddCompound contract,
        # FullTextIndexBuilder.cs:57-62); overrides text_col.
        self.text_cols = list(text_cols) if text_cols else None
        self.text_col = text_col
        self.doc_id_col = doc_id_col
        self.num_buckets = num_buckets
        self.block_cf = block_cf
        self.field_id = field_id
        self.emit_docstats = emit_docstats
        _warm_heap()

    def _docstats_table(self, batch: pa.Table, doc_ids: np.ndarray, counts: np.ndarray) -> pa.Table:
        import hashlib

        texts = canonical_doc_texts(batch, self.text_col, self.text_cols)
        shas = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]
        row = encode_docstats_row(doc_ids, counts, shas, int(counts.sum()))
        return pa.table(
            {k: pa.array([row[k]], type=POSTINGS_SCHEMA.field(k).type) for k in POSTINGS_SCHEMA.names}
        )

    def _tokenize_multi(self, batch: pa.Table, doc_ids: np.ndarray):
        """Compound documents: tokenize each field column, assign field
        ids 1..N in column order, lexsort to (doc, field, token)."""
        parts = []
        counts_total = np.zeros(batch.num_rows, dtype=np.int64)
        for fid, col in enumerate(self.text_cols, start=1):
            tok = tokenize_batch(batch[col])
            counts_total += tok.counts
            parts.append((fid, tok))
        terms = pa.concat_arrays(
            [t.terms.combine_chunks() if isinstance(t.terms, pa.ChunkedArray) else t.terms for _, t in parts]
        )
        occ_docs = np.concatenate([doc_ids[t.doc_index] for _, t in parts])
        occ_fields = np.concatenate(
            [np.full(len(t.token_ids), fid, dtype=np.uint64) for fid, t in parts]
        )
        occ_tokens = np.concatenate([t.token_ids for _, t in parts])
        order = np.lexsort((occ_tokens, occ_fields, occ_docs))
        return (
            terms.take(pa.array(order)),
            occ_docs[order], occ_fields[order], occ_tokens[order],
            counts_total,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch[self.doc_id_col].to_numpy(zero_copy_only=False), dtype=np.uint64)
        # duplicate ids within a batch (possible only from a user
        # doc_id_col — positional/rank assignment is unique by
        # construction) would MERGE two documents' occurrence streams
        # into one posting entry with non-monotonic token positions
        # (phrase/adjacency queries silently wrong) and emit two doc
        # rows inflating num_docs/avgdl — fail loudly instead.  Ids
        # duplicated ACROSS batches/sessions are the same contract
        # violation; they surface as doc-length lookup inconsistencies.
        if len(doc_ids) > 1 and np.unique(doc_ids).size != len(doc_ids):
            dup = np.sort(doc_ids)
            dup = np.unique(dup[1:][dup[1:] == dup[:-1]])[:5]
            raise ValueError(
                f"build_index: doc_id must be unique; duplicates in batch: {dup.tolist()}"
            )
        if self.text_cols:
            terms, occ_docs, occ_fields, occ_tokens, counts = self._tokenize_multi(batch, doc_ids)
            stats = self._docstats_table(batch, doc_ids, counts) if self.emit_docstats else None
            if len(occ_docs) == 0:
                return stats if stats is not None else POSTINGS_SCHEMA.empty_table()
            return self._invert_sorted(terms, occ_docs, occ_fields, occ_tokens, stats)
        tok = tokenize_batch(batch[self.text_col])
        stats = (
            self._docstats_table(batch, doc_ids, tok.counts) if self.emit_docstats else None
        )
        if len(tok.doc_index) == 0:
            return stats if stats is not None else POSTINGS_SCHEMA.empty_table()

        occ_docs = doc_ids[tok.doc_index]
        occ_tokens = tok.token_ids
        terms = tok.terms
        if len(doc_ids) > 1 and (doc_ids[1:] < doc_ids[:-1]).any():
            # _invert_sorted requires a (doc, token)-ordered occurrence
            # stream (it only stable-sorts by term); positional builds
            # satisfy this for free, but assign_doc_ids' rank ids and
            # user doc_id_col batches can arrive unsorted — without
            # this sort such a batch silently writes corrupt blocks
            # (row-order occurrence streams, wrong first/last_doc,
            # split df entries)
            order = np.lexsort((occ_tokens, occ_docs))
            occ_docs, occ_tokens = occ_docs[order], occ_tokens[order]
            terms = terms.take(pa.array(order))
        # single-field corpora skip the fields array entirely (the
        # constant is synthesized at encode time) — one less 8-byte
        # stream through a memory-bandwidth-bound stage
        const_field = self.field_id == DEFAULT_FIELD_ID
        occ_fields = (
            None if const_field else np.full(len(occ_tokens), self.field_id, dtype=np.uint64)
        )

        return self._invert_sorted(terms, occ_docs, occ_fields, occ_tokens, stats)

    def _invert_sorted(self, terms, occ_docs, occ_fields, occ_tokens, stats):
        # single-field fast path is signalled by occ_fields is None —
        # the one source of truth (_posting_rows_vectorized re-derives
        # it the same way)
        """Local invert of a (doc, field, token)-ordered token stream:
        stable sort by term only — a stable term sort over an already
        (doc, field, token)-ordered stream yields full
        (term, doc, field, token) order without a 3-key lexsort."""
        dict_arr = terms.dictionary_encode()
        codes = np.asarray(dict_arr.indices.to_numpy(zero_copy_only=False))
        vocab = np.asarray(dict_arr.dictionary.to_pylist(), dtype=object)
        vocab_order = np.argsort(vocab, kind="stable")
        rank = np.empty(len(vocab), dtype=np.int64)
        rank[vocab_order] = np.arange(len(vocab))
        keyed = rank[codes]  # one O(n) gather, reused below
        order = np.argsort(keyed, kind="stable")

        occ_docs = occ_docs[order]
        if occ_fields is not None:
            occ_fields = occ_fields[order]
        occ_tokens = occ_tokens[order]
        sorted_codes = keyed[order]
        # term boundaries in the sorted occurrence stream
        counts = np.bincount(sorted_codes, minlength=len(vocab))
        present = counts > 0
        bounds = np.zeros(int(present.sum()) + 1, dtype=np.int64)
        np.cumsum(counts[present], out=bounds[1:])
        terms_sorted = vocab[vocab_order][present]
        rows = _posting_rows_vectorized(
            terms_sorted, bounds, occ_docs, occ_fields, occ_tokens,
            self.num_buckets, self.block_cf,
        )
        if stats is not None:
            rows = pa.concat_tables([rows, stats]).combine_chunks()
        return rows


class ReadInvertStage:
    """Fused file-group stage: read parquet file items → positional doc
    ids → tokenize → local invert (+ doc-stats sentinels).

    Input batches are 1-row file items ``{file, offset}``; the build
    sets ``batch_size`` so several SMALL files bundle into one task.
    Consecutive small files accumulate up to ``chunk_rows`` docs and
    invert TOGETHER — one run per term per group instead of per file,
    which shrinks the term shuffle's row count (and the merge stage's
    segmented work) by the group factor.  Files larger than
    ``chunk_rows`` are processed in slices to bound working memory, as
    before.  Grouping is safe because file items arrive in sorted-path
    order with ascending doc-id offsets, so a group's occurrences stay
    doc-sorted.
    """

    def __init__(
        self,
        text_col: str,
        columns: list[str] | None = None,
        num_buckets: int = 64,
        block_cf: int = DEFAULT_BLOCK_CF,
        chunk_rows: int = 8192,
        text_cols: list[str] | None = None,
    ):
        self.inner = InvertStage(
            text_col=text_col, text_cols=text_cols, doc_id_col="doc_id",
            num_buckets=num_buckets, block_cf=block_cf, emit_docstats=True,
        )
        self.columns = columns
        self.chunk_rows = chunk_rows

    def __call__(self, batch: pa.Table):
        import pyarrow.parquet as pq

        pending: list[pa.Table] = []
        pending_rows = 0

        def flush():
            nonlocal pending, pending_rows
            if not pending:
                return None
            t = pa.concat_tables(pending) if len(pending) > 1 else pending[0]
            pending, pending_rows = [], 0
            return self.inner(t)

        for f, off in zip(batch["file"].to_pylist(), batch["offset"].to_pylist()):
            t = pq.read_table(f, columns=self.columns)
            ids = pa.array(np.arange(off, off + t.num_rows, dtype=np.uint64), pa.uint64())
            t = t.append_column("doc_id", ids)
            if t.num_rows >= self.chunk_rows:
                out = flush()
                if out is not None:
                    yield out
                for s in range(0, t.num_rows, self.chunk_rows):
                    yield self.inner(t.slice(s, self.chunk_rows))
            else:
                pending.append(t)
                pending_rows += t.num_rows
                if pending_rows >= self.chunk_rows:
                    yield flush()
        out = flush()
        if out is not None:
            yield out


def invert_batch_fn(batch: pa.Table, **kw) -> pa.Table:
    """Task-pool entry for :class:`InvertStage`.

    Stage construction is config assignment plus the PROCESS-memoized
    heap warmup, so a plain task pool beats an actor pool for the
    invert: no actor launch/ramp-up on the critical path (an
    interleaved A/B on a 60k-doc build measured ~2× wall for the
    autoscaling actor pool vs tasks) and zero AllToAll-starvation risk
    (a CPU-reserving pool can stall the downstream term sort — see
    functions/similarity.py).  Ray reuses worker processes across
    tasks, so kernels and the warmed heap persist exactly as they
    would in an actor."""
    return InvertStage(**kw)(batch)


def read_invert_batches_fn(batch: pa.Table, **kw):
    """Task-pool entry for :class:`ReadInvertStage` (generator) — see
    :func:`invert_batch_fn` for why tasks, not actors."""
    yield from ReadInvertStage(**kw)(batch)


def _payload_bytes(col: pa.Array) -> np.ndarray:
    """Concatenated payload bytes of a (null-free) binary column in row
    order — a zero-copy view of the Arrow data buffer, never a Python
    bytes-object loop."""
    off = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return data[off[0] : off[-1]]


def merge_runs_batch(batch: pa.Table, block_cf: int = DEFAULT_BLOCK_CF) -> pa.Table:
    """Merge a TERM-SORTED batch of posting runs (many terms at once).

    Replaces ``groupby(term).map_groups(merge_posting_runs)``: after a
    sort-based shuffle on ``term`` every term's runs are contiguous in
    one block, so one ``map_batches`` call merges thousands of terms
    with ZERO per-group scheduling overhead.

    FULLY VECTORIZED (no per-term Python in the common paths) — a
    per-term loop here was the single largest build stage (~14s of a
    40s 200k-doc build) because a synthetic/bench corpus has every term
    fragmented across every input file:

    * single-run terms and doc-stats sentinel rows pass through as one
      ``filter``;
    * HOT terms (disjoint runs, total cf > block_cf — stop words):
      metadata-only block renumber on the whole sub-table, payloads
      untouched (skew safety);
    * FRAGMENTED terms (disjoint runs, total cf ≤ block_cf — the bulk):
      ONE segmented varint decode of every payload concatenated
      (delta resets at block/entry starts via the
      ``decode_posting_columns`` prefix-sum trick, generalized across
      terms) followed by the 4-pass global encoder
      ``_posting_rows_vectorized``;
    * genuinely overlapping runs (multi-field boundary docs,
      out-of-order ingest — rare) keep the exact per-term
      ``merge_posting_runs`` path.
    """
    n = batch.num_rows
    if n == 0:
        return batch
    terms = batch["term"]
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    import pyarrow.compute as _pc

    dict_arr = terms.dictionary_encode()
    codes = np.asarray(dict_arr.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    sent_code = np.asarray(
        _pc.starts_with(dict_arr.dictionary, pattern=DOCSTATS_TERM_PREFIX).to_numpy(
            zero_copy_only=False
        )
    )
    first = np.asarray(batch["first_doc"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    blk_id = np.asarray(batch["block_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    # canonical per-term run order: the sort shuffle guarantees term
    # contiguity but not intra-term order
    order = np.lexsort((blk_id, first, codes))
    if not np.array_equal(order, np.arange(n)):
        batch = batch.take(pa.array(order)).combine_chunks()
        codes, first = codes[order], first[order]
        terms = batch["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
    last = np.asarray(batch["last_doc"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    cf = np.asarray(batch["cf"].to_numpy(zero_copy_only=False), dtype=np.int64)

    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(codes[1:], codes[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    counts = np.diff(np.r_[starts, n])
    single = counts == 1
    sent = sent_code[codes[starts]]
    if (single | sent).all():
        return batch
    # per-term strict disjointness (equal boundary docs = overlap —
    # multi-field docs split across batches take the exact slow path)
    okrow = np.ones(n, dtype=bool)
    okrow[1:] = (last[:-1] < first[1:]) | (codes[1:] != codes[:-1])
    disjoint = np.logical_and.reduceat(okrow, starts)
    total_cf = np.add.reduceat(cf, starts)

    multi = ~single & ~sent
    frag = multi & disjoint & (total_cf <= block_cf)
    hot = multi & disjoint & ~frag
    slow = multi & ~disjoint

    out_tables = []
    pass_rows = np.repeat(single | sent, counts)
    if pass_rows.any():
        out_tables.append(batch.filter(pa.array(pass_rows)))
    if hot.any():
        # metadata-only renumber: block_id = position within the term's
        # (first_doc, block_id)-ordered run; payloads untouched
        pos_in_term = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        hot_rows = np.repeat(hot, counts)
        sub = batch.filter(pa.array(hot_rows))
        sub = sub.set_column(
            sub.schema.get_field_index("block_id"),
            "block_id",
            pa.array(pos_in_term[hot_rows].astype(np.int32)),
        )
        out_tables.append(sub)
    if frag.any():
        frag_rows = np.repeat(frag, counts)
        sub = batch.filter(pa.array(frag_rows)).combine_chunks()
        dfs = np.asarray(sub["df"].to_numpy(zero_copy_only=False), dtype=np.int64)
        # segmented decode of every block at once: doc deltas reset at
        # block starts, token deltas at entry starts (same math as
        # decode_posting_columns, generalized across terms)
        e_deltas = varint_decode(_payload_bytes(sub["docs"].combine_chunks()))
        e_fields = varint_decode(_payload_bytes(sub["fields"].combine_chunks()))
        e_tfs = varint_decode(_payload_bytes(sub["tfs"].combine_chunks()))
        tok_d = varint_decode(_payload_bytes(sub["positions"].combine_chunks()))
        bstarts = np.zeros(len(dfs), dtype=np.int64)
        np.cumsum(dfs[:-1], out=bstarts[1:])
        csum = np.cumsum(e_deltas, dtype=np.uint64)
        base = csum[bstarts] - e_deltas[bstarts]
        e_docs = csum - np.repeat(base, dfs)
        reps = e_tfs.astype(np.int64)
        estarts = np.zeros(len(reps), dtype=np.int64)
        np.cumsum(reps[:-1], out=estarts[1:])
        tcsum = np.cumsum(tok_d, dtype=np.uint64)
        tbase = tcsum[estarts] - tok_d[estarts]
        occ_tokens = tcsum - np.repeat(tbase, reps)
        occ_docs = np.repeat(e_docs, reps)
        occ_fields = np.repeat(e_fields, reps)
        f_starts = starts[frag]
        cf_f = total_cf[frag]
        bounds_f = np.zeros(len(cf_f) + 1, dtype=np.int64)
        np.cumsum(cf_f, out=bounds_f[1:])
        terms_f = np.asarray(terms.take(pa.array(f_starts)).to_pylist(), dtype=object)
        tbl_f = _posting_rows_vectorized(
            terms_f, bounds_f, occ_docs, occ_fields, occ_tokens,
            num_buckets=1, block_cf=block_cf,
        )
        # every frag term fits one block ⇒ tbl_f is one row per term in
        # term order; restore the ORIGINAL bucket ids (merge doesn't
        # know num_buckets)
        buckets_f = batch["bucket"].take(pa.array(f_starts))
        tbl_f = tbl_f.set_column(
            tbl_f.schema.get_field_index("bucket"), "bucket", buckets_f.combine_chunks()
        )
        out_tables.append(tbl_f)
    for s, c in zip(starts[slow], counts[slow]):
        out_tables.append(merge_posting_runs(batch.slice(int(s), int(c)), block_cf=block_cf))
    return pa.concat_tables(out_tables).combine_chunks()


def merge_posting_runs(group: pa.Table, block_cf: int = DEFAULT_BLOCK_CF) -> pa.Table:
    """Merge all partial runs of ONE term into canonical blocks.

    Fast path: when runs cover pairwise-disjoint doc ranges (the normal
    case — doc ids are assigned contiguously per input block), merged
    output = runs ordered by first_doc with renumbered block ids; the
    encoded payloads are reused as-is (zero re-encode), and small
    adjacent runs are coalesced up to ``block_cf``.

    Slow path (overlapping ranges, e.g. multi-field or out-of-order
    ingest): decode, lexsort, re-encode.
    """
    term0 = group["term"][0].as_py()
    if term0.startswith(DOCSTATS_TERM_PREFIX):
        return group  # fused doc-stats sentinel rows pass through untouched
    order = np.lexsort(
        (
            np.asarray(group["block_id"].to_numpy(zero_copy_only=False)),
            np.asarray(group["first_doc"].to_numpy(zero_copy_only=False)),
        )
    )
    group = group.take(pa.array(order))
    first = np.asarray(group["first_doc"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    last = np.asarray(group["last_doc"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    cfs = np.asarray(group["cf"].to_numpy(zero_copy_only=False))
    n = len(first)
    # NOTE: STRICT <: equal boundary docs (last[i] == first[i+1]) can
    # only happen for multi-field docs split across batches;
    # conservative: treat as overlap and take the slow path.
    disjoint = bool((last[:-1] < first[1:]).all()) if n > 1 else True

    term = group["term"][0].as_py()
    bucket = group["bucket"][0].as_py()

    if disjoint:
        # Coalesce (decode + re-encode) fragmented lists up to one
        # block's worth of occurrences — keeps per-term block counts
        # low for query-time fetches; genuinely hot terms (stop words
        # at scale) stay metadata-only so a single merge task never
        # re-encodes an unbounded list (skew safety).
        total_cf = int(cfs.sum())
        fragmented = n > 1 and total_cf <= block_cf
        if not fragmented:
            # SKEW FAST PATH: reuse encoded rows untouched, renumber
            # blocks — a stop-word term's merge touches only metadata,
            # never the (potentially huge) occurrence payload.
            return group.set_column(
                group.schema.get_field_index("block_id"),
                "block_id",
                pa.array(np.arange(n, dtype=np.int32)),
            )
        # small fragmented list: decode + coalesce into fewer blocks
    # slow path: decode everything, re-sort, re-encode
    docs_l, fields_l, tokens_l = [], [], []
    for i in range(n):
        d, f, t, *_ = decode_posting_block(
            group["docs"][i].as_py(),
            group["fields"][i].as_py(),
            group["tfs"][i].as_py(),
            group["positions"][i].as_py(),
        )
        docs_l.append(d)
        fields_l.append(f)
        tokens_l.append(t)
    occ_docs = np.concatenate(docs_l)
    occ_fields = np.concatenate(fields_l)
    occ_tokens = np.concatenate(tokens_l)
    if not disjoint:
        o = np.lexsort((occ_tokens, occ_fields, occ_docs))
        occ_docs, occ_fields, occ_tokens = occ_docs[o], occ_fields[o], occ_tokens[o]
    bounds = np.array([0, len(occ_docs)], dtype=np.int64)
    tbl = _posting_rows(
        np.array([term], dtype=object), bounds, occ_docs, occ_fields, occ_tokens,
        num_buckets=max(bucket + 1, 1), block_cf=block_cf,
    )
    # bucket column length must follow the ACTUAL emitted block count:
    # _posting_rows snaps chunk points to entry boundaries, so it can
    # emit more blocks than ceil(cf/block_cf) would predict.
    return tbl.set_column(
        tbl.schema.get_field_index("bucket"),
        "bucket",
        pa.array([bucket] * tbl.num_rows, type=pa.int32()),
    )
