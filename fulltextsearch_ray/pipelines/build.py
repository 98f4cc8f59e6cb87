"""build_index — the distributed inverted-index construction pipeline.

Parquet-path fast shape (ONE streaming corpus pass, no pre-shuffle):

    file items (sorted listing + footer row counts → positional ids)
      → map_batches(read_invert_batches_fn, file-bundled task pool)
          # read file → tokenize → local invert into compressed runs
          # + fused doc-stats sentinel rows (doc_len, sha256)
      → sort("term") → map_batches(merge_runs_batch)     # THE shuffle
      → write_parquet(term-range-sorted posting files, 4k row groups)
      → docs table split from sentinel rows (bucket == -1 pushdown)
      → catalog + per-file term-range run catalog (footers only)
      → manifest.json (+ lineage/counters) + meta.json  (driver)

Dataset-path (explicit doc_id_col / id_cols): normalize_corpus assigns
ids (sorted-key rank or passthrough), then InvertStage as above.

Streaming throughout: nothing materializes the corpus; the only
all-to-all exchange is the groupby on ``term`` over compressed partial
runs.  Each build session appends a new SEGMENT; query merges segments
(the reference's posting-chain semantic, ``PostingListWriter.cs:114-159``);
``compact_index`` collapses chains.  Completed segments are
checkpoints: re-running a multi-segment build skips any segment whose
manifest validates (resume unit = segment).

Driver-side catalog/manifest aggregates read only footers and small
metadata columns; the >50M-block Ray-groupby fallback covers catalogs
too large for one process.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.corpus import normalize_corpus, sha256_hex
from ..stages.invert import (
    DEFAULT_BLOCK_CF,
    invert_batch_fn,
    read_invert_batches_fn,
)
from ..state.index import (
    SEGMENTS_DIR,
    IndexMeta,
    SegmentManifest,
    load_manifest,
    load_meta,
    save_manifest,
    save_meta,
    segment_dir,
    segment_is_complete,
)
from ..tokenizer import token_counts


def compact_index(
    index_dir: str,
    *,
    block_cf: int = DEFAULT_BLOCK_CF,
    docs_driver_budget: int = 5_000_000,
    store_copy_file_budget: int = 256,
) -> IndexMeta:
    """Merge ALL segments into one — the batch analog of collapsing the
    reference's per-session posting-list chains
    (``PostingListWriter.cs:114-159``) into single lists.

    Re-shuffles the (already compressed) posting rows of every segment
    by term, merges runs, rewrites one segment, then swaps meta
    atomically.  Query results are identical before/after (the chain
    merge the searcher did at query time is now materialized).
    """
    import pyarrow.parquet as pq

    meta = load_meta(index_dir)
    # Sweep segment dirs that meta does not reference: a crash between
    # a previous compaction's save_meta and its old-segment rmtree loop
    # orphans every pre-compaction dir forever (no later path touches
    # them — disk roughly doubles per crashed compaction).  meta is the
    # source of truth and the index is single-writer, so unreferenced
    # dirs under segments/ are garbage by definition.
    seg_root = os.path.join(index_dir, SEGMENTS_DIR)
    if os.path.isdir(seg_root):
        for d_name in os.listdir(seg_root):
            if d_name not in meta.segments:
                shutil.rmtree(os.path.join(seg_root, d_name), ignore_errors=True)
    if len(meta.segments) <= 1:
        return meta
    old_segments = list(meta.segments)
    # Name derived from the INPUT SEGMENT LIST, not wall-clock time:
    # deterministic across crash retries (same inputs ⇒ same name, so
    # a partial dir from a crashed attempt is found and cleaned), and
    # collision-free with any live segment — the old `{count}-{int(
    # modified_at)}` scheme collided with a prior LIVE compact segment
    # when two compactions ran within one wall-clock second, and the
    # partial-dir rmtree below then deleted live data.
    import hashlib as _hl

    new_seg = "compact-" + _hl.sha1("|".join(old_segments).encode()).hexdigest()[:12]
    assert new_seg not in old_segments  # can't contain a hash of itself
    seg_path = segment_dir(index_dir, new_seg)
    if os.path.exists(seg_path):
        # a crashed earlier attempt left a partial dir; the name is
        # deterministic across retries and parquet writes APPEND, so
        # reusing it would double every posting file (df/cf 2x)
        shutil.rmtree(seg_path)
    os.makedirs(seg_path, exist_ok=True)

    import glob as _glob

    post_files: list[str] = []
    for s in old_segments:
        post_files.extend(
            sorted(
                _glob.glob(
                    os.path.join(segment_dir(index_dir, s), "postings", "**", "*.parquet"),
                    recursive=True,
                )
            )
        )
    from ..stages.invert import merge_runs_batch

    def ensure_ndocs(b: pa.Table) -> pa.Table:
        # legacy (pre-n_docs) segments: per-block unique-doc proxy = df,
        # the same fallback the searcher's catalog reader applies.
        # Emit the CANONICAL column order — merge_runs_batch concats
        # its output with schema-ordered tables, and an appended
        # n_docs at the end raised ArrowInvalid on legacy compactions
        from ..state.index import POSTINGS_SCHEMA

        if "n_docs" not in b.column_names:
            b = b.append_column("n_docs", b["df"])
        else:
            b = b.set_column(
                b.column_names.index("n_docs"), "n_docs", pc.coalesce(b["n_docs"], b["df"])
            )
        return b.select(POSTINGS_SCHEMA.names)

    # drop the fused doc-stats sentinel rows (bucket == -1): compaction
    # rebuilds the docs table from the docs dirs below, so carrying the
    # sentinels would store every doc's stats payload twice forever,
    # re-pay their shuffle on every future compaction, and pollute the
    # first postings file's term_min with sentinel keys
    runs = (
        ray.data.read_parquet(post_files)
        .filter(expr="bucket >= 0")
        .map_batches(ensure_ndocs, batch_format="pyarrow")
    )
    merged = runs.sort("term").map_batches(
        lambda b: merge_runs_batch(b, block_cf=block_cf),
        batch_format="pyarrow",
        batch_size=None,
    )
    merged.write_parquet(os.path.join(seg_path, "postings"), row_group_size=4096)
    if not os.path.isdir(os.path.join(seg_path, "postings")):
        # zero real postings (e.g. an empty corpus's sentinel-only
        # segments): write_parquet emits nothing — keep the segment
        # structure uniform with build_index's empty-corpus path
        from ..state.index import POSTINGS_SCHEMA

        os.makedirs(os.path.join(seg_path, "postings"), exist_ok=True)
        pq.write_table(
            POSTINGS_SCHEMA.empty_table(),
            os.path.join(seg_path, "postings", "part-0.parquet"),
        )

    # docs table: merge of per-segment docs (ids are disjoint).  Small
    # tables concat on the driver; past the budget the merge streams
    # through Ray (read → sort(doc_id) → partitioned write).
    docs_dirs = [os.path.join(segment_dir(index_dir, s), "docs") for s in old_segments]
    os.makedirs(os.path.join(seg_path, "docs"), exist_ok=True)
    total_docs = sum(
        pq.ParquetFile(f).metadata.num_rows
        for d in docs_dirs
        for f in pq.ParquetDataset(d).files
    )
    # Sessions may disagree on the docs schema (legacy builds stored
    # meta columns directly in docs; current ones use docs_meta) — a
    # plain concat/union raises ArrowInvalid and the index could never
    # be compacted.  Unify permissively: missing columns fill with
    # null, which is exactly the searcher's extra-docs-columns
    # metadata fallback semantics for docs that lack a value.
    if total_docs > docs_driver_budget:
        doc_files = [f for d in docs_dirs for f in pq.ParquetDataset(d).files]
        by_docs_schema: dict[str, list[str]] = {}
        for f in doc_files:
            by_docs_schema.setdefault(str(pq.ParquetFile(f).schema_arrow), []).append(f)
        if len(by_docs_schema) == 1:
            ds_docs = ray.data.read_parquet(doc_files)
        else:
            uni = pa.unify_schemas(
                [pq.ParquetFile(fs[0]).schema_arrow for fs in by_docs_schema.values()],
                promote_options="permissive",
            )

            def conform(b: pa.Table, _u=uni) -> pa.Table:
                cols = []
                for fld in _u:
                    if fld.name in b.column_names:
                        cols.append(b[fld.name].cast(fld.type))
                    else:
                        cols.append(pa.nulls(b.num_rows, fld.type))
                return pa.table(dict(zip(_u.names, cols)))

            parts = [
                ray.data.read_parquet(fs).map_batches(conform, batch_format="pyarrow")
                for fs in by_docs_schema.values()
            ]
            ds_docs = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
        ds_docs.sort("doc_id").write_parquet(os.path.join(seg_path, "docs"))
    else:
        docs = pa.concat_tables(
            (pq.read_table(d) for d in docs_dirs), promote_options="permissive"
        )
        docs = docs.take(pa.array(np.argsort(docs["doc_id"].to_numpy(zero_copy_only=False))))
        pq.write_table(docs, os.path.join(seg_path, "docs", "part-0.parquet"))

    # carry the forward store and docs_meta tables into the compact
    # segment (they are doc-keyed, ids are disjoint across segments —
    # a file merge preserves every row); without this, compaction
    # destroyed highlight-from-store and per-doc metadata.  Below
    # ``store_copy_file_budget`` files the merge is a driver copy loop
    # (cheap, schema-agnostic); past it the store REWRITES through Ray
    # (read → sort(doc_id) → partitioned write) so a many-thousand-file
    # segment set never runs a per-file driver loop.
    for sub in ("forward", "docs_meta"):
        src_files: list[tuple[str, str]] = []
        for s in old_segments:
            src = os.path.join(segment_dir(index_dir, s), sub)
            if os.path.isdir(src):
                src_files.extend(
                    (s, f)
                    for f in sorted(
                        _glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)
                    )
                )
        if not src_files:
            continue
        dst = os.path.join(seg_path, sub)
        os.makedirs(dst, exist_ok=True)
        if len(src_files) <= store_copy_file_budget:
            for s, f in src_files:
                shutil.copy2(f, os.path.join(dst, f"{s}-{os.path.basename(f)}"))
            continue
        # STREAMING REWRITE: group by file schema (sessions may differ —
        # legacy forward stores lack field_id; docs_meta columns vary)
        by_schema: dict[str, list[str]] = {}
        for _s, f in src_files:
            by_schema.setdefault(str(pq.ParquetFile(f).schema_arrow), []).append(f)
        if sub == "forward":
            from ..stages.forward import FORWARD_SCHEMA

            def norm_fwd(b: pa.Table) -> pa.Table:
                if "field_id" not in b.column_names:
                    b = b.append_column(
                        "field_id", pa.array(np.ones(b.num_rows, dtype=np.int32))
                    )
                return b.select(FORWARD_SCHEMA.names).cast(FORWARD_SCHEMA)

            parts = [
                ray.data.read_parquet(files).map_batches(norm_fwd, batch_format="pyarrow")
                for files in by_schema.values()
            ]
            # one schema after normalization → ONE global sort: output
            # file doc ranges stay disjoint for the range catalog
            ds_all = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
            ds_all.sort("doc_id").write_parquet(dst)
        else:
            # docs_meta has no range catalog (directory filter reads):
            # each schema group rewrites independently, mirroring the
            # copy path's mixed-schema directory layout exactly
            for files in by_schema.values():
                ray.data.read_parquet(files).sort("doc_id").write_parquet(dst)
    forward_ranges = _scan_doc_ranges(os.path.join(seg_path, "forward"), seg_path)

    _write_catalog_and_manifest(
        index_dir, new_seg, seg_path, num_buckets=0, lineage=old_segments,
        forward_ranges=forward_ranges, block_cf=block_cf,
    )

    if not meta.num_fields:
        # Legacy meta (num_fields=0, field count UNKNOWN) kept pruned
        # BM25 on the loosest tf→∞ upper bound forever.  Compaction is
        # the one moment the true count becomes derivable cheaply: one
        # column-pruned scan of the fields column of the postings just
        # rewritten (field ids are 1-based varints — the count is the
        # max id).
        from ..codecs import varint_decode

        def _max_field(b: pa.Table) -> pa.Table:
            buf = b"".join(v for v in b["fields"].to_pylist() if v)
            m = int(varint_decode(buf).max()) if buf else 0
            return pa.table({"m": pa.array([m], pa.int64())})

        mx = (
            ray.data.read_parquet(os.path.join(seg_path, "postings"), columns=["fields"])
            .map_batches(_max_field, batch_format="pyarrow")
            .max("m")
        )
        if mx:
            meta.num_fields = int(mx)
    meta.segments = [new_seg]
    save_meta(index_dir, meta)
    for s in old_segments:
        shutil.rmtree(segment_dir(index_dir, s), ignore_errors=True)
    return meta


def _scan_doc_ranges(dir_path: str, seg_path: str) -> list:
    """[relpath, min_doc, max_doc] per parquet file under ``dir_path``
    (footer statistics of the first column only), sorted by min —
    the forward-store range catalog shape."""
    import glob as _glob

    import pyarrow.parquet as pq

    out: list = []
    if not os.path.isdir(dir_path):
        return out
    for f in sorted(_glob.glob(os.path.join(dir_path, "**", "*.parquet"), recursive=True)):
        md = pq.ParquetFile(f).metadata
        dmins, dmaxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            if st is not None and st.has_min_max:
                dmins.append(st.min)
                dmaxs.append(st.max)
        if dmins:
            out.append([os.path.relpath(f, seg_path), min(dmins), max(dmaxs)])
    out.sort(key=lambda r: r[1])
    return out


def _scan_table_stats(dir_path: str, seg_path: str) -> dict:
    """Manifest-persisted footer stats for a key-sorted table directory
    (catalog or docs): relpath → {num_rows, columns, row_groups:
    [[key_min, key_max, n_rows], ...] | None}.  One footer read per
    file HERE, at build time, so every cold searcher actor afterwards
    reads ONE manifest JSON instead of O(files) footers.  ``row_groups``
    is None when any group lacks key statistics — the searcher then
    falls back to that file's footer."""
    import glob as _glob

    import pyarrow.parquet as pq

    out: dict = {}
    if not os.path.isdir(dir_path):
        return out
    for f in sorted(_glob.glob(os.path.join(dir_path, "**", "*.parquet"), recursive=True)):
        md = pq.ParquetFile(f).metadata
        groups: "list | None" = []
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            st = rgm.column(0).statistics
            if st is None or not st.has_min_max:
                groups = None
                break
            groups.append([st.min, st.max, rgm.num_rows])
        out[os.path.relpath(f, seg_path)] = {
            "num_rows": md.num_rows,
            "columns": list(md.schema.to_arrow_schema().names),
            "row_groups": groups,
        }
    return out


def cap_lineage(files: list[str], budget: int = 10_000) -> list[str]:
    """Keep the manifest's provenance list O(budget): past the budget,
    store one summary line (count + lexical range) plus a head/tail
    sample instead of every path — a 10^12-file build must not write a
    10^12-entry JSON manifest.  Lineage is provenance-only (resume
    keys on segment completeness, never on this list)."""
    if len(files) <= budget:
        return list(files)
    head = files[: budget // 2]
    tail = files[len(files) - (budget - budget // 2):]
    return [
        f"<lineage summary: {len(files)} files, {files[0]} .. {files[-1]}>",
        *head,
        *tail,
    ]


def _scan_postings_ranges(seg_path: str) -> list:
    """Per-file ``[relpath, term_min, term_max]`` over the postings
    directory, from parquet FOOTERS only (no data read) — the
    FST-style sorted-term run catalog both build and compact persist."""
    import glob as _glob

    import pyarrow.parquet as pq

    file_ranges = []
    for f in sorted(_glob.glob(os.path.join(seg_path, "postings", "**", "*.parquet"), recursive=True)):
        md = pq.ParquetFile(f).metadata
        tmins, tmaxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics  # 'term' is column 0
            if st is not None and st.has_min_max:
                tmins.append(st.min)
                tmaxs.append(st.max)
        if tmins:
            file_ranges.append([os.path.relpath(f, seg_path), min(tmins), max(tmaxs)])
    file_ranges.sort(key=lambda r: r[1])
    return file_ranges


_POST_META_COLS = ["term", "bucket", "df", "cf", "max_tf", "n_docs", "first_doc", "last_doc"]


def _build_catalog(seg_path: str, driver_budget_rows: int = 50_000_000) -> tuple[int, int]:
    """Per-term catalog aggregate over the block-stat columns →
    ``<seg>/catalog`` parquet; returns ``(n_terms, total_occurrences)``.

    Gated on FOOTER row counts BEFORE any read: below the budget a
    driver-side Arrow group_by (block stats are tiny next to the
    corpus); above it a Ray groupby whose result never rides back to
    the driver — the counters come from catalog footers plus one
    streaming Sum, keeping driver memory O(1) at billion-term scale.
    Shared by build_index and compact_index so the two can never fork
    catalog schemas."""
    import glob as _g

    import pyarrow.parquet as pq

    post_dir = os.path.join(seg_path, "postings")
    cat_dir = os.path.join(seg_path, "catalog")
    footer_rows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in _g.glob(os.path.join(post_dir, "**", "*.parquet"), recursive=True)
    )
    if footer_rows <= driver_budget_rows:
        try:
            blocks_tbl = pq.read_table(
                post_dir, columns=_POST_META_COLS, filters=[("bucket", ">=", 0)]
            )
            catalog_tbl = (
                blocks_tbl.group_by("term")
                .aggregate(
                    [("df", "sum"), ("cf", "sum"), ("max_tf", "max"), ("n_docs", "sum"),
                     ("first_doc", "min"), ("last_doc", "max"), ("term", "count")]
                )
                .rename_columns(["term", "df", "cf", "max_tf", "df_docs", "first_doc", "last_doc", "n_blocks"])
                .sort_by("term")
            )
            os.makedirs(cat_dir, exist_ok=True)
            pq.write_table(catalog_tbl, os.path.join(cat_dir, "part-0.parquet"), row_group_size=65536)
            return catalog_tbl.num_rows, int(pc.sum(catalog_tbl["cf"]).as_py() or 0)
        except (MemoryError, pa.lib.ArrowMemoryError):
            # The footer-row budget is a heuristic; a driver that can't
            # actually hold the block stats falls through to the Ray
            # groupby path below (the r4 refactor dropped this guard).
            # Clear any partial driver-side write first — a torn
            # part-0.parquet (or a complete one, if the error hit
            # after write_table) would otherwise coexist with the Ray
            # output: unreadable footer or doubled df/cf rows.
            shutil.rmtree(cat_dir, ignore_errors=True)
    postings = ray.data.read_parquet(post_dir, columns=_POST_META_COLS).filter(expr="bucket >= 0")
    catalog = (
        postings.groupby("term")
        .aggregate(
            ray.data.aggregate.Sum("df", alias_name="df"),
            ray.data.aggregate.Sum("cf", alias_name="cf"),
            ray.data.aggregate.Max("max_tf", alias_name="max_tf"),
            ray.data.aggregate.Sum("n_docs", alias_name="df_docs"),
            ray.data.aggregate.Min("first_doc", alias_name="first_doc"),
            ray.data.aggregate.Max("last_doc", alias_name="last_doc"),
            ray.data.aggregate.Count(alias_name="n_blocks"),
        )
        .sort("term")
    )
    catalog.write_parquet(cat_dir)
    n_terms = sum(pq.ParquetFile(f).metadata.num_rows for f in pq.ParquetDataset(cat_dir).files)
    occ_row = ray.data.read_parquet(cat_dir, columns=["cf"]).aggregate(
        ray.data.aggregate.Sum("cf", alias_name="cf")
    )
    return n_terms, int(occ_row["cf"] or 0)


def _write_catalog_and_manifest(
    index_dir: str, segment: str, seg_path: str, num_buckets: int, lineage: list[str],
    forward_ranges: list | None = None, block_cf: int = 0,
) -> "SegmentManifest":
    """Catalog + file-range + counter/manifest writes shared by
    build_index and compact_index (footer/metadata-gated driver work
    with Ray fallbacks — see _build_catalog)."""
    import pyarrow.parquet as pq

    file_ranges = _scan_postings_ranges(seg_path)
    n_terms, n_occ = _build_catalog(seg_path)

    docs_dir = os.path.join(seg_path, "docs")
    n_doc_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in pq.ParquetDataset(docs_dir).files)
    if n_doc_rows > 5_000_000:
        import ray.data
        from ray.data.aggregate import Max, Min, Sum

        agg = ray.data.read_parquet(docs_dir, columns=["doc_id", "doc_len"]).aggregate(
            Sum("doc_len", alias_name="tok"),
            Min("doc_id", alias_name="mn"),
            Max("doc_id", alias_name="mx"),
        )
        total_tokens = int(agg["tok"] or 0)
        min_id, max_id = int(agg["mn"] or 0), int(agg["mx"] or 0)
    else:
        dl_tbl = pq.read_table(docs_dir, columns=["doc_id", "doc_len"])
        total_tokens = int(pc.sum(dl_tbl["doc_len"]).as_py() or 0)
        min_id = int(pc.min(dl_tbl["doc_id"]).as_py() or 0)
        max_id = int(pc.max(dl_tbl["doc_id"]).as_py() or 0)
    manifest = SegmentManifest(
        name=segment,
        num_docs=n_doc_rows,
        num_terms=n_terms,
        num_occurrences=n_occ,
        total_tokens=total_tokens,
        min_doc_id=min_id,
        max_doc_id=max_id,
        input_lineage=lineage,
        created_at=time.time(),
        complete=True,
        num_buckets=num_buckets,
        file_ranges=file_ranges,
        forward_ranges=forward_ranges or [],
        catalog_stats=_scan_table_stats(os.path.join(seg_path, "catalog"), seg_path),
        docs_stats=_scan_table_stats(docs_dir, seg_path),
        block_cf=block_cf,
    )
    save_manifest(index_dir, manifest)
    return manifest


class DocStatsStage:
    """Per-doc stats batch stage: doc_len (token count) + sha256(content).

    The sha256 column is the per-row invariant the baseline requires
    (BASELINE.json ``input_hint``): it must equal a recomputation from
    the original input table.  With ``text_cols`` (compound documents)
    doc_len sums the per-field counts and sha256 hashes the
    '\x1f'-joined fields — the SAME semantics as the fused invert
    sentinel (``InvertStage._docstats_table``), so docs_meta and docs
    agree; a prior version always read ``text_col``, which crashed (or
    silently hashed the wrong column) on multi-field builds.
    """

    def __init__(
        self,
        text_col: str,
        meta_cols: tuple[str, ...] = (),
        text_cols: "list[str] | None" = None,
    ):
        from ..stages.invert import _warm_heap

        self.text_col = text_col
        self.meta_cols = meta_cols
        self.text_cols = list(text_cols) if text_cols else None
        _warm_heap()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.invert import canonical_doc_texts

        texts = canonical_doc_texts(batch, self.text_col, self.text_cols)
        if self.text_cols:
            lens = sum(
                (np.asarray(token_counts(batch[c]), dtype=np.int64) for c in self.text_cols),
                np.zeros(batch.num_rows, dtype=np.int64),
            )
        else:
            lens = token_counts(batch[self.text_col])
        out = {
            "doc_id": batch["doc_id"],
            "doc_len": pa.array(np.asarray(lens, dtype=np.int64), type=pa.int64()),
            "sha256": pa.array(sha256_hex(texts), type=pa.string()),
        }
        for c in self.meta_cols:
            out[c] = batch[c]
        return pa.table(out)


def _doc_stats_batch_fn(
    batch: pa.Table, *, text_col: str, meta_cols: tuple, text_cols=None
) -> pa.Table:
    """Task-pool entry for :class:`DocStatsStage` — construction is
    config-only, so tasks beat an actor pool (see
    stages/invert.py:invert_batch_fn)."""
    return DocStatsStage(text_col, meta_cols, text_cols)(batch)


def _forward_file_batch_fn(batch: pa.Table, *, text_col: str, text_cols):
    """Task-pool entry for ForwardFileStage (generator) — same
    task-over-actor rationale as invert_batch_fn."""
    from ..stages.forward import ForwardFileStage

    yield from ForwardFileStage(text_col=text_col, text_cols=text_cols)(batch)


def build_index(
    source: ray.data.Dataset | str,
    index_dir: str,
    *,
    text_col: str = "text",
    text_cols: list[str] | None = None,
    doc_id_col: str | None = None,
    id_cols: list[str] | None = None,
    meta_cols: tuple[str, ...] = (),
    segment: str | None = None,
    num_buckets: int = 64,
    block_cf: int = DEFAULT_BLOCK_CF,
    batch_size: int | None = 1024,
    overwrite: bool = False,
    docs_driver_budget: int = 5_000_000,
    store_forward: bool = False,
    lineage_budget: int = 10_000,
) -> IndexMeta:
    """Build (or incrementally extend) a persistent index.

    ``source`` is a Dataset or a parquet path.  When ``doc_id_col`` is
    None, deterministic ids are assigned from ``id_cols`` rank starting
    at the index's ``next_doc_id`` (incremental sessions continue the
    id space, mirroring the reference header contract,
    ``PersistentIndexInfo.cs:36-51``).
    """
    if overwrite and os.path.exists(index_dir):
        shutil.rmtree(index_dir)

    try:
        meta = load_meta(index_dir)
    except FileNotFoundError:
        meta = IndexMeta(created_at=time.time())

    if segment is None:
        segment = f"seg-{len(meta.segments):05d}"
    if segment in meta.segments and segment_is_complete(index_dir, segment):
        return meta  # checkpoint hit: segment already built

    seg_path = segment_dir(index_dir, segment)
    if os.path.exists(seg_path):
        shutil.rmtree(seg_path)  # incomplete previous attempt
    os.makedirs(seg_path, exist_ok=True)

    timing: dict[str, float] = {}
    _t = time.perf_counter

    def _mark(name: str, t0: float) -> None:
        timing[name] = round(_t() - t0, 2)

    # Task sizing only (stages run as task pools; Ray reuses worker
    # processes, so heap warmup amortizes without actors): target ≥4
    # file bundles per CPU for balance, uncapped — the old min(·, 32)
    # was an actor-pool-width cap and under-split on wider clusters.
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    pool = max(2, n_cpus)

    t0 = _t()
    ds = None
    runs = None
    input_lineage = None
    if isinstance(source, str):
        cols = sorted({*(text_cols or [text_col]), *(meta_cols or ()), *([doc_id_col] if doc_id_col else []), *(id_cols or [])})
        if doc_id_col is None and id_cols is None:
            # positional deterministic ids straight from the parquet
            # layout: fused read+invert, one task per file, no shuffle
            # before the term groupby
            from ..sources.corpus import corpus_file_items

            items, n_files = corpus_file_items(source, start_id=meta.next_doc_id)
            # (the file list already lives on the driver — from_items —
            # so this gather adds nothing; the CAP bounds what the
            # manifest persists)
            input_lineage = cap_lineage(
                [r["file"] for r in items.take_all()], lineage_budget
            )
            runs = items.map_batches(
                read_invert_batches_fn,
                fn_kwargs=dict(
                    text_col=text_col, text_cols=text_cols, columns=cols,
                    num_buckets=num_buckets, block_cf=block_cf,
                ),
                batch_format="pyarrow",
                # bundle several file items per task (file items are
                # 1-row blocks, so batch_size counts FILES): each task
                # groups its small files into chunk_rows-doc invert
                # calls — fewer, larger runs into the term shuffle —
                # while keeping ≥4 tasks per worker for balance.
                # TASK pool, not an actor pool: stage construction is
                # config-only, actor launch/ramp was pure critical-path
                # overhead (interleaved A/B: ~2× wall on a 60k-doc
                # build vs tasks; the earlier fixed→autoscaling pool
                # fix measured 37→29 s — tasks remove the remainder),
                # and tasks can never starve the downstream AllToAll
                # term sort (see functions/similarity.py)
                batch_size=max(1, n_files // (pool * 4)),
            )
        else:
            src = ray.data.read_parquet(source, columns=cols)
            ds = normalize_corpus(src, text_col, doc_id_col=doc_id_col, id_cols=id_cols, start_id=meta.next_doc_id)
    else:
        ds = normalize_corpus(source, text_col, doc_id_col=doc_id_col, id_cols=id_cols, start_id=meta.next_doc_id)
    _mark("read_ids", t0)

    if meta_cols:
        # metadata projection pass (only when extra doc columns are
        # requested — the common path fuses doc stats into the invert).
        # STREAMING: no corpus materialize — the invert below simply
        # re-executes the (lazy, deterministic) normalize graph rather
        # than pinning the whole corpus in the object store; ids are
        # reproducible across executions (doc_id_col passes through,
        # assign_doc_ids is rank-of-unique-key and materializes only
        # its own keyed intermediate once).  On the positional fast
        # path (ds is None) the pass reads the corpus with the SAME
        # positional ids — meta_cols used to be silently dropped there.
        if ds is not None:
            meta_src = ds
        else:
            from ..sources.corpus import read_corpus_with_ids

            meta_src = read_corpus_with_ids(
                source, columns=cols, start_id=meta.next_doc_id
            )
        docs_ds = meta_src.map_batches(
            _doc_stats_batch_fn,
            fn_kwargs=dict(
                text_col=text_col, meta_cols=meta_cols, text_cols=text_cols
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        t0 = _t()
        docs_ds.write_parquet(os.path.join(seg_path, "docs_meta"))
        _mark("docs_meta_write", t0)

    # --- single corpus pass: tokenize → local invert → fused doc
    # stats sentinel rows → term shuffle → merge → write ---
    if runs is None:
        runs = ds.map_batches(
            invert_batch_fn,
            fn_kwargs=dict(
                text_col=text_col, text_cols=text_cols, doc_id_col="doc_id",
                num_buckets=num_buckets, block_cf=block_cf, emit_docstats=True,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    # sort-based shuffle on term + whole-block vectorized merge: every
    # term's runs land contiguously in one partition; merge_runs_batch
    # avoids per-group scheduling (map_groups costs ~ms per key, fatal
    # at realistic million-term vocabularies)
    from ..stages.invert import merge_runs_batch

    merged = runs.sort("term").map_batches(
        lambda b: merge_runs_batch(b, block_cf=block_cf),
        batch_format="pyarrow",
        batch_size=None,
    )
    t0 = _t()
    # The sort's output blocks are disjoint term ranges (sort-based
    # shuffle) — written 1:1 as files they form an FST-style sorted-
    # term run catalog: a term lookup binary-searches the per-file
    # [term_min, term_max] ranges (recorded below from the parquet
    # footers) and opens exactly ONE file, then row-group stats prune
    # within it.
    merged.write_parquet(os.path.join(seg_path, "postings"), row_group_size=4096)
    _mark("postings_write", t0)

    # file → term-range catalog from footers only (no data read)
    t0 = _t()
    file_ranges = _scan_postings_ranges(seg_path)
    _mark("file_ranges", t0)

    # --- split the fused doc-stats sentinel rows into the docs table
    # (parquet filter pushdown on bucket == -1 reads only those rows)
    import pyarrow.parquet as pq

    t0 = _t()
    from ..stages.invert import decode_docstats_rows
    from ..state.index import POSTINGS_SCHEMA

    if not os.path.isdir(os.path.join(seg_path, "postings")):
        # zero-row corpus: write_parquet emits nothing — create an
        # empty postings file so the segment structure stays uniform
        os.makedirs(os.path.join(seg_path, "postings"), exist_ok=True)
        pq.write_table(
            POSTINGS_SCHEMA.empty_table(),
            os.path.join(seg_path, "postings", "part-0.parquet"),
        )
    # metadata-sized probe first: how many docs do the sentinels carry?
    # (reads only the tiny bucket/df columns, never the payloads)
    probe = pq.read_table(
        os.path.join(seg_path, "postings"), columns=["df"], filters=[("bucket", "=", -1)]
    )
    sentinel_docs = int(pc.sum(probe["df"]).as_py() or 0)
    os.makedirs(os.path.join(seg_path, "docs"), exist_ok=True)
    if sentinel_docs > docs_driver_budget:
        # SCALE PATH: the docs table never touches the driver — Ray
        # filter → decode → sort(doc_id) → partitioned parquet write
        # (multiple range-partitioned files, resumable unit = file).
        import pyarrow.dataset as pads

        (
            ray.data.read_parquet(
                os.path.join(seg_path, "postings"),
                columns=["docs", "tfs", "positions"],
                filter=pads.field("bucket") == -1,
            )
            .map_batches(decode_docstats_rows, batch_format="pyarrow")
            .sort("doc_id")
            .write_parquet(os.path.join(seg_path, "docs"))
        )
    else:
        sentinel = pq.read_table(
            os.path.join(seg_path, "postings"),
            columns=["docs", "tfs", "positions"],
            filters=[("bucket", "=", -1)],
        )
        docs_tbl = decode_docstats_rows(sentinel)
        docs_tbl = docs_tbl.take(
            pa.array(np.argsort(docs_tbl["doc_id"].to_numpy(zero_copy_only=False)))
        )
        pq.write_table(docs_tbl, os.path.join(seg_path, "docs", "part-0.parquet"))
    _mark("docs_split", t0)

    # --- optional forward store: per-doc token char spans, so highlight
    # at query time slices text directly instead of re-tokenizing
    # (the reference's persisted-positions model, PersistentBuilder.cs)
    forward_ranges: list = []
    if store_forward:
        t0 = _t()
        from ..stages.forward import forward_batch

        fwd_dir = os.path.join(seg_path, "forward")
        if ds is None:
            from ..sources.corpus import corpus_file_items

            f_items, _ = corpus_file_items(source, start_id=meta.next_doc_id)
            fwd = f_items.map_batches(
                _forward_file_batch_fn,
                fn_kwargs={"text_col": text_col, "text_cols": text_cols},
                batch_format="pyarrow",
                batch_size=1,
            )
        else:
            # sort: custom doc_id_col batches can arrive in any order,
            # and the forward range catalog's bounded walk-left assumes
            # sorted near-disjoint per-file doc ranges (an unsorted
            # write made stored docs unreachable)
            fwd = ds.map_batches(
                lambda b: forward_batch(b, text_col, text_cols), batch_format="pyarrow",
                batch_size=batch_size,
            ).sort("doc_id")
        fwd.write_parquet(fwd_dir, row_group_size=2048)
        forward_ranges = _scan_doc_ranges(fwd_dir, seg_path)
        _mark("forward", t0)

    # --- catalog: per-term totals over blocks (metadata-sized) —
    # shared footer-gated helper (driver Arrow below ~50M block rows,
    # Ray groupby with O(1)-driver counters above it)
    t0 = _t()
    n_terms, n_occ = _build_catalog(seg_path)
    _mark("catalog", t0)
    t0 = _t()
    # --- per-segment counters (same aggregates as the reference's
    #     IndexBuilderStatistics) + lineage manifest; computed from the
    #     already-written small columns (driver Arrow below the docs
    #     budget, a streaming Ray aggregate above it) ---
    if sentinel_docs > docs_driver_budget:
        from ray.data.aggregate import Count, Max, Min, Sum

        agg_row = (
            ray.data.read_parquet(os.path.join(seg_path, "docs"), columns=["doc_id", "doc_len"])
            .aggregate(
                Count(alias_name="n"),
                Sum("doc_len", alias_name="tok"),
                Min("doc_id", alias_name="mn"),
                Max("doc_id", alias_name="mx"),
            )
        )
        n_docs = int(agg_row["n"] or 0)
        total_tokens = int(agg_row["tok"] or 0)
        doc_stats = {"min_id": int(agg_row["mn"] or 0), "max_id": int(agg_row["mx"] or 0)}
    else:
        dl_tbl = pq.read_table(os.path.join(seg_path, "docs"), columns=["doc_id", "doc_len"])
        n_docs = dl_tbl.num_rows
        total_tokens = int(pc.sum(dl_tbl["doc_len"]).as_py() or 0)
        doc_stats = {
            "min_id": int(pc.min(dl_tbl["doc_id"]).as_py() or 0),
            "max_id": int(pc.max(dl_tbl["doc_id"]).as_py() or 0),
        }
    cat_stats = {
        "terms": n_terms,
        "occ": n_occ,
    }

    if input_lineage is not None:
        lineage = input_lineage
    elif hasattr(source, "input_files"):
        try:
            lineage = cap_lineage(source.input_files() or [], lineage_budget)
        except Exception:
            lineage = []
    else:
        lineage = []
    manifest = SegmentManifest(
        name=segment,
        num_buckets=num_buckets,
        file_ranges=file_ranges,
        num_docs=n_docs,
        num_terms=int(cat_stats["terms"] or 0),
        num_occurrences=int(cat_stats["occ"] or 0),
        total_tokens=total_tokens,
        min_doc_id=doc_stats["min_id"],
        max_doc_id=doc_stats["max_id"],
        input_lineage=list(lineage or []),
        created_at=time.time(),
        complete=True,
        forward_ranges=forward_ranges,
        catalog_stats=_scan_table_stats(os.path.join(seg_path, "catalog"), seg_path),
        docs_stats=_scan_table_stats(os.path.join(seg_path, "docs"), seg_path),
        block_cf=block_cf,
    )
    save_manifest(index_dir, manifest)

    if segment not in meta.segments:
        meta.segments.append(segment)
    # Corpus totals are recomputed as the SUM over segment manifests,
    # not incremented: a segment that was listed in meta but lost its
    # manifest (version skew, corruption) gets rebuilt above, and a
    # `+=` would re-add its docs/tokens on top of the counts an
    # earlier save_meta already included — permanently inflating
    # num_docs and avgdl (every BM25 idf would be silently wrong).
    try:
        manifests = [load_manifest(index_dir, s) for s in meta.segments]
        meta.num_docs = sum(m.num_docs for m in manifests)
        meta.total_tokens = sum(m.total_tokens for m in manifests)
    except (OSError, TypeError, ValueError):
        # a sibling manifest is unreadable: fall back to the additive
        # update rather than corrupting the totals with a partial sum
        meta.num_docs += n_docs
        meta.total_tokens += total_tokens
    # num_fields=0 means a legacy index of UNKNOWN field count — an
    # incremental session must keep it unknown (the old segments may be
    # multi-field), not overwrite it with this session's count.
    if meta.num_fields:
        meta.num_fields = max(meta.num_fields, len(text_cols) if text_cols else 1)
    meta.next_doc_id = max(meta.next_doc_id, manifest.max_doc_id + 1)
    _mark("manifest", t0)
    if os.environ.get("FTSRAY_BUILD_TIMING"):
        print("build_index timing:", timing)
    save_meta(index_dir, meta)
    return meta
