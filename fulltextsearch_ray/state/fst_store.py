"""Persisted FST term-dictionary sidecar.

The analog of the reference's ``PersistentDictionaryFst`` (reference
``IndexTypes/Persistent/PersistentDictionaryFst.cs:10-110`` — behavior
observed, no code copied): the index's sorted vocabulary compiled into
one minimal-FST byte image (``<index>/fst/terms.fst``) + a meta json
recording which segments it covers.  Opt-in — the parquet catalog
remains the default dictionary (SURVEY §1.5); the FST serves the same
expansions from a compressed, offset-addressed image.

Scale shape: the build STREAMS each segment's term-sorted catalog row
group by row group (never the whole vocabulary in memory) and k-way
merges segments with ``heapq.merge``; FST construction itself is the
classic single sequential writer (Lucene does the same).  Output per
term is its ordinal in the merged vocabulary."""

from __future__ import annotations

import heapq
import json
import os
from typing import Iterator

import pyarrow.parquet as pq

from ..fst import Fst, FstBuilder, IntOutput
from .index import load_meta, segment_dir

FST_FILE = "terms.fst"
FST_META = "fst.json"


def _segment_catalog_files(index_dir: str, seg: str) -> list[str]:
    d = os.path.join(segment_dir(index_dir, seg), "catalog")
    return pq.ParquetDataset(d).files


def _iter_segment_terms(index_dir: str, seg: str) -> Iterator[str]:
    """Stream one segment's terms in sorted order, one row group at a
    time (each segment catalog is written term-sorted with disjoint
    row-group ranges — same contract LazyRowGroupTable relies on)."""
    runs: list[tuple] = []
    for f in _segment_catalog_files(index_dir, seg):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            key = st.min if st is not None and st.has_min_max else ""
            runs.append((key, f, rg))
    runs.sort()
    for _key, f, rg in runs:
        col = pq.ParquetFile(f).read_row_group(rg, columns=["term"])["term"]
        for v in col:
            yield v.as_py()


def iter_index_terms(index_dir: str, segments: list[str]) -> Iterator[str]:
    """Merged, deduplicated sorted vocabulary across segments."""
    prev = None
    for term in heapq.merge(
        *(_iter_segment_terms(index_dir, s) for s in segments)
    ):
        if term != prev:
            yield term
            prev = term


def build_fst_from_terms(terms: "Iterator[str] | list[str]") -> Fst:
    b = FstBuilder(IntOutput)
    for i, t in enumerate(terms):
        b.add(t, i)
    return b.finish()


def fst_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "fst")


def build_fst_sidecar(index_dir: str) -> dict:
    """Compile the index vocabulary to ``<index>/fst/terms.fst``.
    Returns build stats (n_terms, n_bytes)."""
    meta = load_meta(index_dir)
    segments = list(meta.segments)
    fst = build_fst_from_terms(iter_index_terms(index_dir, segments))
    d = fst_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    data = fst.get_bytes()
    tmp = os.path.join(d, FST_FILE + ".tmp")
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, os.path.join(d, FST_FILE))
    info = {"segments": segments, "n_terms": fst.n_terms, "n_bytes": len(data)}
    with open(os.path.join(d, FST_META), "w") as fh:
        json.dump(info, fh)
    return info


def load_fst_sidecar(index_dir: str, segments: list[str]) -> "Fst | None":
    """Load the sidecar if present AND built over exactly the current
    segment list; None otherwise (caller falls back to building from
    the catalogs)."""
    d = fst_dir(index_dir)
    meta_path = os.path.join(d, FST_META)
    data_path = os.path.join(d, FST_FILE)
    if not (os.path.exists(meta_path) and os.path.exists(data_path)):
        return None
    try:
        with open(meta_path) as fh:
            info = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None
    if list(info.get("segments", [])) != list(segments):
        return None  # stale: segments were added/compacted since
    with open(data_path, "rb") as fh:
        return Fst(fh.read())
