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
merges segments with ``heapq.merge``.  FST construction itself is the
classic single sequential writer (Lucene does the same) — so past
``shard_terms`` terms the sidecar SHARDS: contiguous term ranges
compile to independent per-range FST images IN PARALLEL (Ray tasks
when a session is live, sequential otherwise), and
:class:`ShardedFst` serves the union (range-dispatched ``try_match``,
in-order ``match``/``items`` across shards with ``matcher.reset()``
between).  Output per term is its GLOBAL ordinal in the merged
vocabulary (per-shard images store local ordinals; the wrapper adds
each shard's base).  Driver memory during a sharded build is one
shard's term list, never the vocabulary."""

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
    row-group ranges — same contract LazyRowGroupTable relies on).

    Runs are keyed by each row group's TRUE first term, never by
    parquet min statistics: string min stats may be WRITER-TRUNCATED,
    which can strictly invert two runs' order without any tie ('ab'
    truncated from 'abd…' sorts before exact 'abc'), and foreign
    writers may omit stats entirely — either way the FstBuilder's
    strictly-sorted check would fail on a valid index.  One
    ParquetFile per file (footer parsed once); phase 1 reads each
    group's term column for its first value, phase 2 re-reads groups
    in sorted order — driver memory stays O(#groups), and the sidecar
    build is a rare offline pass where the extra column read is
    irrelevant next to correctness."""
    runs: list[tuple] = []
    readers: dict[str, pq.ParquetFile] = {}
    for f in _segment_catalog_files(index_dir, seg):
        pf = readers[f] = pq.ParquetFile(f)
        md = pf.metadata
        for rg in range(md.num_row_groups):
            if md.row_group(rg).num_rows == 0:
                continue  # contributes no terms
            first = pf.read_row_group(rg, columns=["term"])["term"][0].as_py()
            runs.append((first, f, rg))
    runs.sort()
    for _key, f, rg in runs:
        col = readers[f].read_row_group(rg, columns=["term"])["term"]
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


def _build_shard_bytes(terms: list[str]) -> bytes:
    return build_fst_from_terms(terms).get_bytes()


class ShardedFst:
    """Union view over contiguous-range FST shards — same query surface
    as :class:`Fst` (``in`` / ``try_match`` / ``match`` / ``items``),
    global ordinals via per-shard bases."""

    def __init__(self, shards: "list[tuple[str, str, int, Fst]]"):
        # (term_min, term_max, base_ordinal, fst) in range order
        self.shards = shards
        self.n_terms = sum(f.n_terms for *_m, f in shards)
        self._mins = [m for m, *_ in shards]

    def try_match(self, term: str):
        import bisect

        i = bisect.bisect_right(self._mins, term) - 1
        if i < 0:
            return False, None
        mn, mx, base, fst = self.shards[i]
        if term > mx:
            return False, None
        ok, out = fst.try_match(term)
        return (True, out + base) if ok else (False, None)

    def __contains__(self, term: str) -> bool:
        return self.try_match(term)[0]

    def match(self, matcher):
        for *_range, fst in self.shards:
            matcher.reset()
            yield from fst.match(matcher)

    def items(self):
        for _mn, _mx, base, fst in self.shards:
            for t, o in fst.items():
                yield t, o + base


def build_fst_sidecar(index_dir: str, *, shard_terms: int = 1_000_000) -> dict:
    """Compile the index vocabulary to ``<index>/fst/terms.fst`` (or
    ``terms-NNNNN.fst`` shards past ``shard_terms`` terms per shard —
    built in parallel as Ray tasks when a session is live).  Returns
    build stats (n_terms, n_bytes, n_shards)."""
    if shard_terms < 1:
        raise ValueError("shard_terms must be >= 1")
    meta = load_meta(index_dir)
    segments = list(meta.segments)
    d = fst_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    # INVALIDATE the old sidecar before touching any shard file: a
    # rebuild overwrites shards in place, so a crash mid-rebuild with
    # the old fst.json still present (same segment list!) would serve
    # NEW shard bytes under OLD term ranges — silent misses.  With the
    # meta unlinked first, a crashed rebuild just means "no sidecar"
    # and the searcher falls back to the paged catalog scan.
    try:
        os.unlink(os.path.join(d, FST_META))
    except FileNotFoundError:
        pass

    try:
        import ray

        use_ray = ray.is_initialized()
    except ImportError:
        use_ray = False
    if use_ray:
        import ray

        task = ray.remote(_build_shard_bytes)

    # STREAM shards: dispatch (or build) each range as soon as its list
    # fills and DROP the list — driver memory is one shard's terms plus
    # per-shard (min, max, count) metadata, never the vocabulary.  Ray
    # path: serialized term lists live in the object store while tasks
    # run (spillable), blobs come back in dispatch order.  Sequential
    # path: each shard's FILE is written AT DISPATCH TIME so the driver
    # never holds more than one shard's byte image (holding every blob
    # until the end grows driver memory with shard count).
    pending: list = []  # (term_min, term_max, n, objectref_or_nbytes)
    cur: list[str] = []

    def _write_shard(i: int, blob: bytes) -> str:
        fname = f"terms-{i:05d}.fst"
        tmp = os.path.join(d, fname + ".tmp")
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, os.path.join(d, fname))
        return fname

    def dispatch(ts: list[str]) -> None:
        if use_ray:
            tail = task.remote(ts)
        else:
            blob = _build_shard_bytes(ts)
            _write_shard(len(pending), blob)
            tail = len(blob)
        pending.append((ts[0] if ts else "", ts[-1] if ts else "", len(ts), tail))

    n_shards_guess = 0
    for t in iter_index_terms(index_dir, segments):
        cur.append(t)
        if len(cur) >= shard_terms:
            dispatch(cur)
            n_shards_guess += 1
            cur = []
    if cur or not pending:
        # final partial shard (or an empty vocabulary)
        if len(pending) == 0:
            # single image — keep the compact legacy format
            fst = build_fst_from_terms(cur)
            data = fst.get_bytes()
            tmp = os.path.join(d, FST_FILE + ".tmp")
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, os.path.join(d, FST_FILE))
            info = {"segments": segments, "n_terms": fst.n_terms, "n_bytes": len(data)}
            with open(os.path.join(d, FST_META), "w") as fh:
                json.dump(info, fh)
            return info
        dispatch(cur)
        cur = []

    shard_meta = []
    base = 0
    total_bytes = 0
    for i, (mn, mx, n, tail) in enumerate(pending):
        if use_ray:
            blob = ray.get(tail)
            fname = _write_shard(i, blob)
            nbytes = len(blob)
        else:  # file already written at dispatch time; tail is its size
            fname = f"terms-{i:05d}.fst"
            nbytes = tail
        shard_meta.append(
            {"file": fname, "term_min": mn, "term_max": mx, "base": base, "n_terms": n}
        )
        base += n
        total_bytes += nbytes
    info = {
        "segments": segments, "n_terms": base, "n_bytes": total_bytes,
        "shards": shard_meta,
    }
    with open(os.path.join(d, FST_META), "w") as fh:
        json.dump(info, fh)
    # remove a stale single-image file so the two formats never coexist
    single = os.path.join(d, FST_FILE)
    if os.path.exists(single):
        os.remove(single)
    return info


def load_fst_sidecar(index_dir: str, segments: list[str]) -> "Fst | ShardedFst | None":
    """Load the sidecar if present AND built over exactly the current
    segment list; None otherwise (caller falls back to building from
    the catalogs)."""
    d = fst_dir(index_dir)
    meta_path = os.path.join(d, FST_META)
    data_path = os.path.join(d, FST_FILE)

    def _read_meta() -> "bytes | None":
        try:
            with open(meta_path, "rb") as fh:
                return fh.read()
        except OSError:
            return None

    raw = _read_meta()
    if raw is None:
        return None
    try:
        info = json.loads(raw)
    except json.JSONDecodeError:
        return None
    if list(info.get("segments", [])) != list(segments):
        return None  # stale: segments were added/compacted since
    if "shards" in info:
        shards = []
        # (terms.fst absent by design in the sharded format)
        for sm in info["shards"]:
            p = os.path.join(d, sm["file"])
            if not os.path.exists(p):
                return None
            with open(p, "rb") as fh:
                shards.append((sm["term_min"], sm["term_max"], int(sm["base"]), Fst(fh.read())))
        # Re-read the metadata AFTER the shard bytes: a concurrent
        # rebuild (build_fst_sidecar unlinks fst.json first, then
        # replaces shard files, then writes the new json) could have
        # swapped shard bytes under us — OLD ranges/bases paired with
        # NEW shard images would route terms to the wrong shard.  Any
        # change (or absence) between the two reads ⇒ treat as no
        # sidecar; the caller's catalog fallback is always correct.
        if _read_meta() != raw:
            return None
        return ShardedFst(shards)
    if not os.path.exists(data_path):
        return None
    with open(data_path, "rb") as fh:
        img = fh.read()
    if _read_meta() != raw:
        return None  # concurrent rebuild mid-load (see above)
    return Fst(img)
