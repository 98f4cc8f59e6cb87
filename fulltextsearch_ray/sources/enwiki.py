"""Wikipedia-abstract XML and plain-text directory sources — the
reference ConsoleUtil's remaining input types (``--input-type
enwiki | text | name``), re-expressed as Ray Data sources.

Reference behavior (observed at ``ConsoleUtil/Program.cs:297-356``; no
code copied): the ``enwiki`` input streams ``<title>`` element text
from Wikipedia abstract XML dumps, strips a leading ``"Wikipedia: "``
prefix, and indexes every non-empty title as one document with a
per-file ordinal in its metadata; ``text`` indexes each file's content
with ``{filename, size}`` metadata; ``name`` indexes the file PATH
string itself.  The reference's ``download`` verb (HTTP fetch + gunzip
of dump shards) maps to :func:`fetch_to_dir` (any urllib scheme —
exercised with ``file://`` URLs in this sandbox) plus transparent
``.gz`` handling in the XML reader.

Scale shape: one parse task per input file (wiki dumps ship as many
shards — parallelism is the shard count; a single giant XML file is
inherently serial to parse, same as the reference).  Parsed titles land
in the object store once (spillable) and are re-used by both the
count pass and the id-assignment pass; per-file title counts (ONE row
per file) are the only driver-side state.
"""

from __future__ import annotations

import gzip
import json
import os
import xml.etree.ElementTree as ET
from typing import IO, Iterator

import numpy as np
import pyarrow as pa
import ray
import ray.data

_WIKI_PREFIX = "Wikipedia: "


def _open_maybe_gzip(path: str) -> IO[bytes]:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def iter_enwiki_titles(path: str) -> Iterator[str]:
    """Stream ``<title>`` texts from an (optionally gzipped) XML file,
    stripping the ``"Wikipedia: "`` prefix.  Incremental pull parse —
    constant memory regardless of file size; tag match is
    namespace-agnostic (dump files carry a default xmlns).

    A title that is empty (or becomes empty after the prefix strip) is
    yielded as an EMPTY string rather than dropped: positional doc ids
    must stay dense — one per ``<title>`` element — so that the
    "ids depend only on file list + contents" contract (and the
    row_number-based oracle) holds even on degenerate inputs.  An empty
    document simply indexes to zero tokens."""
    with _open_maybe_gzip(path) as f:
        it = ET.iterparse(f, events=("start", "end"))
        root = None
        for event, elem in it:
            if root is None:
                root = elem  # document root, captured at first event
            if event != "end":
                continue
            tag = elem.tag.rsplit("}", 1)[-1]
            if tag == "title":
                text = elem.text or ""
                if text.startswith(_WIKI_PREFIX):
                    text = text[len(_WIKI_PREFIX):]
                yield text
            elem.clear()  # free the subtree
            # clear() empties elements but the ROOT keeps accumulating
            # (cleared) children — on a single multi-million-doc dump
            # that list alone breaks the O(1)-memory promise
            if root is not None and elem is not root and len(root):
                root.clear()


def _list_files(path: str, pattern: str) -> list[str]:
    import glob

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", pattern), recursive=True))
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no files matching {pattern} under {path}")
    return files


def read_enwiki_corpus(
    path: str,
    *,
    pattern: str = "*.xml*",
    start_id: int = 1,
) -> ray.data.Dataset:
    """Dataset of ``(doc_id uint64, content, meta)`` rows — one per
    title, ids positional over the sorted file list then document order
    within each file (the reference's "enumeration order defines
    docIDs" contract, retry-safe: ids depend only on file list + file
    contents).  ``meta`` is the reference's ``{"id": per-file ordinal}``
    JSON."""
    files = _list_files(path, pattern)
    items = [{"file": f, "file_idx": i} for i, f in enumerate(files)]

    def parse_file(batch: pa.Table) -> pa.Table:
        out_fi: list[int] = []
        out_ord: list[int] = []
        out_title: list[str] = []
        for f, fi in zip(batch["file"].to_pylist(), batch["file_idx"].to_pylist()):
            for t, title in enumerate(iter_enwiki_titles(f), start=1):
                out_fi.append(fi)
                out_ord.append(t)
                out_title.append(title)
        return pa.table(
            {
                "file_idx": pa.array(out_fi, pa.int64()),
                "ord": pa.array(out_ord, pa.int64()),
                "content": pa.array(out_title, pa.string()),
            }
        )

    parsed = (
        ray.data.from_items(items, override_num_blocks=len(items))
        .map_batches(parse_file, batch_format="pyarrow", batch_size=1)
        .materialize()  # parse once; feeds count pass + id pass
    )

    # per-file counts: one output row per file — tiny driver state
    def count_batch(batch: pa.Table) -> pa.Table:
        fi, cnt = np.unique(
            np.asarray(batch["file_idx"].to_numpy(zero_copy_only=False)), return_counts=True
        )
        return pa.table({"file_idx": pa.array(fi), "n": pa.array(cnt)})

    counts: dict[int, int] = {}
    for r in (
        parsed.select_columns(["file_idx"])
        .map_batches(count_batch, batch_format="pyarrow")
        .take_all()
    ):
        counts[int(r["file_idx"])] = counts.get(int(r["file_idx"]), 0) + int(r["n"])
    offsets = np.zeros(len(files) + 1, dtype=np.int64)
    for fi in range(len(files)):
        offsets[fi + 1] = offsets[fi] + counts.get(fi, 0)
    offsets_ref = ray.put(offsets)

    def add_ids(batch: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref)
        fi = np.asarray(batch["file_idx"].to_numpy(zero_copy_only=False), dtype=np.int64)
        order = np.asarray(batch["ord"].to_numpy(zero_copy_only=False), dtype=np.int64)
        doc_id = (start_id + offs[fi] + order - 1).astype(np.uint64)
        meta = pa.array([json.dumps({"id": int(o)}) for o in order], pa.string())
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.uint64()),
                "content": batch["content"],
                "meta": meta,
            }
        )

    return parsed.map_batches(add_ids, batch_format="pyarrow")


def read_text_dir(
    path: str,
    *,
    pattern: str = "*.txt",
    mode: str = "text",
    start_id: int = 1,
) -> ray.data.Dataset:
    """Directory of plain files → one document per file.

    ``mode="text"``: content = the file's text (reference ``AddFile``);
    ``mode="name"``: content = the file's path string (reference
    ``AddText(file.FullName)``).  ``meta`` carries the reference's
    ``{filename, size}`` JSON.  Ids are positional over the sorted
    listing; reads are one task per file."""
    if mode not in ("text", "name"):
        raise ValueError(f"mode must be 'text' or 'name', got {mode!r}")
    files = _list_files(path, pattern)
    items = [{"file": f, "doc_id": start_id + i} for i, f in enumerate(files)]

    def read_files(batch: pa.Table) -> pa.Table:
        contents: list[str] = []
        metas: list[str] = []
        for f in batch["file"].to_pylist():
            size = os.path.getsize(f)
            if mode == "text":
                with open(f, "r", encoding="utf-8", errors="replace") as fh:
                    contents.append(fh.read())
            else:
                contents.append(f)
            metas.append(json.dumps({"filename": f, "size": size}))
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.uint64()),
                "content": pa.array(contents, pa.string()),
                "meta": pa.array(metas, pa.string()),
            }
        )

    return ray.data.from_items(items, override_num_blocks=len(items)).map_batches(
        read_files, batch_format="pyarrow", batch_size=1
    )


def fetch_to_dir(urls: list[str], dest_dir: str) -> list[str]:
    """Mirror URLs into ``dest_dir`` (reference download verb).  Any
    urllib scheme; existing files are skipped (resumable — re-running a
    partially-failed mirror fetches only the missing shards).  Offline
    environments exercise this with ``file://`` URLs."""
    import hashlib as _hashlib
    import urllib.parse
    import urllib.request

    os.makedirs(dest_dir, exist_ok=True)
    out: list[str] = []
    # Local names: URL basename (query string stripped).  Collision
    # handling must be ORDER-INDEPENDENT across runs — "first URL in
    # the list keeps the bare name" would let a re-run with a
    # reordered list resolve one URL to another URL's cached bytes.
    # Two guards: (1) within one call, a basename shared by ≥2
    # distinct URLs hash-prefixes EVERY claimant; (2) across runs, a
    # `.fetch_sources.json` manifest records which URL each local
    # file came from, and a name recorded for a DIFFERENT url is
    # hash-prefixed instead of served stale.
    def _basename(u: str) -> str:
        return urllib.parse.urlparse(u).path.rstrip("/").rsplit("/", 1)[-1] or "download"

    distinct = list(dict.fromkeys(urls))
    counts: dict[str, int] = {}
    for u in distinct:
        counts[_basename(u)] = counts.get(_basename(u), 0) + 1
    manifest_path = os.path.join(dest_dir, ".fetch_sources.json")
    try:
        with open(manifest_path) as f:
            manifest: dict[str, str] = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        manifest = {}
    def _save_manifest() -> None:
        tmp_m = manifest_path + ".tmp"
        with open(tmp_m, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp_m, manifest_path)

    for url in urls:
        name = _basename(url)
        if counts[name] > 1 or manifest.get(name, url) != url:
            name = f"{_hashlib.md5(url.encode()).hexdigest()[:10]}-{name}"
        dest = os.path.join(dest_dir, name)
        if not os.path.exists(dest):
            tmp = dest + ".part"
            with urllib.request.urlopen(url) as r, open(tmp, "wb") as w:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    w.write(chunk)
            os.replace(tmp, dest)  # atomic: never a half-written dest
        if manifest.get(name) != url:
            # Persist provenance per file, not at loop end — a failure
            # on a LATER url must not lose the mapping for files
            # already written, or a re-run could serve one URL's
            # cached bytes as another same-basename URL's file.
            manifest[name] = url
            _save_manifest()
        out.append(dest)
    return out
