"""Compaction must carry the forward store, docs_meta and legacy
segments — regression tests for segment-merge data loss."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from fulltextsearch_ray.pipelines.build import build_index, compact_index
from fulltextsearch_ray.pipelines.query import IndexSearcher


def _tbl(ids, texts, metas=None):
    cols = {
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    if metas is not None:
        cols["meta"] = pa.array([json.dumps(m) for m in metas], pa.string())
    return pa.table(cols)


def test_compact_preserves_forward_and_metadata(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    kw = dict(text_col="text", doc_id_col="doc_id", meta_cols=("meta",),
              num_buckets=2, store_forward=True)
    build_index(
        ray.data.from_arrow(_tbl([1, 2], ["apple pie", "banana split"],
                                 [{"k": 1}, {"k": 2}])),
        idx, **kw,
    )
    build_index(
        ray.data.from_arrow(_tbl([3], ["cherry apple tart"], [{"k": 3}])),
        idx, **kw,
    )
    before = IndexSearcher(idx)
    assert before.has_forward
    want_search = before.search_to_string("WORD(apple)")
    want_pos = before.get_positions_many([3])

    compact_index(idx)

    after = IndexSearcher(idx)
    assert after.search_to_string("WORD(apple)") == want_search
    # forward store survived: positions served without re-tokenization
    assert after.has_forward
    assert after.get_positions_many([3]) == want_pos
    # per-doc metadata survived
    assert json.loads(after.get_metadata(2)["meta"]) == {"k": 2}
    assert json.loads(after.get_metadata(3)["meta"]) == {"k": 3}


def test_compact_mixed_meta_sessions(ray_session, tmp_path):
    """One session with meta_cols, one without: metadata stays
    reachable for BOTH after compaction (docs fallback per segment)."""
    idx = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(_tbl([1], ["apple pie"], [{"k": 1}])),
        idx, text_col="text", doc_id_col="doc_id", meta_cols=("meta",), num_buckets=2,
    )
    build_index(
        ray.data.from_arrow(_tbl([2], ["banana split"])),
        idx, text_col="text", doc_id_col="doc_id", num_buckets=2,
    )
    compact_index(idx)
    s = IndexSearcher(idx)
    assert json.loads(s.get_metadata(1)["meta"]) == {"k": 1}
    assert s.get_metadata(2) == {}  # exists, no stored metadata — not a KeyError


def test_compact_legacy_segment_without_ndocs(ray_session, tmp_path):
    import glob
    import os

    idx = str(tmp_path / "idx")
    for tbl in (_tbl([1, 2], ["apple pie", "banana split"]),
                _tbl([3], ["cherry apple tart"])):
        build_index(ray.data.from_arrow(tbl), idx, text_col="text",
                    doc_id_col="doc_id", num_buckets=2)
    # simulate a pre-n_docs segment: rewrite its postings without the column
    seg0 = sorted(glob.glob(os.path.join(idx, "segments", "*")))[0]
    for f in glob.glob(os.path.join(seg0, "postings", "**", "*.parquet"), recursive=True):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["n_docs"]), f)
    want = IndexSearcher(idx).search_to_string("WORD(apple)")

    compact_index(idx)

    s = IndexSearcher(idx)
    assert s.search_to_string("WORD(apple)") == want
    assert s.bm25_topk("apple").num_rows > 0


def test_compact_streaming_store_rewrite(ray_session, tmp_path):
    """Past the file-count budget, forward/docs_meta merge as a Ray
    streaming rewrite (no per-file driver copies) — served results must
    be identical to the copy path (round-2 VERDICT #8)."""
    idx = str(tmp_path / "idx")
    kw = dict(text_col="text", doc_id_col="doc_id", meta_cols=("meta",),
              num_buckets=2, store_forward=True)
    build_index(
        ray.data.from_arrow(_tbl([1, 2], ["apple pie", "banana split"],
                                 [{"k": 1}, {"k": 2}])),
        idx, **kw,
    )
    build_index(
        ray.data.from_arrow(_tbl([3, 4], ["cherry apple tart", "mango apple fool"],
                                 [{"k": 3}, {"k": 4}])),
        idx, **kw,
    )
    before = IndexSearcher(idx)
    want_search = before.search_to_string("WORD(apple)")
    want_pos = {d: before.get_positions_many([d])[d] for d in (1, 2, 3, 4)}

    # budget 0 ⇒ every store takes the streaming path
    compact_index(idx, store_copy_file_budget=0)

    after = IndexSearcher(idx)
    assert after.search_to_string("WORD(apple)") == want_search
    assert after.has_forward
    for d in (1, 2, 3, 4):
        assert after.get_positions_many([d])[d] == want_pos[d], d
    for d in (1, 2, 3, 4):
        assert json.loads(after.get_metadata(d)["meta"]) == {"k": d}


def test_compact_streaming_rewrite_mixed_schemas(ray_session, tmp_path):
    """Streaming rewrite with a legacy (field_id-less) forward store
    and differing docs_meta schemas across sessions: normalization +
    per-schema-group rewrite keep every row served correctly."""
    import glob
    import os

    idx = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(_tbl([1], ["apple pie"], [{"k": 1}])),
        idx, text_col="text", doc_id_col="doc_id", meta_cols=("meta",),
        num_buckets=2, store_forward=True,
    )
    # strip field_id from session 1's forward files → legacy layout
    from fulltextsearch_ray.state.index import load_meta, segment_dir

    seg0 = load_meta(idx).segments[0]
    for f in glob.glob(os.path.join(segment_dir(idx, seg0), "forward", "**", "*.parquet"),
                       recursive=True):
        t = pq.read_table(f)
        if "field_id" in t.column_names:
            pq.write_table(t.drop_columns(["field_id"]), f)
    build_index(
        ray.data.from_arrow(_tbl([2], ["banana split"])),
        idx, text_col="text", doc_id_col="doc_id", num_buckets=2, store_forward=True,
    )
    before = IndexSearcher(idx)
    want_pos = {d: before.get_positions_many([d])[d] for d in (1, 2)}
    compact_index(idx, store_copy_file_budget=0)
    after = IndexSearcher(idx)
    for d in (1, 2):
        assert after.get_positions_many([d])[d] == want_pos[d], d
    assert json.loads(after.get_metadata(1)["meta"]) == {"k": 1}
    assert after.get_metadata(2) == {}
