"""Round-5 session-4 review-fix regressions: catalog MemoryError
fallback, list-offset overflow fallback, unknown-size pair probe."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def test_vec_list_array_large_offsets_fallback(monkeypatch):
    """Past the int32 offset ceiling the column switches to 64-bit
    LargeList offsets instead of silently wrapping negative (the old
    .astype(np.int32) built a corrupt column)."""
    from fulltextsearch_ray.functions import common

    m = np.arange(12, dtype=np.float64).reshape(4, 3)
    small = common.vec_list_array(m)
    assert small.type == pa.list_(pa.float64())
    monkeypatch.setattr(common, "_LIST_OFFSET_MAX", 5)  # 12 values > 5
    big = common.vec_list_array(m)
    assert big.type == pa.large_list(pa.float64())
    assert big.to_pylist() == small.to_pylist() == m.tolist()


def test_pairs_pipeline_unknown_hint_matches_known(ray_session):
    """rows_hint=None (unknown exploded size) must route through the
    bounded limit(budget+1).count() probe and produce the same pairs
    as an exact hint in BOTH budget regimes (the old probe pinned the
    whole exploded dataset via materialize() just to count it)."""
    import pandas as pd

    from fulltextsearch_ray.functions.dedup import _pairs_pipeline

    # exploded (key, id) rows: key buckets {1: [1,2,3], 2: [3,4]}
    tbl = pa.table({
        "key": pa.array([1, 1, 1, 2, 2], pa.uint64()),
        "id": pa.array([1, 2, 3, 3, 4], pa.int64()),
    })

    def part_pairs(g: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        df = g.to_pandas()
        for _, grp in df.groupby("key"):
            ids = sorted(grp["id"].tolist())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "v": pa.array([1.0] * len(out_a), pa.float64())})

    def run(budget, hint):
        ds = ray.data.from_arrow(tbl)
        out = _pairs_pipeline(ds, "key", part_pairs, "v", pa.float64(),
                              "max", P=4, small_rows_budget=budget,
                              rows_hint=hint)
        return (out.to_pandas().sort_values(["a", "b"])
                .reset_index(drop=True)[["a", "b"]])

    want = pd.DataFrame({"a": [1, 1, 2, 3], "b": [2, 3, 3, 4]})
    for budget in (0, 10**6):
        for hint in (None, 5):
            got = run(budget, hint)
            assert got.equals(want), (budget, hint, got)


def test_build_catalog_memoryerror_falls_back_to_ray(ray_session, tmp_path, monkeypatch):
    """The driver-side catalog aggregate routing to the Ray groupby on
    MemoryError was dropped in a refactor; a driver that cannot hold
    the block stats must still complete the build via the fallback."""
    import pyarrow.parquet as pq

    from fulltextsearch_ray.pipelines.build import _build_catalog, build_index
    from fulltextsearch_ray.state.index import load_meta, segment_dir

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.uint64()),
        "text": pa.array(["hello world", "hello ray data", "world of search"]),
    })
    idx = str(tmp_path / "memidx")
    build_index(ray.data.from_arrow(tbl), idx, doc_id_col="doc_id",
                num_buckets=2, overwrite=True)
    seg = segment_dir(idx, load_meta(idx).segments[0])
    import os
    import shutil

    cat_dir = os.path.join(seg, "catalog")
    want = pq.read_table(cat_dir).sort_by("term")
    shutil.rmtree(cat_dir)

    real_read = pq.read_table

    def bomb(path, *a, **kw):
        if isinstance(path, str) and path.rstrip("/").endswith("postings"):
            raise MemoryError("driver cannot hold block stats")
        return real_read(path, *a, **kw)

    monkeypatch.setattr(pq, "read_table", bomb)
    n_terms, n_occ = _build_catalog(seg)
    monkeypatch.undo()
    got = pq.read_table(cat_dir).sort_by("term")
    assert n_terms == want.num_rows
    assert got.select(want.column_names).cast(want.schema).equals(want)
