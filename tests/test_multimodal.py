"""Multimodal plumbing: actor-pool decode / resize / frame-sample
stages over opaque binary payloads — deterministic fakes (no media
libs in this environment), real schemas/batching/explode layout."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fulltextsearch_ray.functions.multimodal import (
    DecodeStage,
    FeatureStage,
    FrameSampleStage,
    ResizeStage,
    text_as_media,
)


@pytest.fixture()
def media_ds(ray_session):
    payloads = [b"fake-image-bytes-%d" % i * (i + 1) for i in range(20)]
    tbl = pa.table(
        {
            "media_id": pa.array(range(20), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image"] * 20, pa.string()),
            "source": pa.array(["synth"] * 20, pa.string()),
        }
    )
    return ray.data.from_arrow(tbl), payloads


def test_decode_then_resize_geometry(media_ds):
    ds, payloads = media_ds
    out = (
        ds.map_batches(DecodeStage, fn_constructor_kwargs={"fake": True},
                       batch_format="pyarrow", batch_size=8, concurrency=2)
        .map_batches(ResizeStage, fn_constructor_kwargs={"target": 224, "fake": True},
                     batch_format="pyarrow", batch_size=8, concurrency=2)
        .take_all()
    )
    assert len(out) == 20
    for r in out:
        assert max(r["out_width"], r["out_height"]) == 224 or max(r["width"], r["height"]) < 224
        # aspect preserved under integer fit
        assert r["out_width"] == max(r["width"] * 224 // max(r["width"], r["height"]), 1)


def test_frame_sample_explode_deterministic(media_ds):
    ds, payloads = media_ds
    rows = ds.map_batches(
        FrameSampleStage, fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow", batch_size=8, concurrency=2,
    ).take_all()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, frames in by_media.items():
        p = payloads[mid]
        d = hashlib.md5(p).hexdigest()
        expect_n = 2 + int(d[8:12], 16) % 7
        assert len(frames) == expect_n
        frames.sort(key=lambda r: r["frame_idx"])
        for i, f in enumerate(frames):
            assert f["frame_idx"] == i
            assert f["ts_ms"] == i * 40
            assert f["frame_md5"] == hashlib.md5(p + b":" + str(i).encode()).hexdigest()


def test_feature_stage_deterministic(media_ds):
    ds, _ = media_ds
    a = ds.map_batches(FeatureStage, fn_constructor_kwargs={"dim": 8},
                       batch_format="pyarrow", batch_size=8, concurrency=2).take_all()
    b = ds.map_batches(FeatureStage, fn_constructor_kwargs={"dim": 8},
                       batch_format="pyarrow", batch_size=4, concurrency=2).take_all()
    fa = {r["media_id"]: r["features"] for r in a}
    fb = {r["media_id"]: r["features"] for r in b}
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])  # batch-size invariant


def test_real_decode_is_honestly_unimplemented():
    with pytest.raises(NotImplementedError):
        DecodeStage(fake=False)
    with pytest.raises(NotImplementedError):
        ResizeStage(fake=False)
    with pytest.raises(NotImplementedError):
        FrameSampleStage(fake=False)


def test_text_as_media_adapter(ray_session):
    tbl = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "text": pa.array(["hello", None], pa.string())}
    )
    out = text_as_media(tbl)
    assert out["payload"].to_pylist() == [b"hello", b""]
    assert out["media_id"].to_pylist() == [1, 2]


def test_codec_auto_select_falls_back_to_fake_without_libs():
    """fake=None (auto) uses the real codec only when its lib imports;
    in this sandbox (no Pillow/PyAV) every stage must auto-select the
    deterministic fake, while explicit fake=False still demands the
    lib (NotImplementedError when missing)."""
    from fulltextsearch_ray.functions import multimodal as mm

    decode = DecodeStage(fake=None)
    resize = ResizeStage(fake=None)
    frames = FrameSampleStage(fake=None)
    if mm._PILImage is None:
        assert decode.fake is True and resize.fake is True
    else:  # real-codec environment: auto selects the real path
        assert decode.fake is False and resize.fake is False
    assert frames.fake is (mm._av is None)
    # auto-mode output schema matches the pinned-fake gates
    import pyarrow as pa

    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"not-an-image"], pa.binary()),
        }
    )
    if mm._PILImage is None:
        out = decode(batch)
        assert out.column_names == ["media_id", "n_bytes", "md5", "width", "height"]
