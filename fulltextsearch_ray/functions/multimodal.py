"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are treated as opaque Arrow ``binary``
columns with typed metadata travelling alongside.  Decode /
feature-extract stages are ACTOR-POOL ``map_batches`` classes — decoder
state (a model, a codec context) loads once per actor in ``__init__``.

The actual media codecs are NOT available in this environment, so the
decode step is STUBBED: ``DecodeStage(fake=True)`` produces a
deterministic fake decode (dimensions/features derived from the payload
md5) so the Ray-side plumbing — schema, batch sizing, actor signature,
output layout — is real and tested; ``fake=False`` raises
``NotImplementedError`` where a real libjpeg/ffmpeg call would go.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),   # image|audio|video
        ("source", pa.string()),
    ]
)


class DecodeStage:
    """Actor-pool decode stage for binary media payloads.

    Use small ``batch_size`` (payloads are large) and
    ``concurrency=N`` sized to node memory:
    ``ds.map_batches(DecodeStage, fn_constructor_kwargs={'fake': True},
    batch_size=16, concurrency=8)``.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake
        if not fake:
            # real decoder init (PIL / libav) would go here
            raise NotImplementedError("media codecs are not available in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n_bytes, digests, widths, heights = [], [], [], []
        for p in payloads:
            p = p or b""
            d = hashlib.md5(p).hexdigest()
            n_bytes.append(len(p))
            digests.append(d)
            # deterministic fake "decode": dims derived from the digest
            widths.append(16 + int(d[:4], 16) % 4080)
            heights.append(16 + int(d[4:8], 16) % 4080)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "md5": pa.array(digests, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
            }
        )


class FeatureStage:
    """Fake feature extractor: payload → deterministic small embedding
    (md5-seeded); stands in for a per-actor model forward pass."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            seed = int.from_bytes(hashlib.md5(p or b"").digest()[:8], "big")
            rng = np.random.default_rng(seed)
            feats.append(rng.standard_normal(self.dim).astype(np.float32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


class ResizeStage:
    """Actor-pool resize stage: fit the (decoded) dimensions into a
    ``target`` square box, preserving aspect ratio.

    The geometry is PURE INTEGER math (``dim * target // max(w, h)``)
    so it is engine-reproducible; the pixel resample itself would live
    where ``fake=False`` raises (no imaging libs in this environment).
    Input = DecodeStage output (media_id, width, height, ...).
    """

    def __init__(self, target: int = 224, fake: bool = True):
        self.target = target
        if not fake:
            raise NotImplementedError("media codecs are not available in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = np.asarray(batch["width"].to_numpy(zero_copy_only=False), dtype=np.int64)
        h = np.asarray(batch["height"].to_numpy(zero_copy_only=False), dtype=np.int64)
        longest = np.maximum(np.maximum(w, h), 1)
        out_w = np.maximum(w * self.target // longest, 1)
        out_h = np.maximum(h * self.target // longest, 1)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(w.astype(np.int32)),
                "height": pa.array(h.astype(np.int32)),
                "out_width": pa.array(out_w.astype(np.int32)),
                "out_height": pa.array(out_h.astype(np.int32)),
            }
        )


class FrameSampleStage:
    """Actor-pool frame sampler for video payloads: one output ROW per
    sampled frame (a flat-map explode — the schema/layout a real
    ffmpeg-backed sampler would produce).

    Deterministic fake: frame count = 2 + md5[8:12] % 7, frame payload
    digest = md5(payload + b':' + frame_idx), timestamp = 40 ms × idx
    (25 fps).  ``fake=False`` raises where the demuxer would go.
    """

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError("media codecs are not available in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, md5_out, ts_out = [], [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            p = p or b""
            d = hashlib.md5(p).hexdigest()
            n_frames = 2 + int(d[8:12], 16) % 7
            for i in range(n_frames):
                ids_out.append(mid)
                idx_out.append(i)
                md5_out.append(hashlib.md5(p + b":" + str(i).encode()).hexdigest())
                ts_out.append(i * 40)
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "frame_idx": pa.array(idx_out, pa.int32()),
                "frame_md5": pa.array(md5_out, pa.string()),
                "ts_ms": pa.array(ts_out, pa.int64()),
            }
        )


def text_as_media(batch: pa.Table) -> pa.Table:
    """Adapter used in tests/driver checks: documents → fake media rows
    (utf-8 payload bytes) so the multimodal plumbing is exercised on
    real tables without binary fixtures."""
    texts = [(t or "").encode("utf-8") for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "media_id": batch["doc_id"],
            "payload": pa.array(texts, pa.binary()),
            "media_type": pa.array(["image"] * len(texts), pa.string()),
            # explicit type: an inferred pa.array([]) is null-typed and
            # a zero-row block's schema then fights the string blocks
            "source": batch["source"]
            if "source" in batch.schema.names
            else pa.array([""] * len(texts), pa.string()),
        }
    )
