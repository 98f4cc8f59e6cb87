"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are treated as opaque Arrow ``binary``
columns with typed metadata travelling alongside.  Decode /
feature-extract stages are ACTOR-POOL ``map_batches`` classes — decoder
state (a model, a codec context) loads once per actor in ``__init__``.

Codec selection is a three-way ``fake`` flag on each stage:

* ``fake=None`` (auto, the default) — use the REAL codec when its
  library imports (Pillow for images, PyAV for video), else fall back
  to the deterministic fake.  This is the production configuration: the
  same pipeline code runs real decodes on a cluster image that ships
  the codec libs and stays testable in lib-less sandboxes.
* ``fake=True`` — always the deterministic fake (dimensions/frames
  derived from the payload md5); what tests and the driver gates pin so
  their goldens are environment-independent.
* ``fake=False`` — require the real codec; raises
  ``NotImplementedError`` when the library is missing.

The Ray-side plumbing — actor-pool stages with codec state in
``__init__``, schemas, batch sizing, flat-map frame explode — is
identical on both paths.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa

try:  # real image codec (Pillow) — absent in this sandbox
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

try:  # real video demuxer (PyAV / ffmpeg) — absent in this sandbox
    import av as _av
except ImportError:
    _av = None


def _resolve_fake(fake: "bool | None", lib, what: str) -> bool:
    """Three-way codec selection shared by the stages (module
    docstring): auto → real iff the lib imports; False → demand it."""
    if fake is None:
        return lib is None
    if fake is False and lib is None:
        raise NotImplementedError(
            f"{what} requires a media codec library that is not "
            "available in this environment (install it, or pass "
            "fake=True / fake=None for the deterministic fake)"
        )
    return bool(fake)

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

    def __init__(self, fake: "bool | None" = None):
        self.fake = _resolve_fake(fake, _PILImage, "DecodeStage")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n_bytes, digests, widths, heights = [], [], [], []
        for p in payloads:
            p = p or b""
            d = hashlib.md5(p).hexdigest()
            n_bytes.append(len(p))
            digests.append(d)
            if self.fake:
                # deterministic fake "decode": dims derived from the digest
                widths.append(16 + int(d[:4], 16) % 4080)
                heights.append(16 + int(d[4:8], 16) % 4080)
            else:
                # real decode: header-only open (Pillow is lazy — no
                # full pixel decode just to read dimensions).  A null or
                # undecodable payload yields NULL dims for that row —
                # one corrupt image must not fail the whole batch task.
                try:
                    with _PILImage.open(io.BytesIO(p)) as im:
                        widths.append(int(im.width))
                        heights.append(int(im.height))
                except Exception:
                    widths.append(None)
                    heights.append(None)
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
    so it is engine-reproducible on both paths.  With the real codec
    (Pillow importable, ``fake`` None/False) AND a ``payload`` column
    present, the stage additionally resamples the pixels and emits the
    resized image bytes as ``resized`` (PNG); otherwise it is
    geometry-only.  Input = DecodeStage output (media_id, width,
    height, ...), optionally joined with the payload column.
    """

    def __init__(self, target: int = 224, fake: "bool | None" = None):
        self.target = target
        self.fake = _resolve_fake(fake, _PILImage, "ResizeStage")

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = np.asarray(batch["width"].to_numpy(zero_copy_only=False), dtype=np.int64)
        h = np.asarray(batch["height"].to_numpy(zero_copy_only=False), dtype=np.int64)
        longest = np.maximum(np.maximum(w, h), 1)
        out_w = np.maximum(w * self.target // longest, 1)
        out_h = np.maximum(h * self.target // longest, 1)
        cols = {
            "media_id": batch["media_id"],
            "width": pa.array(w.astype(np.int32)),
            "height": pa.array(h.astype(np.int32)),
            "out_width": pa.array(out_w.astype(np.int32)),
            "out_height": pa.array(out_h.astype(np.int32)),
        }
        if not self.fake and "payload" in batch.column_names:
            resized = []
            for p, ow, oh in zip(batch["payload"].to_pylist(), out_w, out_h):
                # null/undecodable payload → NULL resized bytes for the
                # row, never a whole-batch task failure
                try:
                    with _PILImage.open(io.BytesIO(p or b"")) as im:
                        buf = io.BytesIO()
                        im.resize((int(ow), int(oh))).save(buf, format="PNG")
                        resized.append(buf.getvalue())
                except Exception:
                    resized.append(None)
            cols["resized"] = pa.array(resized, pa.binary())
        return pa.table(cols)


class FrameSampleStage:
    """Actor-pool frame sampler for video payloads: one output ROW per
    sampled frame (a flat-map explode — the schema/layout a real
    ffmpeg-backed sampler would produce).

    Deterministic fake: frame count = 2 + md5[8:12] % 7, frame payload
    digest = md5(payload + b':' + frame_idx), timestamp = 40 ms × idx
    (25 fps).  Real path (PyAV importable, ``fake`` None/False):
    demux + decode keyframes, same output schema with true timestamps
    and the md5 of each frame's raw plane bytes.
    """

    def __init__(self, fake: "bool | None" = None):
        self.fake = _resolve_fake(fake, _av, "FrameSampleStage")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idx_out, md5_out, ts_out = [], [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            p = p or b""
            if not self.fake:
                # an undecodable/null payload contributes zero frames
                # (flat-map semantics), never a whole-batch failure
                try:
                    with _av.open(io.BytesIO(p)) as container:
                        stream = container.streams.video[0]
                        stream.codec_context.skip_frame = "NONKEY"  # keyframes only
                        for i, frame in enumerate(container.decode(stream)):
                            ids_out.append(mid)
                            idx_out.append(i)
                            md5_out.append(
                                hashlib.md5(bytes(frame.planes[0])).hexdigest()
                            )
                            ts_out.append(int((frame.time or 0.0) * 1000))
                except Exception:
                    pass
                continue
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
