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
            "source": batch["source"] if "source" in batch.schema.names else pa.array([""] * len(texts)),
        }
    )
