"""User-extension surface — the reference's interface seams as Python
protocols (SURVEY.md §2.8: ``ITextTokenizer``, ``IOccurrenceWriter/
Reader``, ``ITermDictionary``, ``ISearchQuery``, factory registries).

Each protocol is consumed by a ``map_batches`` stage; registries map a
name (persisted in ``meta.json``) to an implementation, mirroring the
reference's ``IndexFactory``/``PostingListIOFactory`` name registries.
"""

from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable

import numpy as np


@runtime_checkable
class Tokenizer(Protocol):
    """``ITextTokenizer`` seam: text → (terms, counts, doc_index, token_ids)."""

    def tokenize_batch(self, texts) -> object: ...


@runtime_checkable
class PostingCodec(Protocol):
    """``IOccurrenceWriter``/``IOccurrenceReader`` seam: a pair of
    array kernels over non-decreasing uint sequences."""

    name: str

    def encode(self, values: np.ndarray) -> bytes: ...

    def decode(self, buf: bytes, count: int | None = None) -> np.ndarray: ...


class VarIntCodec:
    """Default codec (the reference's ``VarIntCompressed`` analog)."""

    name = "varint"

    def encode(self, values: np.ndarray) -> bytes:
        from .codecs import varint_encode

        return varint_encode(values)

    def decode(self, buf: bytes, count: int | None = None) -> np.ndarray:
        from .codecs import varint_decode

        return varint_decode(buf, count)


class GroupVarIntCodec:
    """The reference's ``BinaryCompressed`` group-varint analog.

    DOMAIN: the group-varint wire format is 32-bit (reference parity),
    so these codecs ('groupvarint', 'binary', 'binarycompressed')
    accept values < 2^32 only — group_varint_encode raises ValueError
    past that.  Indexes whose doc-id space can exceed 2^32 must use
    the default 'varint' codec (unbounded LEB128)."""

    name = "groupvarint"

    def encode(self, values: np.ndarray) -> bytes:
        from .groupvarint import group_varint_encode

        n = len(values)
        return n.to_bytes(4, "little") + group_varint_encode(values)

    def decode(self, buf: bytes, count: int | None = None) -> np.ndarray:
        from .groupvarint import group_varint_decode

        n = int.from_bytes(buf[:4], "little")
        out = group_varint_decode(buf[4:], n)
        if count is not None and len(out) != count:  # loud under -O too
            raise ValueError(f"{self.name}: expected {count} values, got {len(out)}")
        return out.astype(np.uint64)


class PackedIntCodec:
    """The reference's ``PackedInt`` fixed-width bit-packing analog."""

    name = "packedint"

    def encode(self, values: np.ndarray) -> bytes:
        from .groupvarint import packed_ints_encode

        return packed_ints_encode(values)

    def decode(self, buf: bytes, count: int | None = None) -> np.ndarray:
        from .groupvarint import packed_ints_decode

        out = packed_ints_decode(buf)
        if count is not None and len(out) != count:  # loud under -O too
            raise ValueError(f"{self.name}: expected {count} values, got {len(out)}")
        return out


class BinaryCodec(GroupVarIntCodec):
    """The reference's C2 ``Binary`` codec: group-varint of the RAW
    values, no delta step (``PostingListBinaryWriter.cs`` — behavior
    observed; no code copied).  Distinct from ``binarycompressed``
    purely by the absence of deltas."""

    name = "binary"


class BinaryCompressedCodec:
    """The reference's C3 ``BinaryCompressed`` codec as a registry
    entry: delta encode (first value absolute) then group-varint —
    the full wire recipe, not just the group-varint kernel."""

    name = "binarycompressed"

    def encode(self, values: np.ndarray) -> bytes:
        from .codecs import delta_encode
        from .groupvarint import group_varint_encode

        n = len(values)
        deltas = delta_encode(np.asarray(values, dtype=np.uint64))
        return n.to_bytes(4, "little") + group_varint_encode(deltas)

    def decode(self, buf: bytes, count: int | None = None) -> np.ndarray:
        from .codecs import delta_decode
        from .groupvarint import group_varint_decode

        n = int.from_bytes(buf[:4], "little")
        out = delta_decode(group_varint_decode(buf[4:], n).astype(np.uint64))
        if count is not None and len(out) != count:
            # real exception, not assert: loud under -O too (same
            # contract as the sibling codecs)
            raise ValueError(f"binarycompressed: expected {count}, got {len(out)}")
        return out


POSTING_CODECS: dict[str, PostingCodec] = {
    "varint": VarIntCodec(),
    "groupvarint": GroupVarIntCodec(),
    "packedint": PackedIntCodec(),
    "binary": BinaryCodec(),
    "binarycompressed": BinaryCompressedCodec(),
}


@runtime_checkable
class Scorer(Protocol):
    """Ranking seam: (tf, df, dl, N, avgdl) arrays → score contributions."""

    def __call__(
        self, tf: np.ndarray, df: float, dl: np.ndarray, n_docs: float, avgdl: float
    ) -> np.ndarray: ...


def bm25_scorer(k1: float = 1.2, b: float = 0.75) -> Scorer:
    def score(tf, df, dl, n_docs, avgdl):
        idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    return score


SCORERS: dict[str, Callable[..., Scorer]] = {"bm25": bm25_scorer}
