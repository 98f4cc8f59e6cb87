"""Group-varint codec — numpy-vectorized (the reference's C3 kernel).

Format (same wire layout as ``Common/GroupVarInt.cs:49-172``): values
are encoded in groups of 4; each group = 1 selector byte (2 bits per
value giving byte-width-1, value 0 in the HIGH bits / MSB-first)
followed by the values' BIG-ENDIAN bytes.  The reference's golden
test vector
(``GroupVarIntTests.cs:6-29``): ``{80, 320, 31, 255}`` →
``00010000 01010000 00000001 01000000 00011111 11111111``.

Only 32-bit values (the reference operates on ints); a trailing group
with fewer than 4 values is padded with zeros on encode and trimmed by
``count`` on decode.  All paths are numpy array passes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["group_varint_encode", "group_varint_decode"]


def group_varint_encode(values: np.ndarray) -> bytes:
    values = np.asarray(values)
    if len(values) and (int(values.max()) >= (1 << 32) or int(values.min()) < 0):
        # the group-varint wire format is 32-bit; an unsafe cast would
        # wrap out-of-range values mod 2^32 and decode a DIFFERENT
        # value silently (negatives included)
        raise ValueError("group_varint_encode: value outside [0, 2^32)")
    v = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(v)
    if n == 0:
        return b""
    pad = (-n) % 4
    if pad:
        v = np.concatenate([v, np.zeros(pad, dtype=np.uint32)])
    g = v.reshape(-1, 4)
    # bytes per value: 1..4
    nb = np.ones(g.shape, dtype=np.uint8)
    for k, th in enumerate((1 << 8, 1 << 16, 1 << 24), start=0):
        nb += (g >= np.uint32(th)).astype(np.uint8)
    # selector: 2 bits per value, value 0 in the HIGH bits (MSB-first,
    # matching the reference/article layout)
    sel = (
        ((nb[:, 0] - 1) << 6)
        | ((nb[:, 1] - 1) << 4)
        | ((nb[:, 2] - 1) << 2)
        | (nb[:, 3] - 1)
    ).astype(np.uint8)
    # payload: per group, each value's bytes BIG-endian, width nb[j]
    be = g.astype(">u4").view(np.uint8).reshape(-1, 4, 4)  # (groups, 4, 4)
    group_sizes = 1 + nb.sum(axis=1).astype(np.int64)
    total = int(group_sizes.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.zeros(len(g), dtype=np.int64)
    np.cumsum(group_sizes[:-1], out=starts[1:])
    out[starts] = sel
    # scatter value bytes (≤4 per value → 16 vectorized assignments max)
    rows = np.arange(len(g))
    pos = starts + 1
    for j in range(4):
        w = nb[:, j].astype(np.int64)
        for b in range(4):
            mask = w > b
            # b-th output byte of value j = BE byte index (4 - w + b)
            out[(pos + b)[mask]] = be[rows[mask], j, (4 - w + b)[mask]]
        pos = pos + w
    return out.tobytes()


def packed_ints_encode(values: np.ndarray) -> bytes:
    """Fixed-width bit packing (the reference's ``PackedInt`` codec
    family, ``Common/PackedInts.cs``): all values stored with the bit
    width of the largest.  Header: 1 byte width + 4 bytes count."""
    src = np.asarray(values)
    if src.dtype.kind not in "ui" or (src.dtype.kind == "i" and len(src) and int(src.min()) < 0):
        # same domain guard as group_varint_encode: a negative input
        # would wrap through the uint64 cast and round-trip to a
        # DIFFERENT value with no error
        raise ValueError("packed_ints_encode requires non-negative integer values")
    v = np.ascontiguousarray(src, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return bytes([0]) + (0).to_bytes(4, "little")
    width = max(int(v.max()).bit_length(), 1)
    # bit matrix (n, width) LSB-first → flat bit stream → packbits
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.uint8)
    flat = bits.reshape(-1)
    payload = np.packbits(flat, bitorder="little").tobytes()
    return bytes([width]) + n.to_bytes(4, "little") + payload


def packed_ints_decode(buf: bytes) -> np.ndarray:
    width = buf[0]
    n = int.from_bytes(buf[1:5], "little")
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    flat = np.unpackbits(np.frombuffer(buf[5:], dtype=np.uint8), bitorder="little")[: n * width]
    bits = flat.reshape(n, width).astype(np.uint64)
    weights = np.uint64(1) << np.arange(width, dtype=np.uint64)
    return (bits * weights[None, :]).sum(axis=1, dtype=np.uint64)


def group_varint_decode(buf: bytes, count: int) -> np.ndarray:
    arr = np.frombuffer(buf, dtype=np.uint8)
    if count == 0:
        return np.empty(0, dtype=np.uint32)
    n_groups = (count + 3) // 4
    # group starts require sequential scan over selector widths —
    # do it with a small python loop over GROUPS (not values), then
    # vectorized byte gathers.
    starts = np.empty(n_groups, dtype=np.int64)
    widths = np.empty((n_groups, 4), dtype=np.int64)
    p = 0
    for gi in range(n_groups):
        starts[gi] = p
        sel = int(arr[p])
        w = (((sel >> 6) & 3) + 1, ((sel >> 4) & 3) + 1, ((sel >> 2) & 3) + 1, (sel & 3) + 1)
        widths[gi] = w
        p += 1 + sum(w)
    vals = np.zeros((n_groups, 4), dtype=np.uint32)
    pos = starts + 1
    for j in range(4):
        for b in range(4):
            mask = widths[:, j] > b
            # big-endian accumulate: val = (val << 8) | next_byte
            vals[mask, j] = (vals[mask, j] << np.uint32(8)) | arr[(pos + b)[mask]].astype(np.uint32)
        pos = pos + widths[:, j]
    return vals.reshape(-1)[:count]
