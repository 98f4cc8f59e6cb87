"""Group-varint golden + round-trip tests (FIXTURES.md §6, ported from
the reference's GroupVarIntTests.cs)."""

import numpy as np
import pytest

from fulltextsearch_ray.groupvarint import group_varint_decode, group_varint_encode


def test_reference_golden_bit_pattern():
    # {80, 320, 31, 255} → 00010000 01010000 00000001 01000000 00011111 11111111
    out = group_varint_encode(np.array([80, 320, 31, 255], dtype=np.uint32))
    bits = " ".join(format(b, "08b") for b in out)
    assert bits == "00010000 01010000 00000001 01000000 00011111 11111111"


@pytest.mark.parametrize(
    "values",
    [
        [],
        [0],
        [1, 2, 3],
        [2**31 - 1, 0, 255, 256, 65535, 65536],
        [2**32 - 1] * 7,
        list(range(1, 1000)),
    ],
)
def test_roundtrip(values):
    v = np.array(values, dtype=np.uint32)
    assert group_varint_decode(group_varint_encode(v), len(v)).tolist() == values


def test_roundtrip_large_range():
    # reference tests include range(1, 1_000_000)
    v = np.arange(1, 1_000_000, dtype=np.uint32)
    out = group_varint_decode(group_varint_encode(v), len(v))
    assert np.array_equal(out, v)


def test_random_roundtrip():
    rng = np.random.default_rng(13)
    for bits in (8, 16, 24, 32):
        v = rng.integers(0, 2**bits, size=10_001, dtype=np.uint64).astype(np.uint32)
        assert np.array_equal(group_varint_decode(group_varint_encode(v), len(v)), v)


def test_packed_ints_roundtrip():
    from fulltextsearch_ray.groupvarint import packed_ints_decode, packed_ints_encode

    rng = np.random.default_rng(5)
    for bits in (1, 7, 13, 33, 63):
        v = rng.integers(0, 2**bits, size=777, dtype=np.uint64)
        out = packed_ints_decode(packed_ints_encode(v))
        assert np.array_equal(out, v), bits
    assert packed_ints_decode(packed_ints_encode(np.array([], dtype=np.uint64))).tolist() == []
    assert packed_ints_decode(packed_ints_encode(np.array([0, 0, 1], dtype=np.uint64))).tolist() == [0, 0, 1]
    # benchmark-protocol stream
    v = np.arange(1000, 11000, dtype=np.uint64)
    assert np.array_equal(packed_ints_decode(packed_ints_encode(v)), v)
