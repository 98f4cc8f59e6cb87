"""RFC 1978 predictor codec (reference PredictorProtocol.cs parity —
behavior observed; framing quirks XOR-0xEA and hash<<7 kept)."""

import random

import pytest

from fulltextsearch_ray.predictor import predictor_compress, predictor_decompress


def test_empty_and_single_byte_goldens():
    # empty input = one zero flags byte
    assert predictor_compress(b"") == b"\x00"
    assert predictor_decompress(b"\x00") == b""
    # single literal: flags 0 then the perturbed byte (0x41 ^ 0xEA)
    assert predictor_compress(b"A") == b"\x00\xab"
    assert predictor_decompress(b"\x00\xab") == b"A"


@pytest.mark.parametrize("n", [1, 7, 8, 9, 15, 16, 17, 255, 256, 1000])
def test_roundtrip_group_boundaries(n):
    rng = random.Random(n)
    data = bytes(rng.randrange(256) for _ in range(n))
    assert predictor_decompress(predictor_compress(data)) == data


def test_roundtrip_repetitive_compresses():
    data = b"the quick brown fox " * 500
    comp = predictor_compress(data)
    assert predictor_decompress(comp) == data
    # guessed bytes cost 1 bit: long repeats approach 1/8 of input
    assert len(comp) < len(data) // 2


def test_roundtrip_incompressible_bounded_expansion():
    rng = random.Random(99)
    data = bytes(rng.randrange(256) for _ in range(4096))
    comp = predictor_compress(data)
    assert predictor_decompress(comp) == data
    # worst case = 1 flags byte per 8 input bytes (+ trailing flags)
    assert len(comp) <= len(data) + len(data) // 8 + 2


def test_all_same_byte_extreme():
    data = b"\xea" * 10_000  # XOR-perturbs to 0x00 == initial guess table
    comp = predictor_compress(data)
    assert predictor_decompress(comp) == data
    assert len(comp) <= len(data) // 8 + 2


def test_malformed_streams_raise():
    with pytest.raises(ValueError):
        predictor_decompress(b"")
    # flags bit 1 of 0x02 demands a literal byte that is not there
    with pytest.raises(ValueError):
        predictor_decompress(b"\x02")
    # a full literal group whose boundary flags byte is missing
    with pytest.raises(ValueError):
        predictor_decompress(b"\x00" + bytes(range(1, 9)))
