"""Predictor compression (RFC 1978, PPP Predictor Compression
Protocol) — the reference's ``Common/Compression/PredictorProtocol.cs``
(behavior observed, no code copied; the scheme itself is public —
https://www.ietf.org/rfc/rfc1978.txt).

A 2048-slot guess table predicts the next byte from a rolling hash of
the bytes seen so far; correctly guessed bytes cost one FLAG BIT, the
rest pass through verbatim behind a per-8-byte flags byte.  Output is
byte-compatible with the reference (including its two quirks, kept for
parity: every payload byte is XOR-perturbed with ``0xEA`` before
entering the hash/guess chain, and the hash is
``((hash << 7) ^ c) % 2048``).

This is a format-matrix utility codec, exactly as it is in the
reference (defined but not wired into the index hot path); postings
use the delta+varint / group-varint codecs in
:mod:`fulltextsearch_ray.codecs` / :mod:`fulltextsearch_ray.groupvarint`.
The per-byte chain is inherently sequential, so this stays a plain
loop — never put it inside a per-batch hot path.
"""

from __future__ import annotations

__all__ = ["predictor_compress", "predictor_decompress"]

_GUESS_SIZE = 2048
_PERTURB = 0xEA


def predictor_compress(data: bytes) -> bytes:
    """Compress ``data``; round-trips through
    :func:`predictor_decompress`.  Worst case (nothing guessed) costs
    1 flags byte per 8 input bytes (~12.5% expansion); repetitive
    input compresses toward 1/8 of its size."""
    guess = bytearray(_GUESS_SIZE)
    out = bytearray(1)  # slot for the first flags byte
    flags = 0
    bit = 1
    flags_at = 0
    h = 0
    for raw in data:
        c = raw ^ _PERTURB
        if guess[h] == c:
            flags |= bit
        else:
            guess[h] = c
            out.append(c)
        h = ((h << 7) ^ c) % _GUESS_SIZE
        bit <<= 1
        if bit == 256:
            out[flags_at] = flags
            flags = 0
            bit = 1
            flags_at = len(out)
            out.append(0)
    out[flags_at] = flags
    return bytes(out)


def predictor_decompress(data: bytes) -> bytes:
    """Inverse of :func:`predictor_compress`.  Raises ``ValueError``
    on truncated input (a flags bit demanding a literal byte past the
    end of the stream)."""
    if not data:
        raise ValueError("predictor stream must carry at least one flags byte")
    guess = bytearray(_GUESS_SIZE)
    out = bytearray()
    flags = data[0]
    i = 1
    j = 0
    h = 0
    n = len(data)
    while flags != 0 or i < n:
        if flags & 1:
            c = guess[h]
        else:
            if i >= n:
                raise ValueError("truncated predictor stream")
            c = data[i]
            guess[h] = c
            i += 1
        out.append(c ^ _PERTURB)
        h = ((h << 7) ^ c) % _GUESS_SIZE
        flags >>= 1
        j += 1
        if j == 8:
            # a well-formed stream always carries a flags byte at every
            # group boundary (the compressor appends one, possibly 0)
            if i >= n:
                raise ValueError("truncated predictor stream (missing flags byte)")
            j = 0
            flags = data[i]
            i += 1
    return bytes(out)
