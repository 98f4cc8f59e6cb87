"""Shared helpers for the training-data operators.

``round6`` exists because DuckDB ``round`` is half-away-from-zero while
numpy rounds half-to-even; both engines use the identical
``floor(x*1e6 + 0.5)/1e6`` so float outputs value-hash equal in the
driver's oracle comparison.
"""

from __future__ import annotations

import hashlib

import numpy as np

ROUND6_SQL = "floor(({expr}) * 1000000 + 0.5) / 1000000"


def round6(x: np.ndarray | float):
    return np.floor(np.multiply(x, 1e6) + 0.5) / 1e6


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def md5_u64(s: str) -> int:
    """First 64 bits of md5 as unsigned int — matches DuckDB
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT``."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)
