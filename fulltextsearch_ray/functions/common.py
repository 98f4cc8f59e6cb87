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


_DUCK = None


def md5_u64_batch(strings) -> np.ndarray:
    """Vectorized md5→uint64 over an Arrow string array.

    Uses an in-process DuckDB connection (C++ md5, no per-string Python
    call) — bit-identical to :func:`md5_u64` and to the SQL oracles'
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT``.  The connection is
    created once per worker process (map_batches actor or task).
    """
    import pyarrow as pa

    tbl = pa.table({"s": strings})
    out = _duck().execute(
        "SELECT ('0x' || substr(md5(s), 1, 16))::UBIGINT AS h FROM tbl"
    ).arrow()
    return np.asarray(out["h"].to_numpy(zero_copy_only=False), dtype=np.uint64)


def _duck():
    """Per-process DuckDB connection pinned to ONE thread — stage
    parallelism comes from Ray tasks; an all-cores DuckDB pool inside
    every worker would oversubscribe the box."""
    global _DUCK
    if _DUCK is None:
        import duckdb

        _DUCK = duckdb.connect()
        _DUCK.execute("SET threads TO 1")
    return _DUCK


def default_partitions(scale: int = 2, cap: int = 64) -> int:
    """Hash-partition count for partitioned group stages: tracks the
    cluster CPU count (× scale, capped).  At real cluster scale pass an
    explicit count sized so one partition fits a task's memory."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus * scale))


def md5_hex_batch(strings) -> "pa.Array":
    """Vectorized md5 hex digest over an Arrow string array (DuckDB)."""
    import pyarrow as pa

    tbl = pa.table({"s": strings})
    return _duck().execute("SELECT md5(s) AS h FROM tbl").arrow()["h"].combine_chunks()
