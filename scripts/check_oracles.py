"""Local mirror of the driver's correctness gate: run every queries()
entry at a given sf_dir, run its oracle_sql() twin in DuckDB over the
same parquet tables, compare row-count + schema + order-insensitive
values.  Usage: python scripts/check_oracles.py [sf_dir] [only...]"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = e.queries()
    oracles = e.oracle_sql()
    if only:
        unknown = set(only) - set(qs)
        if unknown:
            # a typo'd name used to be silently skipped -> 'all passed'
            # with ZERO checks run
            print(f"FAIL  unknown query name(s): {sorted(unknown)}")
            sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL  {name}: engine error: {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"OK?   {name}: rows={len(mine)} ({dt:.1f}s) [rows-only, no oracle]")
            continue
        try:
            oracle = canon(con.sql(sql).df())
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        status = []
        if list(mine.columns) != list(oracle.columns):
            status.append(f"schema {list(mine.columns)} vs {list(oracle.columns)}")
        elif len(mine) != len(oracle):
            status.append(f"rows {len(mine)} vs {len(oracle)}")
        else:
            try:
                pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, atol=1e-9, rtol=0)
            except AssertionError as ex:
                status.append("values: " + str(ex).split("\n")[0])
                # show first few diffs
                for c in mine.columns:
                    if not (mine[c].values == oracle[c].values).all():
                        neq = np.flatnonzero(~(mine[c].astype(str).values == oracle[c].astype(str).values))[:3]
                        for i in neq:
                            status.append(f"  {c}[{i}]: {mine[c].iloc[i]!r} vs {oracle[c].iloc[i]!r}")
                        break
        if status:
            print(f"FAIL  {name}: {'; '.join(status[:5])}")
            failures.append(name)
        else:
            print(f"PASS  {name}: rows={len(mine)} ({dt:.1f}s)")
    print()
    if failures:
        print("FAILURES:", ", ".join(failures))
        sys.exit(1)
    print("all passed")


if __name__ == "__main__":
    main()
