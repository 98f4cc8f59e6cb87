"""Windowed aggregation over event streams (tumbling windows).

The reference has no streaming/window surface (SURVEY.md §2.8 —
"ingestion order is the only time"); this is a training-data-pipeline
extension: tumbling-window aggregates expressed as a pure batch
transform (window assignment) + groupby aggregate — no global sort, no
per-row Python."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def tumbling_window_agg(
    ds: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1h",
) -> ray.data.Dataset:
    """Count/sum/mean of ``value`` per (window_start, key).

    Window assignment is vectorized timestamp truncation inside
    map_batches; the only shuffle is the (tiny) groupby on
    (window_start, key)."""
    unit = {"1h": "hour", "1d": "day", "1m": "minute"}[window]

    def assign(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_col], unit=unit)
        return pa.table(
            {
                "window_start": w,
                key_col: batch[key_col],
                value_col: batch[value_col],
            }
        )

    from ray.data.aggregate import Count, Mean, Sum

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["window_start", key_col])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="avg_value"),
        )
    )
