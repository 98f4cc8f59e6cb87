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
        # aggregate in EXACT integer cents: float partial-sum order
        # differs between engines/partitionings, and 2-decimal inputs
        # produce averages that sit exactly on rounding boundaries —
        # integer sums make the aggregate bit-reproducible.
        cents = pc.round(pc.multiply(pc.cast(batch[value_col], pa.float64()), 100.0))
        return pa.table(
            {
                "window_start": w,
                key_col: batch[key_col],
                "_cents": pc.cast(cents, pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Sum

    agg = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["window_start", key_col])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("_cents", alias_name="_sum_cents"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        cents = np.asarray(batch["_sum_cents"].to_numpy(zero_copy_only=False), dtype=np.int64)
        n = np.asarray(batch["n_events"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "window_start": batch["window_start"],
                key_col: batch[key_col],
                "n_events": batch["n_events"].cast(pa.int64()),
                "sum_value": pa.array(cents / 100.0, pa.float64()),
                "avg_value": pa.array(cents / (100.0 * n), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
