"""Hypertable-style time rollups: bucketed aggregates that re-aggregate to
coarser resolutions without touching raw data (continuous-aggregate
pattern).

The partials kept per bucket are mergeable (count + decimal sums + min/max),
so daily = merge(hourly) is exact — the property the gate query
``hourly_to_daily_rollup`` verifies against a direct-from-raw oracle. At
100 TB this is the difference between scanning a trillion events and
scanning 24 rows per day per key; the streaming twin maintains the finest
bucket with a watermarked window (ext.streaming) and the coarser layers
roll up from it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = {"hour", "day", "week", "month"}


def rollup_time(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    unit: str = "hour",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Finest-grained rollup: per (time bucket, keys) mergeable partials."""
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}")
    keys = keys or []
    return events.groupBy(
        F.date_trunc(unit, F.col(ts_col)).alias("bucket_start"), *keys
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def merge_rollup(
    partials: DataFrame, *, unit: str, keys: list[str] | None = None
) -> DataFrame:
    """Re-aggregate a finer rollup into a coarser unit — exact, because
    every partial is mergeable (decimal sums are associative)."""
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}")
    keys = keys or []
    return partials.groupBy(
        F.date_trunc(unit, F.col("bucket_start")).alias("bucket_start"), *keys
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
