"""Ordered funnel analysis over an event stream.

"Of the users who did A, how many then did B, then C — and how fast?"
Each step must happen at-or-after the user's FIRST qualifying time for
the previous step (the standard first-touch funnel; re-entries don't
restart it), optionally within a global time window of step 1.

Spark shape: one filtered aggregation per step — min(ts) per user for
step 1, then for each later step an inner join to the previous step's
(user, t_prev) frame and a conditional min. All shuffles key on the
user column; each step's frame is one row per surviving user, so the
joins shrink monotonically. No windows over the raw stream, no
event-order state — at 100 TB this is k small hash joins, each
broadcastable once the funnel narrows.

An events table with per-user event counts in the thousands stays
skew-free (the aggregate collapses to one row per user BEFORE any
join). A celebrity-user skew problem lives in the first groupBy, which
AQE/salting already cover (ops/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-step funnel: step index/name, users reaching it, conversion
    from the previous step (6-dp), and mean seconds from step 1 (exact
    decimal sum over epoch seconds, 2-dp).

    ``within_seconds`` bounds the WHOLE funnel relative to each user's
    step-1 time (a "converted within 7 days" funnel).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        if prev is None:
            cur = ev.groupBy("_u").agg(F.min("_ts").alias("_t"))
            cur = cur.withColumn("_t0", F.col("_t"))
        else:
            cur = (
                ev.join(prev.select("_u", "_t", "_t0"), "_u")
                .filter(F.col("_ts") >= F.col("_t"))
                .groupBy("_u")
                .agg(
                    F.min("_ts").alias("_new_t"),
                    F.first("_t0").alias("_t0"),
                )
                .withColumnRenamed("_new_t", "_t")
            )
            if within_seconds is not None:
                cur = cur.filter(
                    F.unix_timestamp("_t") - F.unix_timestamp("_t0")
                    <= within_seconds
                )
        reached.append(cur.select("_u", "_t", "_t0"))
        prev = reached[-1]

    stats = []
    for i, (step, frame) in enumerate(zip(steps, reached)):
        delay = F.unix_timestamp("_t") - F.unix_timestamp("_t0")
        stats.append(
            frame.agg(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("event_type"),
                F.count(F.lit(1)).alias("n_users"),
                F.round(
                    F.sum(delay.cast("decimal(18,0)")).cast("double")
                    / F.count(F.lit(1)),
                    2,
                ).alias("mean_secs_from_start"),
            )
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    # conversion from the previous step: a size-k self-join on step index
    prev_counts = out.select(
        (F.col("step") + 1).alias("step"), F.col("n_users").alias("_prev_n")
    )
    return (
        out.join(prev_counts, "step", "left")
        .select(
            "step",
            "event_type",
            "n_users",
            F.when(
                F.col("_prev_n").isNotNull() & (F.col("_prev_n") > 0),
                F.round(F.col("n_users") / F.col("_prev_n"), 6),
            ).alias("conversion"),
            "mean_secs_from_start",
        )
        .orderBy("step")
    )
