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
from pyspark.sql.window import Window


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


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: each user joins the cohort of their
    first-activity week; for every (cohort_week, offset_weeks) cell,
    how many distinct cohort members were active that many weeks later,
    and what fraction of the cohort that is.

    Spark shape: the raw stream collapses to distinct (user, week)
    pairs FIRST (one shuffle — this is what bounds celebrity users:
    thousands of events become ≤ one row per week), then first-seen is
    a groupBy on the user key, the cohort label joins back on that same
    key (co-partitioned, no extra exchange in practice), and the matrix
    is one count aggregate. Cohort sizes are the offset-0 column —
    derived by a broadcast self-join of the (small) matrix, never a
    rescan of the stream. The matrix is |weeks|² rows at most:
    driver-safe to render, oracle-safe to hash.

    Weeks are ISO ``date_trunc('week')`` Mondays in both engines;
    ``offset_weeks`` is exact integer arithmetic on day differences.
    """
    week = F.date_trunc("week", F.col(ts_col))
    acts = (
        events.filter(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("_u"), week.alias("_w"))
        .distinct()
    )
    first = acts.groupBy("_u").agg(F.min("_w").alias("_cohort"))
    mat = (
        acts.join(first, "_u")
        .groupBy(
            F.col("_cohort").alias("cohort_week"),
            (F.datediff(F.col("_w"), F.col("_cohort")) / period_days)
            .cast("int")
            .alias("offset_weeks"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = mat.filter(F.col("offset_weeks") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return (
        mat.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "offset_weeks",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )


def last_touch_attribution(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tie_break: str | None = None,
    is_conversion=None,
    is_touch=None,
    channel_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Last-touch attribution: each conversion event is credited to the
    channel of the user's most recent STRICTLY PRIOR touch event
    (conversions with no prior touch attribute to NULL — report them,
    don't drop them).

    Spark shape: the classic as-of-join problem, solved the
    union+window way (same trade as ops/asof.py — no join explosion,
    no per-conversion probe): one ordered window per user carries the
    last touch channel forward with ``last(..., ignorenulls=True)``
    over an UNBOUNDED-PRECEDING-to-1-PRECEDING frame, so a conversion
    never attributes to itself or to later touches. One shuffle on the
    user key, bounded state per user.

    ``is_conversion`` / ``is_touch`` are Column predicates (required);
    ``tie_break`` orders equal timestamps deterministically.

    Returns the conversion rows with an ``attributed_channel`` column.
    """
    if is_conversion is None or is_touch is None:
        raise ValueError("is_conversion and is_touch predicates are required")
    order = [F.col(ts_col)] + ([F.col(tie_break)] if tie_break else [])
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = events.withColumn(
        "attributed_channel",
        F.last(
            F.when(is_touch, F.col(channel_col)), ignorenulls=True
        ).over(w),
    )
    return tagged.filter(is_conversion).select(
        F.col(user_col),
        F.col(ts_col),
        F.col(value_col),
        "attributed_channel",
    )
