"""Time-series resampling, gap-filling, and interpolation.

The hypertable-rollup family (analytics/rollup.py) aggregates time DOWN;
this module goes the other way: regularize an irregular event stream onto
a fixed grid — the time_bucket_gapfill / locf / interpolate operators a
timescale-style user expects, expressed as DataFrame ops.

Scale shape: one shuffle to aggregate per (key, bucket); the dense grid is
GENERATED per key with ``sequence`` + ``explode`` (never a driver-side
range or a cross join against a calendar table — the grid never exists on
the driver); filling is two ordered windows per key. Grid cardinality is
(span / step) per key — the caller picks ``step_seconds`` so that stays
bounded, exactly as with any gap-fill engine.

Bucket representation is an int64 bucket INDEX (epoch-micros div step), not
a timestamp: integer arithmetic is engine-portable (the oracle replays it
exactly), avoids DST/timezone edge cases, and the linear-interpolation
fraction (bucket - prev) / (next - prev) is exact in doubles. Convert back
with :func:`bucket_ts` at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def resample(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    key_cols: list[str],
    step_seconds: int,
    agg: str = "avg",
) -> DataFrame:
    """Aggregate an event stream to (keys, bucket) — one hash-agg shuffle.

    ``avg``/``sum`` go through exact decimal sums (associative — immune to
    partial-aggregation order) so results are reproducible bit-for-bit
    across partitionings and engines; the final double division of avg is
    a single IEEE op.
    """
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be positive, got {step_seconds}")
    bucket = F.floor(
        F.unix_micros(F.col(ts_col)) / F.lit(step_seconds * _US)
    ).cast("long")
    v = F.col(value_col)
    aggs = {
        "avg": (F.sum(v.cast("decimal(28,6)")) / F.count(v)).cast("double"),
        "sum": F.sum(v.cast("decimal(28,6)")).cast("double"),
        "min": F.min(v),
        "max": F.max(v),
        "count": F.count(v),
    }
    if agg not in aggs:
        raise ValueError(f"unknown agg {agg!r}; choose from {sorted(aggs)}")
    return df.groupBy(*key_cols, bucket.alias("bucket")).agg(
        aggs[agg].alias("value"), F.count(v).alias("n_obs")
    )


def gapfill(
    bucketed: DataFrame,
    *,
    key_cols: list[str],
    bucket_col: str = "bucket",
    value_col: str = "value",
    method: str = "linear",
) -> DataFrame:
    """Densify each key's [min, max] bucket range and fill the gaps.

    Methods: ``none`` (gap rows appear with NULL), ``locf`` (last
    observation carried forward; leading gaps stay NULL), ``linear``
    (interpolate between the neighboring observations; leading/trailing
    gaps stay NULL — they have no second endpoint).

    Output: keys, bucket, value, is_gap. ``is_gap`` marks generated rows
    so a quality gate can bound the imputation ratio.
    """
    if method not in ("none", "locf", "linear"):
        raise ValueError(f"unknown method {method!r}")
    b, v = F.col(bucket_col), F.col(value_col)
    grid = (
        bucketed.groupBy(*key_cols)
        .agg(F.min(b).alias("_lo"), F.max(b).alias("_hi"))
        .select(
            *key_cols,
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(bucket_col),
        )
    )
    joined = grid.join(
        bucketed.select(*key_cols, bucket_col, value_col),
        [*key_cols, bucket_col],
        "left",
    ).withColumn("is_gap", v.isNull())
    if method == "none":
        return joined
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy(b)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if method == "locf":
        return joined.withColumn(
            value_col, F.last(v, ignorenulls=True).over(w_prev)
        )
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy(b)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # carry (bucket, value) as ONE struct per direction so the endpoint's
    # position and value always come from the same observation row
    obs = F.when(v.isNotNull(), F.struct(b.alias("b"), v.alias("v")))
    prev = F.last(obs, ignorenulls=True).over(w_prev)
    nxt = F.first(obs, ignorenulls=True).over(w_next)
    frac = (b - prev["b"]).cast("double") / (nxt["b"] - prev["b"]).cast("double")
    interp = prev["v"] + (nxt["v"] - prev["v"]) * frac
    return joined.withColumn(
        value_col, F.when(v.isNotNull(), v).otherwise(interp)
    )


def bucket_ts(bucket_col: str, step_seconds: int):
    """Bucket index → timestamp of the bucket's start."""
    return F.timestamp_seconds(F.col(bucket_col) * step_seconds)


def rolling_aggregate(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    decimal_scale: int = 6,
) -> DataFrame:
    """Per-key trailing-window aggregates: for every event, the
    count/sum/min/max/avg of ``value_col`` over [ts - window, ts].

    One shuffle on the key; within each key Spark sorts once and slides a
    RANGE frame over epoch seconds — no self-join, no per-row subquery
    (the naive theta-join formulation is O(n·w) pairs and a skew bomb at
    100 TB). The sum is decimal-cast so frame accumulation order cannot
    shift results (same policy as the aggregate gates); avg derives from
    that exact sum.
    """
    epoch = F.unix_timestamp(F.col(ts_col)).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(epoch)
        .rangeBetween(-window_seconds, 0)
    )
    dec = F.col(value_col).cast(f"decimal(28,{decimal_scale})")
    return df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col),
        F.count(F.lit(1)).over(w).alias("w_count"),
        F.sum(dec).over(w).alias("w_sum"),
        F.min(F.col(value_col)).over(w).alias("w_min"),
        F.max(F.col(value_col)).over(w).alias("w_max"),
        (F.sum(dec).over(w) / F.count(F.lit(1)).over(w))
        .cast("double")
        .alias("w_avg"),
    )


def sessionize(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    order_cols: list[str] | None = None,
    gap_seconds: int = 1800,
    out_col: str = "session_id",
) -> DataFrame:
    """Append a 1-based per-user ``out_col``: a new session starts at the
    first event and whenever the gap since the previous event exceeds
    ``gap_seconds`` — the batch counterpart of the streaming session
    windows in ext/streaming.py.

    One shuffle on the user key; the boundary flag (lag) and the running
    session index (cumulative sum of flags) share the same ordered
    window frame, so no second exchange. Pass ``order_cols`` with a
    unique tie-breaker for a deterministic result under ts ties.
    Second-resolution integer gap arithmetic (unix_timestamp ==
    floor(epoch)) keeps the boundary decision engine-portable.
    """
    order = [F.col(ts_col), *[F.col(c) for c in (order_cols or [])]]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull()
        | (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
            > gap_seconds
        ),
        1,
    ).otherwise(0)
    sid = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, sid.cast("long"))


def ewma(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    max_lags: int = 8,
    tie_break: str | None = None,
    out_col: str = "ewma",
    round_to: int = 9,
) -> DataFrame:
    """Per-key exponentially weighted moving average with a bounded lag
    horizon: for each event,

        ewma_t = Σ_{j<K} (1−α)^j · x_{t−j}  /  Σ_{j<K} (1−α)^j

    over the up-to-``max_lags`` most recent values (missing lags at the
    series head drop out of BOTH sums — pandas ``ewm(adjust=True)``
    semantics, truncated). Truncation bounds the state: beyond K lags the
    weight is (1−α)^K (<0.4% for the defaults), and the whole computation
    is ONE ordered window per key — K ``lag()`` expressions sharing a
    single window node, pure codegen arithmetic after the key shuffle. No
    recursive/iterative pass, so it composes with any pipeline stage.

    Weights are embedded as Python-computed double literals and the
    numerator/denominator fold left-to-right in lag order, so an
    independent engine replays the exact IEEE value.

    ``tie_break``: extra ordering column for deterministic results when
    ``ts_col`` has duplicates per key (pass the event id).
    """
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    order = [F.col(ts_col)] + ([F.col(tie_break)] if tie_break else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(max_lags):
        weight = (1.0 - alpha) ** j
        x_j = F.lag(F.col(value_col), j).over(w)
        num = num + F.when(x_j.isNotNull(), x_j * F.lit(weight)).otherwise(
            F.lit(0.0)
        )
        den = den + F.when(x_j.isNotNull(), F.lit(weight)).otherwise(F.lit(0.0))
    return df.withColumn(
        out_col,
        F.when(den > 0, F.round(num / den, round_to)),
    )


def rolling_corr(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    window_rows: int = 10,
    tie_break: str | None = None,
    decimal_scale: int = 6,
    round_to: int = 6,
    out_col: str = "corr",
) -> DataFrame:
    """Per-key rolling Pearson correlation of (x, y) over the trailing
    ``window_rows`` rows, via the computational formula

        r = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²) · (nΣy² − (Σy)²))

    with every frame sum decimal-cast (per-row products rounded at
    ``decimal_scale`` first) — so unlike the built-in ``corr`` window
    aggregate, the result is independent of accumulation order and
    replays exactly in any engine. NULL when the frame has fewer than 2
    rows or either variance is zero. Rows where x or y is NULL are
    excluded from the frame sums but still receive a value (their
    nulls simply don't contribute — both sums skip them consistently).

    One ordered window per key — six shared-frame sum aggregates in a
    single window node, pure codegen.

    Numerical caveat: the computational formula cancels catastrophically
    when |x| or |y| dwarfs its in-frame variance (e.g. raw epoch seconds
    — Σy² ≈ 1e19 loses the variance below double precision, and round()
    itself diverges across engines at that magnitude). CENTER such
    columns first (subtract a constant base); with magnitudes ≲1e6 every
    intermediate stays exact.
    """
    order = [F.col(ts_col)] + ([F.col(tie_break)] if tie_break else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(window_rows - 1), 0)
    )
    dec = f"decimal(28,{decimal_scale})"
    x, y = F.col(x_col), F.col(y_col)
    both = x.isNotNull() & y.isNotNull()
    xd = F.when(both, F.round(x, decimal_scale)).cast(dec)
    yd = F.when(both, F.round(y, decimal_scale)).cast(dec)
    xyd = F.when(both, F.round(x * y, decimal_scale)).cast(dec)
    xxd = F.when(both, F.round(x * x, decimal_scale)).cast(dec)
    yyd = F.when(both, F.round(y * y, decimal_scale)).cast(dec)
    n = F.sum(both.cast("long")).over(w).cast("double")
    sx = F.sum(xd).over(w).cast("double")
    sy = F.sum(yd).over(w).cast("double")
    sxy = F.sum(xyd).over(w).cast("double")
    sxx = F.sum(xxd).over(w).cast("double")
    syy = F.sum(yyd).over(w).cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return df.withColumn(
        out_col,
        F.when((n >= 2) & (den > 0), F.round(num / den, round_to)),
    )


def trend_slope(
    df: DataFrame,
    *,
    key_col: str,
    x_col: str,
    y_col: str,
    decimal_scale: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Per-key OLS trend slope of y over x:

        slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)

    from ONE hash aggregate of decimal-cast sums (per-row products
    rounded first — the rolling_corr policy applied group-wise), so the
    slope is accumulation-order-independent and replays exactly in any
    engine. NULL when the key has <2 usable points or zero x-variance.
    Rows with NULL x or y drop out of all sums consistently. Output:
    (key, n, slope). Same centering caveat as rolling_corr: center
    large-magnitude x (e.g. epoch seconds) before calling.
    """
    dec = f"decimal(28,{decimal_scale})"
    x, y = F.col(x_col), F.col(y_col)
    both = x.isNotNull() & y.isNotNull()
    xr = F.when(both, F.round(x, decimal_scale))
    agg = df.groupBy(key_col).agg(
        F.min(xr).alias("_xmin"),
        F.max(xr).alias("_xmax"),
        F.sum(both.cast("long")).alias("_n"),
        F.sum(xr.cast(dec)).cast("double").alias("_sx"),
        F.sum(F.when(both, F.round(y, decimal_scale)).cast(dec))
        .cast("double")
        .alias("_sy"),
        F.sum(F.when(both, F.round(x * y, decimal_scale)).cast(dec))
        .cast("double")
        .alias("_sxy"),
        F.sum(F.when(both, F.round(x * x, decimal_scale)).cast(dec))
        .cast("double")
        .alias("_sxx"),
    )
    n = F.col("_n").cast("double")
    den = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / den
    # Two guards, both needed:
    # 1. exact zero-variance: min/max of the ROUNDED x (a key whose x
    #    values all agree at decimal_scale reports NULL — a plain
    #    den > 0 would mistake rounding residue for variance);
    # 2. residue bound: per-row rounding perturbs den by at most
    #    ~2·10^-scale·n·|Σx| (the Σx² cross term dominates), so a den
    #    below that bound is noise, not signal — this is what makes
    #    the docstring's centering advice quantitative: large |x̄|
    #    inflates the bound until genuine small variances drown.
    residue_bound = (
        F.lit(2.0 * 10.0 ** (-decimal_scale)) * n * F.abs(F.col("_sx"))
    )
    ok = (
        (F.col("_n") >= 2)
        & (F.col("_xmin") < F.col("_xmax"))
        & (den > residue_bound)
    )
    return agg.select(
        F.col(key_col),
        F.col("_n").alias("n"),
        F.when(ok, F.round(slope, round_to)).alias("slope"),
    )
