"""Robust (median/MAD) outlier detection per group.

The quality pipelines null out values by fixed plausibility bounds
(ops/units.py, reference etl.py:269-283); this is the data-driven
complement: flag values far from their group's median in MAD units — the
standard robust z-score (Iglewicz–Hoaglin), insensitive to the outliers
it is hunting, unlike mean/stddev.

Scale shape: two grouped EXACT percentile aggregations (median of x, then
median of |x − median|) + two joins of the per-group stats back onto the
rows. Exact percentiles shuffle each group's values to one aggregation
buffer — correct but memory-bound at extreme group sizes; for 100 TB hot
paths swap ``exact=False`` to use ``approx_percentile`` (t-digest-style
sketch, mergeable map-side, bounded memory) at the cost of oracle
exactness. The stats frames are one row per group — broadcast when the
group count is bounded (the default here), hash-join otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scale factor making MAD a consistent sigma estimator under normality
MAD_CONSISTENCY = 1.4826


def _join_nullsafe(
    left: DataFrame, right: DataFrame, by: list[str], keep: list[str]
) -> DataFrame:
    """left ⟕ right on null-SAFE key equality, keeping left.* + ``keep``
    from right. groupBy treats NULL as a real group; a plain equi-join
    would silently drop every NULL-keyed row from an annotation pass."""
    from functools import reduce

    l, r = left.alias("_l"), right.alias("_r")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"_l.{c}").eqNullSafe(F.col(f"_r.{c}")) for c in by],
    )
    return l.join(r, cond, "left").select(
        "_l.*", *[F.col(f"_r.{c}") for c in keep]
    )


def group_robust_stats(
    df: DataFrame,
    *,
    value_col: str,
    by: list[str],
    exact: bool = True,
    broadcast_stats: bool = True,
) -> DataFrame:
    """(by…, n, median, mad): one row per group."""
    v = F.col(value_col).cast("double")
    pct = F.percentile if exact else (
        lambda c, p: F.approx_percentile(c, F.lit(p), F.lit(10_000))
    )
    med = df.groupBy(*by).agg(
        F.count(v).alias("n"), pct(v, 0.5).alias("median")
    )
    med_b = F.broadcast(med) if broadcast_stats else med
    dev = _join_nullsafe(df.select(*by, v.alias("_v")), med_b, by, ["median"]).select(
        *by, F.abs(F.col("_v") - F.col("median")).alias("_adev")
    )
    mad = dev.groupBy(*by).agg(pct(F.col("_adev"), 0.5).alias("mad"))
    out = _join_nullsafe(med, mad, by, ["mad"])
    return F.broadcast(out) if broadcast_stats else out


def flag_outliers(
    df: DataFrame,
    *,
    value_col: str,
    by: list[str],
    k: float = 3.5,
    exact: bool = True,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Rows + (robust_z, is_outlier).

    robust_z = (x − median) / (MAD_CONSISTENCY × mad); NULL when the
    group's MAD is 0 (a constant-majority group: every deviation is
    either 0 or infinitely surprising — the caller decides, we don't
    fabricate a verdict) or when x is NULL. is_outlier = |robust_z| > k.
    """
    stats = group_robust_stats(
        df, value_col=value_col, by=by, exact=exact,
        broadcast_stats=broadcast_stats,
    )
    v = F.col(value_col).cast("double")
    z = F.when(
        (F.col("mad") > 0) & v.isNotNull(),
        (v - F.col("median")) / (F.lit(MAD_CONSISTENCY) * F.col("mad")),
    )
    return (
        _join_nullsafe(df, stats, by, ["median", "mad"])
        .withColumn("robust_z", z)
        .withColumn(
            "is_outlier",
            F.when(F.col("robust_z").isNotNull(), F.abs(F.col("robust_z")) > k),
        )
        .drop("median", "mad")
    )


def winsorize(
    df: DataFrame,
    *,
    value_col: str,
    by: list[str],
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    out_col: str | None = None,
    exact: bool = True,
    broadcast_stats: bool = True,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lower_q, upper_q] exact (or
    approx) percentiles — the standard heavy-tail taming before
    mean-based statistics, complementing flag_outliers (which marks,
    never mutates). One grouped percentile aggregation + one stats join;
    same exact-vs-approx and broadcast trade-offs as
    group_robust_stats. NULLs pass through untouched."""
    v = F.col(value_col).cast("double")
    pct = F.percentile if exact else (
        lambda c, p: F.approx_percentile(c, F.lit(p), F.lit(10_000))
    )
    bounds = df.groupBy(*by).agg(
        pct(v, lower_q).alias("_lo"), pct(v, upper_q).alias("_hi")
    )
    bounds_b = F.broadcast(bounds) if broadcast_stats else bounds
    out = out_col or f"{value_col}_winsorized"
    return (
        _join_nullsafe(df, bounds_b, by, ["_lo", "_hi"])
        .withColumn(
            out,
            # greatest/least SKIP nulls — a bare clip would turn NULL
            # into the lower bound; gate explicitly
            F.when(
                v.isNotNull(),
                F.least(F.greatest(v, F.col("_lo")), F.col("_hi")),
            ),
        )
        .drop("_lo", "_hi")
    )


def iqr_outliers(
    df: DataFrame,
    *,
    value_col: str,
    by: list[str],
    k: float = 1.5,
    round_to: int = 4,
) -> DataFrame:
    """Tukey's fences per group: rows outside [Q1 − k·IQR, Q3 + k·IQR]
    counted as outliers (the boxplot rule — the rank-based complement
    of the median/MAD detector above: IQR fences are the convention
    dashboards draw, MAD is the robust-statistics choice).

    One grouped exact-percentile aggregate (#groups rows), one
    broadcast fence join, one counting aggregate — the winsorize plan
    shape. Exact interpolating percentiles ≡ DuckDB quantile_cont (the
    equivalence the winsorize gate certifies). NULL values are neither
    trials nor outliers. Returns per-group (q1, q3, lo, hi,
    n_rows, n_outliers).
    """
    v = F.col(value_col)
    fences = df.groupBy(*by).agg(
        F.percentile(v, F.lit(0.25)).alias("q1"),
        F.percentile(v, F.lit(0.75)).alias("q3"),
    )
    lo = F.col("q1") - F.lit(k) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(k) * (F.col("q3") - F.col("q1"))
    fences = fences.select(*by, "q1", "q3", lo.alias("lo"), hi.alias("hi"))
    # null-safe fence join: a NULL group key is still a group (plain
    # equi-join would silently drop it, outliers and all) — same helper
    # winsorize uses
    joined = _join_nullsafe(
        df, F.broadcast(fences), by, ["q1", "q3", "lo", "hi"]
    )
    out = (v < F.col("lo")) | (v > F.col("hi"))
    return (
        joined.groupBy(*by)
        .agg(
            F.round(F.first("q1"), round_to).alias("q1"),
            F.round(F.first("q3"), round_to).alias("q3"),
            F.round(F.first("lo"), round_to).alias("lo"),
            F.round(F.first("hi"), round_to).alias("hi"),
            F.sum(v.isNotNull().cast("long")).alias("n_rows"),
            F.sum(F.when(v.isNotNull() & out, 1).otherwise(0)).alias(
                "n_outliers"
            ),
        )
    )
