"""Feature normalization — the ML-prep step before training or
similarity search: z-score, min-max, and robust (median/IQR) scaling,
optionally within groups.

Spark-first shape: statistics are ONE hash aggregation per group (never a
window over the fact rows — a global window would single-partition the
corpus), broadcast back onto the rows as a tiny stats table. Means are
exact decimal-sum ÷ count (associative, engine-portable); stddev/quantile
ride the engines' native implementations and downstream consumers round
presentation values (the repo-wide policy proven by the percentile gate).
Degenerate spans (constant column, single row) normalize to NULL rather
than ±inf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METHODS = ("zscore", "minmax", "robust")


def _stats(df: DataFrame, col: str, group_by: list[str]) -> DataFrame:
    dec = F.col(col).cast("decimal(28,6)")
    aggs = [
        (F.sum(dec).cast("double") / F.count(F.col(col))).alias("_mean"),
        F.stddev_samp(F.col(col)).alias("_std"),
        F.min(F.col(col)).alias("_min"),
        F.max(F.col(col)).alias("_max"),
        F.percentile(F.col(col), F.lit(0.25)).alias("_p25"),
        F.percentile(F.col(col), F.lit(0.5)).alias("_p50"),
        F.percentile(F.col(col), F.lit(0.75)).alias("_p75"),
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def normalize(
    df: DataFrame,
    col: str,
    *,
    method: str = "zscore",
    group_by: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Append ``out_col`` (default ``{col}_norm``) with the scaled value."""
    if method not in METHODS:
        raise ValueError(f"method must be one of {METHODS}, got {method!r}")
    group_by = group_by or []
    out_col = out_col or f"{col}_norm"
    stats = _stats(df, col, group_by)
    joined = (
        df.join(F.broadcast(stats), on=group_by) if group_by else df.crossJoin(F.broadcast(stats))
    )
    x = F.col(col)
    if method == "zscore":
        denom = F.when(F.col("_std") > 0, F.col("_std"))
        scaled = (x - F.col("_mean")) / denom
    elif method == "minmax":
        span = F.col("_max") - F.col("_min")
        scaled = (x - F.col("_min")) / F.when(span > 0, span)
    else:  # robust
        iqr = F.col("_p75") - F.col("_p25")
        scaled = (x - F.col("_p50")) / F.when(iqr > 0, iqr)
    return joined.withColumn(out_col, scaled).drop(
        "_mean", "_std", "_min", "_max", "_p25", "_p50", "_p75"
    )


def quantile_bin(
    df: DataFrame,
    col: str,
    n_bins: int,
    *,
    id_col: str,
    group_by: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Equi-depth binning: bucket index in [0, n_bins) with (almost)
    equal row counts per bucket.

    Rank-based, not boundary-based: bucket = floor((rank-1)·n/N) over the
    (value, id) order — totally deterministic even with heavy ties,
    whereas interpolated quantile boundaries put tied values on an
    engine-dependent side of the cut. One sort per group (window on the
    group key); NULL values get NULL buckets. ``id_col`` breaks ties so
    reruns and engines agree row-for-row.
    """
    from pyspark.sql import Window

    group_by = group_by or []
    out_col = out_col or f"{col}_bin"
    # NULLS LAST explicitly: Spark defaults nulls-first ascending, other
    # engines (and the oracles) default nulls-last — with nulls at the end
    # the non-null rows occupy ranks 1..N and the math below agrees
    w = Window.partitionBy(*group_by).orderBy(
        F.col(col).asc_nulls_last(), F.col(id_col)
    )
    wg = Window.partitionBy(*group_by)
    # integer division, not floor(float): exact for any N, and every
    # engine's int-div agrees where float rounding might not
    out = (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_nn", F.count(F.col(col)).over(wg))
        .withColumn(
            out_col,
            F.when(
                F.col(col).isNotNull(),
                F.expr(f"(( _rk - 1 ) * {int(n_bins)}) div _nn").cast("int"),
            ),
        )
        .drop("_rk", "_nn")
    )
    return out
