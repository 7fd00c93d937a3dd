"""Constraint-based data repair: enforce a functional dependency by
majority vote.

When the data SHOULD satisfy det_cols → dep_col (one region per user,
one date per order id) but ingestion noise broke it, the standard
repair picks each determinant group's majority value (count desc, then
value asc — a total tie-break, so the repair is deterministic and
SQL-replayable) and rewrites nulls and dissenting rows to it. This is
the minimal-change FD repair at the heart of HoloClean-style cleaners,
restricted to exact majority voting.

Scale shape: one (det, dep) hash aggregate → a winners table bounded by
the determinant domain (broadcast when small, shuffled equi-join
otherwise) → one projection. Nothing rescans the data.

The audit-not-silently-mutate contract of ops/quality.py carries over:
``was_filled`` / ``was_changed`` flags mark every repaired row, so the
repair's blast radius is measurable downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fd_winners(df: DataFrame, det_cols: list[str], dep_col: str) -> DataFrame:
    """(det_cols..., winner): each determinant group's majority non-null
    dependent value; ties broken by value ascending."""
    votes = (
        df.filter(F.col(dep_col).isNotNull())
        .groupBy(*det_cols, dep_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w = Window.partitionBy(*det_cols).orderBy(F.desc("_n"), F.asc(dep_col))
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*det_cols, F.col(dep_col).alias("winner"))
    )


def fd_repair(
    df: DataFrame,
    *,
    det_cols: list[str],
    dep_col: str,
    mode: str = "enforce",
    broadcast_winners: bool = True,
) -> DataFrame:
    """Repair ``dep_col`` toward det_cols → dep_col. ``mode='fill'``
    replaces only NULLs; ``mode='enforce'`` also overwrites dissenting
    values. Appends ``was_filled`` / ``was_changed`` audit flags. Groups
    with no non-null value at all keep their NULLs (no winner exists)."""
    if mode not in ("fill", "enforce"):
        raise ValueError(f"mode must be fill|enforce, got {mode}")
    winners = fd_winners(df, det_cols, dep_col)
    if broadcast_winners:
        winners = F.broadcast(winners)
    v = F.col(dep_col)
    filled = v.isNull() & F.col("winner").isNotNull()
    changed = (
        v.isNotNull() & F.col("winner").isNotNull() & (v != F.col("winner"))
        if mode == "enforce"
        else F.lit(False)
    )
    repaired = (
        F.when(filled | changed, F.col("winner")).otherwise(v)
    )
    return (
        df.join(winners, on=det_cols, how="left")
        .withColumn("was_filled", filled)
        .withColumn("was_changed", changed)
        .withColumn(dep_col, repaired)
        .drop("winner")
    )


def impute_group_median(
    df: DataFrame,
    *,
    value_col: str,
    by: list[str],
    flag_col: str | None = "imputed",
) -> DataFrame:
    """Fill NULLs in ``value_col`` with the exact per-group median
    (SQL ``percentile(0.5)`` — interpolating, matching DuckDB
    ``quantile_cont``, the equivalence the winsorize gate certifies).
    Groups with no non-NULL values keep their NULLs; ``flag_col``
    (optional) marks rows that were filled, preserving the audit trail
    the reference's cleaning ops keep for every mutation (SURVEY §2.9).

    One grouped percentile aggregate (output rows = #groups, tiny) and
    one broadcast join back — the stats-table pattern shared with
    ops/outliers.winsorize. Exact percentile needs the group's values
    in one task; at extreme group cardinality swap in approx_percentile
    (same plan shape, sketch-mergeable).
    """
    med = df.groupBy(*by).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("_med")
    )
    v = F.col(value_col)
    filled = v.isNull() & F.col("_med").isNotNull()
    out = df.join(F.broadcast(med), on=by, how="left")
    if flag_col:
        # the flag must be materialized BEFORE value_col is overwritten —
        # afterwards the predicate would see the filled values
        out = out.withColumn(flag_col, filled)
    out = out.withColumn(value_col, F.when(filled, F.col("_med")).otherwise(v))
    return out.drop("_med")
