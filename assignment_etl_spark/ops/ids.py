"""Scalable global sequence assignment: row_number over a total order
WITHOUT the single-partition window.

``row_number().over(Window.orderBy(...))`` funnels the entire table
through one task — the classic 100 TB killer. The scalable shape is the
two-phase offset pattern:

1. range-partition on the ordering key (partition i holds keys strictly
   below partition i+1),
2. count rows per partition — a tiny (#partitions)-row table whose
   running sum gives each partition's global offset (the only
   single-partition window runs over THAT table, not the data),
3. number rows within each partition in parallel and add the offset.

The result equals the global row_number for any TOTAL ordering (pass a
tie-breaking key — with duplicate keys the split of ties across range
boundaries would otherwise be partitioning-dependent). The per-partition
counts and the numbering reuse the same range exchange, so the data
shuffles once.

Reference parity note: the reference's pandas ``reset_index`` /
``RangeIndex`` is implicit global numbering on one machine
(etl.py's dedup bookkeeping); this is its distributed equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame,
    order_by: list,
    *,
    num_partitions: int | None = None,
    out_col: str = "row_num",
    start: int = 1,
) -> DataFrame:
    """Append ``out_col``: 1-based (or ``start``-based) global sequence
    in ``order_by`` order. ``order_by`` must be a total order (include a
    unique tie-breaker) for a deterministic result. Entries may be
    column names or sort-order Columns (``F.desc("score")``) — the same
    expressions drive both the range exchange and the in-partition
    numbering, so descending orders work unchanged."""
    parts = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    with_pid = parts.withColumn("_pid", F.spark_partition_id())
    counts = with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    # running offset over the tiny per-partition count table — the ONLY
    # single-partition window here runs over #partitions rows, never the
    # data (tools/plan_audit.py's global-window rule certifies the
    # aggregate-collapsed input; Spark still logs its no-partition
    # warning for ANY empty partition spec, bounded or not)
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_offset")
    )
    local_w = Window.partitionBy("_pid").orderBy(*order_by)
    return (
        with_pid.withColumn("_local", F.row_number().over(local_w))
        .join(F.broadcast(offsets), on="_pid")
        .withColumn(
            out_col, (F.col("_offset") + F.col("_local") + F.lit(start - 1)).cast("long")
        )
        .drop("_pid", "_local", "_offset")
    )


def global_ntile(
    df: DataFrame,
    order_by: list,
    n_tiles: int,
    *,
    num_partitions: int | None = None,
    out_col: str = "tile",
) -> DataFrame:
    """Append ``out_col``: F.ntile(n_tiles)-identical tile assignment in
    ``order_by`` order WITHOUT the single-partition window. Rank comes
    from :func:`global_row_number`; the tile is ntile's closed form off
    the 1-row total: with base = N div n and extra = N mod n, the first
    ``extra`` tiles hold base+1 rows. Identical to F.ntile over the
    same total order (pinned bit-for-bit in tests, uneven splits and
    N < n_tiles included). ``order_by`` must be a total order."""
    if n_tiles < 1:
        raise ValueError(f"need n_tiles >= 1, got {n_tiles}")
    ranked = global_row_number(
        df, order_by, num_partitions=num_partitions, out_col="_gnt_rk"
    )
    tot = ranked.agg(F.count(F.lit(1)).alias("_gnt_n"))
    out = ranked.crossJoin(F.broadcast(tot))
    rk, n_rows = F.col("_gnt_rk"), F.col("_gnt_n")
    base = F.floor(n_rows / n_tiles)
    extra = n_rows % n_tiles
    big = extra * (base + 1)
    tile = (
        F.when(rk <= big, F.ceil(rk / (base + 1)))
        # base > 0 whenever this branch is reachable (rk > big implies
        # N > extra, i.e. N >= n_tiles)
        .otherwise(extra + F.ceil((rk - big) / base))
        .cast("int")
    )
    return out.withColumn(out_col, tile).drop("_gnt_rk", "_gnt_n")


def global_cumsum(
    df: DataFrame,
    order_by: list,
    value_col: str,
    *,
    num_partitions: int | None = None,
    out_col: str = "cum_sum",
    row_num_col: str | None = None,
) -> DataFrame:
    """Append ``out_col``: the inclusive running sum of ``value_col`` in
    ``order_by`` order, via the same two-phase range-exchange pattern as
    :func:`global_row_number` — per-partition totals give each partition
    a starting offset (the only single-partition window runs over the
    #partitions-row totals table), local cumulative windows run in
    parallel. ``row_num_col`` additionally emits the global row number
    off the SAME exchange (one shuffle serves both scans). ``order_by``
    must be a total order; with an exact type (long/decimal) for
    ``value_col`` the result is accumulation-order-independent and
    engine-replayable."""
    return global_cumsum_multi(
        df,
        order_by,
        [(value_col, out_col)],
        num_partitions=num_partitions,
        row_num_col=row_num_col,
    )


def global_cumsum_multi(
    df: DataFrame,
    order_by: list,
    values: list[tuple[str, str]],
    *,
    num_partitions: int | None = None,
    row_num_col: str | None = None,
) -> DataFrame:
    """:func:`global_cumsum` for SEVERAL value columns at once —
    ``values`` is ``[(value_col, out_col), ...]`` and every running sum
    (plus the optional global row number) rides ONE range exchange: the
    per-partition totals aggregate emits one sum per value column, the
    offsets broadcast carries one offset per column, and the local
    cumulative windows share the same sort. The multi-CDF shape
    (ext/rankstats.py needs both samples' cumulative counts in one
    value order) would otherwise pay one full shuffle per column."""
    if not values:
        raise ValueError("need at least one (value_col, out_col) pair")
    parts = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    with_pid = parts.withColumn("_pid", F.spark_partition_id())
    totals = with_pid.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(vc).alias(f"_s{i}") for i, (vc, _) in enumerate(values)],
    )
    # single-partition window over the #partitions-row totals only
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_n").over(off_w), F.lit(0)).alias("_noff"),
        *[
            F.coalesce(F.sum(f"_s{i}").over(off_w), F.lit(0)).alias(f"_voff{i}")
            for i in range(len(values))
        ],
    )
    local_cum = Window.partitionBy("_pid").orderBy(*order_by).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local_rn = Window.partitionBy("_pid").orderBy(*order_by)
    out = with_pid
    for i, (vc, _) in enumerate(values):
        out = out.withColumn(f"_lcum{i}", F.sum(vc).over(local_cum))
    out = out.join(F.broadcast(offsets), on="_pid")
    for i, (_, oc) in enumerate(values):
        out = out.withColumn(oc, F.col(f"_voff{i}") + F.col(f"_lcum{i}"))
    if row_num_col:
        out = out.withColumn("_lrn", F.row_number().over(local_rn)).withColumn(
            row_num_col, (F.col("_noff") + F.col("_lrn")).cast("long")
        )
    drop = ["_pid", "_lrn", "_noff"]
    drop += [f"_lcum{i}" for i in range(len(values))]
    drop += [f"_voff{i}" for i in range(len(values))]
    return out.drop(*drop)
