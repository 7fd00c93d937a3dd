"""2D Pareto skyline (maximize both axes) without a single-partition
window.

A point p is on the skyline iff no other point dominates it — q
dominates p when q.x ≥ p.x and q.y ≥ p.y with at least one strict
inequality. The textbook formulation is a quadratic NOT EXISTS; the 2D
case collapses to a sort + running max: after per-x reduction (the max
y at each x kills all same-x domination), a point survives iff every
STRICTLY larger x has a smaller y — i.e. its y exceeds the exclusive
running max of y over x descending.

That running max is the 100 TB hazard: ``max().over(Window.orderBy(x))``
is a single-partition window. This module reuses the two-phase offset
pattern from ``ops/ids.py::global_row_number``: range-partition on x
descending, take each partition's local exclusive cummax in parallel,
and fold in the running max of the tiny per-partition max table (the
only unpartitioned window runs over #partitions rows). One range
exchange over the per-x table (already reduced by the groupBy), not a
funnel.

Reference parity note: the reference has no skyline; this serves the
analytics layer (cost/quality frontier queries over curation metrics —
e.g. "which documents are undominated on (quality_score, length)").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """The Pareto front of (maximize ``x_col``, maximize ``y_col``):
    one row per skyline point, columns (x_col, y_col), NULL x/y rows
    ignored (NULL never dominates and is never on the front)."""
    gx = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("_x"))
        .agg(F.max(F.col(y_col)).alias("_y"))
    )
    parts = (
        gx.repartitionByRange(num_partitions, F.col("_x").desc())
        if num_partitions
        else gx.repartitionByRange(F.col("_x").desc())
    )
    with_pid = parts.withColumn("_pid", F.spark_partition_id())
    pmax = with_pid.groupBy("_pid").agg(F.max("_y").alias("_pm"))
    # exclusive running max over the per-partition max table — the only
    # unpartitioned window, over #partitions rows
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = pmax.select(
        "_pid", F.max("_pm").over(off_w).alias("_prev_part_max")
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # greatest() skips NULLs, so a missing local prefix (first row of a
    # partition) or missing prior partition (first partition) drops out
    prev_max = F.greatest(
        F.max("_y").over(local_w), F.col("_prev_part_max")
    )
    return (
        with_pid.join(F.broadcast(offsets), on="_pid")
        .withColumn("_prev", prev_max)
        .filter(F.col("_prev").isNull() | (F.col("_prev") < F.col("_y")))
        .select(F.col("_x").alias(x_col), F.col("_y").alias(y_col))
    )
