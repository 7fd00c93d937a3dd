"""Interval-overlap join: all pairs (l, r) whose half-open ranges
[start, end) intersect — sessions × incident windows, ad exposures ×
outage periods, audio segments × transcript spans.

A naive implementation is a theta join (start/end inequality
predicates), which Spark executes as a broadcast-nested-loop — an
all-pairs scan that dies long before 100 TB. This module uses the
grid-bucket decomposition (the same family as ext/geo.py's 3×3
neighbor join): every interval explodes to the fixed-width time cells
it spans, the join is an EQUI-join on the cell id, and the exact
overlap predicate filters within cells.

Duplicate elimination is by construction, not by a distinct shuffle:
two overlapping intervals co-occur in every cell their overlap spans,
so the pair is kept only in the cell containing the LATER of the two
starts (``cell == floor(max(l_start, r_start) / cell_width)``) — each
overlapping pair survives exactly once and no (l_id, r_id) dedup pass
is needed.

Cost model: explode factor = interval length / cell_width (choose
cell_width near the typical interval length: factor ~2); the join key
is the cell id — time-uniform workloads distribute evenly, and a hot
cell is bounded by (events per cell)². Long-tail intervals are the
skew risk: cap them upstream or bump cell_width (the factor is
reported by :func:`explode_profile`).

Determinism: bounds are integers (epoch seconds or any monotone unit);
everything is exact integer arithmetic — trivially oracle-replayable.

Reference parity note: the reference has no interval surface
(``etl.py`` joins are equi-joins); this extends the asof/range join
family in ops/asof.py for the training-data timeline workloads (gate
``interval_overlap_events``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cells(start: Column, end: Column, cell_width: int) -> Column:
    """Cell ids spanned by [start, end): floor(start/w) .. floor((end-1)/w).
    Empty/inverted intervals (end <= start) span no cells and drop out."""
    return F.when(
        end > start,
        F.sequence(
            F.floor(start / cell_width),
            F.floor((end - 1) / cell_width),
        ),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    cell_width: int,
    how: str = "inner",
) -> DataFrame:
    """All (l, r) pairs with [l_start, l_end) ∩ [r_start, r_end) ≠ ∅,
    as an equi-join on time cells (never a nested-loop theta join).
    Left columns keep their names; right columns are suffixed ``_r`` on
    collision. Bounds must be integral (cast timestamps to epoch
    seconds upstream). ``how='inner'`` only — the semantics of outer
    interval joins belong to the caller (anti-join the matched keys).
    """
    if how != "inner":
        raise ValueError(f"only how='inner' is supported, got {how!r}")
    if cell_width < 1:
        raise ValueError(f"need cell_width >= 1, got {cell_width}")
    if "_cell" in left.columns or "_cell" in right.columns:
        raise ValueError("'_cell' is reserved by interval_overlap_join")
    overlap_l = set(left.columns) & set(right.columns)
    # the suffix rename must not itself collide: a pre-existing 'c_r'
    # next to a colliding 'c' would make the join output ambiguous
    clash = {f"{c}_r" for c in overlap_l} & (
        (set(left.columns) | set(right.columns)) - overlap_l
    )
    if clash:
        raise ValueError(
            f"suffix collision: renaming would duplicate {sorted(clash)}"
        )
    r = right
    for c in overlap_l:
        r = r.withColumnRenamed(c, f"{c}_r")
    rs = f"{right_start}_r" if right_start in overlap_l else right_start
    re_ = f"{right_end}_r" if right_end in overlap_l else right_end
    lc = left.withColumn(
        "_cell",
        F.explode(_cells(F.col(left_start), F.col(left_end), cell_width)),
    )
    rc = r.withColumn(
        "_cell",
        F.explode(_cells(F.col(rs), F.col(re_), cell_width)),
    )
    joined = lc.join(rc, on="_cell")
    ls, le = F.col(left_start), F.col(left_end)
    rs_c, re_c = F.col(rs), F.col(re_)
    return (
        joined.filter(
            (ls < re_c)
            & (rs_c < le)
            # keep the pair only in the cell of the LATER start: exactly
            # one surviving copy per overlapping pair, no distinct needed
            & (F.col("_cell") == F.floor(F.greatest(ls, rs_c) / cell_width))
        )
        .drop("_cell")
    )


def explode_profile(
    df: DataFrame, *, start: str, end: str, cell_width: int
) -> DataFrame:
    """One row (n_intervals, n_cells, avg_cells_per_interval, max_cells)
    — the fan-out this cell_width costs on this data; tune cell_width
    until avg is ~1-3."""
    # coalesce the ARRAY, not the size: Spark's legacy size(NULL) is -1,
    # which would silently subtract empty intervals from n_cells
    n = F.size(
        F.coalesce(
            _cells(F.col(start), F.col(end), cell_width),
            F.array().cast("array<bigint>"),
        )
    )
    per = df.select(n.alias("_n"))
    return per.agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("_n").alias("n_cells"),
        F.round(F.avg("_n"), 3).alias("avg_cells_per_interval"),
        F.max("_n").alias("max_cells"),
    )
