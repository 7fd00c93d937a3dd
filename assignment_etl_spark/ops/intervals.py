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


def _floor_div(x: Column, w: int) -> Column:
    """floor(x / w) in EXACT integer arithmetic at any long magnitude.
    ``F.floor(x / w)`` routes through double division, which loses
    precision above 2^53 (epoch nanoseconds) and would silently
    mis-bucket intervals, breaking the later-start dedup-cell equality
    (ADVICE r5). ``x - pmod(x, w)`` is exactly divisible by ``w`` for
    any sign of x (pmod is the non-negative remainder), so the decimal
    division below is exact and integral."""
    exact = (x.cast("long") - F.pmod(x.cast("long"), F.lit(w))).cast(
        "decimal(38,0)"
    )
    return (exact / F.lit(w)).cast("long")


def _cells(start: Column, end: Column, cell_width: int) -> Column:
    """Cell ids spanned by [start, end): floor(start/w) .. floor((end-1)/w).
    Empty/inverted intervals (end <= start) span no cells and drop out."""
    return F.when(
        end > start,
        F.sequence(
            _floor_div(start, cell_width),
            _floor_div(end - 1, cell_width),
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
    left_span: tuple[str, str] | None = None,
    right_span: tuple[str, str] | None = None,
) -> DataFrame:
    """All (l, r) pairs with [l_start, l_end) ∩ [r_start, r_end) ≠ ∅,
    as an equi-join on time cells (never a nested-loop theta join).
    Left columns keep their names; right columns are suffixed ``_r`` on
    collision. Bounds must be integral (cast timestamps to epoch
    seconds upstream). ``how='inner'`` only — the semantics of outer
    interval joins belong to the caller (anti-join the matched keys).

    ``left_span``/``right_span`` name (span_start, span_end) columns
    produced by :func:`split_long_intervals`: cell EXPLOSION uses the
    span bounds (each ≤ max_cells wide), while the overlap predicate
    and the later-start dedup cell keep using the ORIGINAL bounds. The
    splitter aligns span boundaries to cell multiples, so every cell of
    an interval lies in exactly one of its spans — the later-start cell
    still selects exactly one surviving (span_l, span_r) copy per
    overlapping original pair, and the span columns are dropped from
    the output. (Proved against the brute-force theta oracle in
    tests/test_intervals.py.)
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

    def _right_name(c: str) -> str:
        return f"{c}_r" if c in overlap_l else c

    rs = _right_name(right_start)
    re_ = _right_name(right_end)
    l_sp = left_span or (left_start, left_end)
    r_sp_raw = right_span or (right_start, right_end)
    r_sp = (_right_name(r_sp_raw[0]), _right_name(r_sp_raw[1]))
    lc = left.withColumn(
        "_cell",
        F.explode(_cells(F.col(l_sp[0]), F.col(l_sp[1]), cell_width)),
    )
    rc = r.withColumn(
        "_cell",
        F.explode(_cells(F.col(r_sp[0]), F.col(r_sp[1]), cell_width)),
    )
    joined = lc.join(rc, on="_cell")
    ls, le = F.col(left_start), F.col(left_end)
    rs_c, re_c = F.col(rs), F.col(re_)
    out = joined.filter(
        (ls < re_c)
        & (rs_c < le)
        # keep the pair only in the cell of the LATER start: exactly
        # one surviving copy per overlapping pair, no distinct needed
        # (with spans: that cell lies in exactly one span per side)
        & (F.col("_cell") == _floor_div(F.greatest(ls, rs_c), cell_width))
    ).drop("_cell")
    drop_spans = (list(left_span) if left_span else []) + (
        list(r_sp) if right_span else []
    )
    return out.drop(*drop_spans) if drop_spans else out


def split_long_intervals(
    df: DataFrame,
    *,
    start: str = "start",
    end: str = "end",
    cell_width: int,
    max_cells: int,
    span_start: str = "_span_start",
    span_end: str = "_span_end",
) -> DataFrame:
    """Long-interval skew control for :func:`interval_overlap_join`
    (VERDICT r5 ask #6): replace each row by one row per ≤``max_cells``
    cell-aligned chunk of [start, end), carrying the chunk bounds in
    ``span_start``/``span_end`` while the ORIGINAL bounds stay in
    ``start``/``end``. Feed the result to interval_overlap_join with
    ``left_span``/``right_span`` naming the chunk columns: cell
    explosion is then bounded to max_cells per row (the ``sequence()``
    array a mega-interval would otherwise materialize in one task is
    the real hazard — a month-long interval over 1s cells is a 2.6M-
    element array on a single row), and hot rows split across chunks.

    Correctness invariant: chunk boundaries are CELL MULTIPLES, so the
    cells of an interval partition exactly across its chunks — the
    join's later-start dedup cell lies in exactly one chunk per side,
    and each overlapping original pair still survives exactly once.
    Empty/inverted intervals (end <= start) keep one row with span =
    original bounds (they explode to no cells either way).

    One narrow projection + one explode; no shuffle."""
    if cell_width < 1:
        raise ValueError(f"need cell_width >= 1, got {cell_width}")
    if max_cells < 1:
        raise ValueError(f"need max_cells >= 1, got {max_cells}")
    for c in (span_start, span_end):
        if c in df.columns:
            raise ValueError(f"column {c!r} already exists")
    s, e = F.col(start).cast("long"), F.col(end).cast("long")
    chunk_w = cell_width * max_cells
    first = _floor_div(s, chunk_w)  # chunk index of the start
    last = _floor_div(e - 1, chunk_w)
    idx = F.when(e > s, F.sequence(first, last)).otherwise(
        F.array(F.lit(None).cast("long"))
    )
    out = df.withColumn("_chunk", F.explode(idx))
    lo = F.col("_chunk") * chunk_w
    return out.select(
        *df.columns,
        F.when(
            F.col("_chunk").isNotNull(), F.greatest(s, lo)
        ).otherwise(s).alias(span_start),
        F.when(
            F.col("_chunk").isNotNull(), F.least(e, lo + chunk_w)
        ).otherwise(e).alias(span_end),
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
