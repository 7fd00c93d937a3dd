"""As-of join — a custom operator Spark lacks natively, composed from
union + window (SURVEY §2.3 engine surface).

Semantics (pandas ``merge_asof`` parity):
- ``direction="backward"`` (default): latest right row with
  ``right.ts <= left.ts`` per ``by`` group (ties inclusive).
- ``direction="forward"``: earliest right row with ``right.ts >= left.ts``
  (ties inclusive).
- ``direction="nearest"``: whichever of the two is closer in time;
  exact ties (equidistant prev/next) resolve backward, matching pandas.
- ``tolerance_seconds``: matches farther than this are nulled out.

Why union+window instead of a range join: a range/theta join explodes to
|left|×|right| candidate pairs per group before filtering; the union trick
is one shuffle on (by, ts) and one window pass — O((|L|+|R|) log) per
group, the only shape that survives a trillion-row event table ("nearest"
runs two window passes over the one shuffled frame, still no explosion).
Skewed ``by`` keys fall back to the same salting/AQE toolbox as any window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: left rows + the matched right row's values renamed with
    ``suffix`` (``right_cols`` defaults to all right columns but
    ``on``/``by``), NULLs when no match within ``direction``/``tolerance``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    by_keys = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by_keys]

    carried = [f"{c}{suffix}" for c in right_cols]
    ts_r = f"{on}{suffix}"
    # All carried values ride in ONE struct per right row, filled by a single
    # last/first(ignorenulls=True): every carried column comes from the SAME
    # matched right row, and that row's own NULLs survive (a per-column fill
    # would silently back-fill each NULL from an older right row).
    payload = F.struct(
        *[F.col(c).alias(cc) for c, cc in zip(right_cols, carried)],
        F.col(on).alias(ts_r),
    )
    # _side: right sorts BEFORE left at equal ts under the backward (asc)
    # and forward (desc) orderings alike → equal-ts right rows match both.
    r = right.select(
        *by_keys,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        payload.alias("_asof"),
    )
    l_cols = left.columns
    l = left.select(
        *l_cols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_asof"].dataType).alias("_asof"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    def _w(descending: bool):
        order = F.col(on).desc() if descending else F.col(on).asc()
        return (
            Window.partitionBy(*by_keys)
            .orderBy(order, F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    if direction in ("backward", "forward"):
        filled = unioned.select(
            *[F.col(c) for c in l_cols],
            F.col("_side"),
            F.last("_asof", ignorenulls=True)
            .over(_w(descending=direction == "forward"))
            .alias("_asof"),
        )
    else:  # nearest: prev via the backward frame, next via the mirrored
        # frame on the SAME ordering (equal-ts rights land in the backward
        # branch at distance 0, which wins every tie anyway)
        w_b = _w(descending=False)
        w_f = (
            Window.partitionBy(*by_keys)
            .orderBy(F.col(on).asc(), F.col("_side").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        prev_m = F.last("_asof", ignorenulls=True).over(w_b)
        next_m = F.first("_asof", ignorenulls=True).over(w_f)
        dist_prev = F.abs(F.col(on).cast("double") - prev_m.getField(ts_r).cast("double"))
        dist_next = F.abs(next_m.getField(ts_r).cast("double") - F.col(on).cast("double"))
        chosen = (
            F.when(prev_m.isNull(), next_m)
            .when(next_m.isNull(), prev_m)
            .when(dist_next < dist_prev, next_m)
            .otherwise(prev_m)  # ties → backward, pandas semantics
        )
        filled = unioned.select(
            *[F.col(c) for c in l_cols], F.col("_side"), chosen.alias("_asof")
        )

    out = filled.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        dist = F.abs(
            F.col(on).cast("double") - F.col("_asof").getField(ts_r).cast("double")
        )
        out = out.withColumn(
            "_asof", F.when(dist <= F.lit(float(tolerance_seconds)), F.col("_asof"))
        )
    return out.select(
        *l_cols,
        *[F.col("_asof").getField(cc).alias(cc) for cc in carried],
        F.col("_asof").getField(ts_r).alias(ts_r),
    )
