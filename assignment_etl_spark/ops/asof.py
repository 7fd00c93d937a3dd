"""As-of (backward) join — a custom operator Spark lacks natively,
composed from union + window (SURVEY §2.3 engine surface).

Semantics: for each left row, attach the latest right row with
``right.ts <= left.ts`` within the same ``by`` group (ties inclusive —
a right row at exactly left.ts matches), NULLs when no prior right row.

Why union+window instead of a range join: a range/theta join explodes to
|left|×|right| candidate pairs per group before filtering; the union trick
is one shuffle on (by, ts) and one window pass — O((|L|+|R|) log) per
group, the only shape that survives a trillion-row event table. Skewed
``by`` keys fall back to the same salting/AQE toolbox as any window.
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
) -> DataFrame:
    """Backward as-of join: left rows + latest right values at or before
    each left timestamp. ``right_cols`` are the right columns to carry
    (default: all but ``on``/``by``), renamed with ``suffix``.
    """
    by_keys = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by_keys]

    carried = [f"{c}{suffix}" for c in right_cols]
    # All carried values ride in ONE struct per right row, filled by a single
    # last(ignorenulls=True): every carried column comes from the SAME
    # matched right row, and that row's own NULLs survive (a per-column fill
    # would silently back-fill each NULL from an older right row).
    payload = F.struct(
        *[F.col(c).alias(cc) for c, cc in zip(right_cols, carried)],
        F.col(on).alias(f"{on}{suffix}"),
    )
    r = right.select(
        *by_keys,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),  # right sorts first at equal ts → inclusive tie
        payload.alias("_asof"),
    )
    l_cols = left.columns
    l = left.select(
        *l_cols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_asof"].dataType).alias("_asof"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by_keys)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in l_cols],
        F.col("_side"),
        F.last("_asof", ignorenulls=True).over(w).alias("_asof"),
    )
    out = filled.filter(F.col("_side") == 1)
    return out.select(
        *l_cols,
        *[F.col("_asof").getField(cc).alias(cc) for cc in carried],
        F.col("_asof").getField(f"{on}{suffix}").alias(f"{on}{suffix}"),
    )
