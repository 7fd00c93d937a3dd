"""Golden-record survivorship: merge multi-source records per entity
with column-level precedence.

Master-data consolidation is NOT row-level keep-first (ops/dedup.py):
the best name may come from the CRM while the best address comes from
billing. Survivorship picks, PER COLUMN, the first non-null value in
precedence order (source priority, then freshness, then a unique
tie-breaker) — one window shuffle on the entity key, every column read
from the same ordered frame, no joins.

``first(ignorenulls=True)`` over an ordered frame is deterministic
exactly when the ordering is total — pass a tie-breaker, same contract
as the dedup family. Conflict accounting (how many sources disagreed
per column) rides the same frame for free.

Reference parity note: the reference dedups patients by row (etl.py
drop_duplicates); column-level survivorship is the multi-source upgrade
a real MDM/training-data join needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def golden_record(
    df: DataFrame,
    *,
    key: str,
    order_by: list[str],
    value_cols: list[str],
    conflict_flags: bool = False,
) -> DataFrame:
    """One row per ``key``: per-column first non-null in ``order_by``
    precedence (include a unique tie-breaker for determinism), plus
    ``n_sources``; with ``conflict_flags``, an ``<col>_n_distinct``
    per value column (distinct non-null candidates — >1 means the
    sources disagreed and precedence decided)."""
    w = (
        Window.partitionBy(key)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cols = [F.first(c, ignorenulls=True).over(w).alias(c) for c in value_cols]
    flags = (
        [
            F.size(F.collect_set(c).over(w)).alias(f"{c}_n_distinct")
            for c in value_cols
        ]
        if conflict_flags
        else []
    )
    return (
        df.select(
            key,
            F.count(F.lit(1)).over(w).alias("n_sources"),
            *cols,
            *flags,
        )
        .dropDuplicates([key])
    )
