"""Slowly-changing-dimension (Type 2) builder.

Turns a change log (one row per observed state of a key) into versioned
dimension rows with validity intervals — the warehouse primitive behind
"what did this customer look like when the order shipped?" joins (which
then run as plain range/as-of joins, see ops/asof.py).

Spark shape: one shuffle on the business key, two window functions
(lag to drop no-change rows, lead for the closing timestamp). Work is
linear in the change log; no state, no Python. At 100 TB the window
partitions by key — skew only if one key has millions of versions,
which a dimension by definition doesn't.

Determinism: rows are ordered by (ts, tiebreak...) inside each key. If
the change log can carry two states of a key at the SAME timestamp the
caller MUST pass ``tiebreak`` columns that make the order total —
otherwise lag/lead order is partitioning luck. ``scd2_build`` verifies
nothing about uniqueness (that's a full extra aggregation); the audit
helper :func:`version_conflicts` exists for pipelines that want the
check as a quality gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    changes: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    drop_unchanged: bool = True,
) -> DataFrame:
    """Change log -> SCD2 rows: key + attrs + ``effective_from`` /
    ``effective_to`` (NULL = open) + ``is_current``.

    ``drop_unchanged`` removes log rows whose attributes equal the
    previous version's (re-loads and heartbeats), so version numbers
    count real transitions.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    df = changes
    if drop_unchanged:
        state = F.struct(*[F.col(c) for c in attr_cols])
        df = (
            df.withColumn("_prev_state", F.lag(state).over(w))
            .filter(
                F.col("_prev_state").isNull()
                | (state != F.col("_prev_state"))
            )
            .drop("_prev_state")
        )
    return (
        df.withColumn("effective_from", F.col(ts_col))
        .withColumn("effective_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("effective_to").isNull())
        .withColumn("version", F.row_number().over(w))
        .select(
            *key_cols,
            *attr_cols,
            "effective_from",
            "effective_to",
            "is_current",
            "version",
        )
    )


def version_conflicts(
    changes: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Audit: (key..., ts[, tiebreak...]) groups with more than one row —
    the inputs on which SCD2 ordering would be nondeterministic. Empty
    result = safe. One aggregation, same key shuffle as the build."""
    keys = [*key_cols, ts_col, *(tiebreak_cols or [])]
    return (
        changes.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    suffix: str = "_dim",
) -> DataFrame:
    """Point-in-time join: each fact row gets the dimension attributes
    that were valid at its timestamp ("what did this customer look like
    when the order shipped?").

    NOT a range join: interval predicates (from <= ts < to) explode to
    |facts| x |versions| candidate pairs per key before filtering. This
    rides ops/asof.asof_join instead — union + one window pass on
    (key, ts), O((F+V) log) per key — then masks out matches whose
    interval had already CLOSED before the fact timestamp (can only
    happen if ``dim`` has validity gaps; scd2_build output is contiguous
    so the mask is a no-op there, but correctness shouldn't depend on
    the producer).
    Facts before a key's first version carry NULL attributes.
    """
    from assignment_etl_spark.ops.asof import asof_join

    d = dim.select(
        *key_cols,
        F.col("effective_from").alias(ts_col),
        *attr_cols,
        "effective_to",
    )
    j = asof_join(
        facts,
        d,
        on=ts_col,
        by=key_cols,
        right_cols=[*attr_cols, "effective_to"],
        suffix=suffix,
    )
    valid = F.col(f"effective_to{suffix}").isNull() | (
        F.col(f"effective_to{suffix}") > F.col(ts_col)
    )
    return j.select(
        *facts.columns,
        *[
            F.when(valid, F.col(f"{a}{suffix}")).alias(f"{a}{suffix}")
            for a in attr_cols
        ],
    )
