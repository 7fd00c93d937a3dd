"""Late-arriving dimension handling: inferred members + reconciliation.

The Kimball problem: a fact row shows up referencing a dimension key the
dimension table hasn't loaded yet (the order lands before the customer
record replicates). Dropping the fact loses revenue; NULLing the
attributes breaks grouping. The standard fix is the INFERRED MEMBER —
materialize a placeholder dimension row (key + declared defaults +
``_inferred = true``) so every fact joins, and RECONCILE placeholders
away when the real rows arrive.

Scale shape: the unmatched-key scan is the same broadcast-dim left join
the FK audit uses; inferred members are bounded by the count of distinct
missing keys (tiny); reconciliation is a keyed anti-join + union on the
DIMENSION (never touches facts). Works unchanged as the foreachBatch
body of a streaming ingest.

Reference parity note: the reference joins nothing (etl.py), so orphan
facts silently keep dangling keys; ops/quality.orphan_check reports
them — this module is the remediation half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INFERRED_FLAG = "_inferred"


def inferred_members(
    facts: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    defaults: dict,
) -> DataFrame:
    """Placeholder dim rows for every distinct non-null fact key missing
    from the dimension: dim_key + ``defaults`` for the declared
    attribute columns + ``_inferred = true``. Columns not in
    ``defaults`` are NULL."""
    missing = (
        facts.select(F.col(fact_key).alias(dim_key))
        .filter(F.col(dim_key).isNotNull())
        .distinct()
        .join(dim.select(dim_key).distinct(), on=dim_key, how="left_anti")
    )
    out = missing
    for c in dim.columns:
        if c == dim_key:
            continue
        out = out.withColumn(
            c, F.lit(defaults.get(c)).cast(dim.schema[c].dataType)
        )
    return out.select(*dim.columns).withColumn(INFERRED_FLAG, F.lit(True))


def dim_with_inferred(
    facts: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    defaults: dict,
) -> DataFrame:
    """The dimension every fact can join: real rows (flagged false) plus
    inferred members. Join facts against THIS and no fact ever drops."""
    real = dim.withColumn(INFERRED_FLAG, F.lit(False))
    return real.unionByName(
        inferred_members(
            facts, dim, fact_key=fact_key, dim_key=dim_key, defaults=defaults
        )
    )


def reconcile_inferred(
    dim_table: DataFrame,
    arrivals: DataFrame,
    *,
    dim_key: str,
) -> DataFrame:
    """Replace placeholders whose real row has arrived: any dimension
    row (inferred or not) keyed by an arriving key is superseded by the
    arrival (flagged false); placeholders without an arrival stay, so
    reconciliation is safe to run on every ingest. One anti-join +
    union on the dimension only."""
    keep = dim_table.join(
        arrivals.select(dim_key).distinct(), on=dim_key, how="left_anti"
    )
    return keep.unionByName(arrivals.withColumn(INFERRED_FLAG, F.lit(False)))
