"""The audit-log dataflow: dual-output combinators + the log-schema union.

Reference mechanism: a module-global ``logs: list[dict]`` mutated from inside
the row-functions of every cleaning operator and materialized once at the end
(/root/reference/etl.py:664,694,719). That is driver-side mutable state —
impossible on executors. The engine's redesign (SURVEY §2.9): operators
compute a struct-valued result column carrying ``value + flagged + reason``,
project the clean column out, and derive the log stream with a filter on
``flagged``. All log streams share one fixed superset schema (schemas.LOG_SCHEMA)
and union via ``unionByName(allowMissingColumns=True)``, which reproduces
pandas' union-of-keys semantics deterministically.

Scale note: both branches (clean + log) of each operator are narrow
transformations over the same scan — Catalyst plans them as one pass when
written in the same job; for multi-action pipelines, persist the shared
intermediate (pipelines.runner does this).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.schemas import LOG_COLUMNS, LOG_SCHEMA


def log_frame(df: DataFrame, **cols: Column) -> DataFrame:
    """Project ``df`` onto the fixed LOG_SCHEMA.

    ``cols`` maps log-column name -> Column expression; unmentioned log
    columns become NULL strings. This is the engine's equivalent of the
    reference appending a dict with a site-specific keyset (etl.py:297-304).
    """
    unknown = set(cols) - set(LOG_COLUMNS)
    if unknown:
        raise ValueError(f"not log columns: {sorted(unknown)}")
    projection = [
        (cols[c].cast("string") if c in cols else F.lit(None).cast("string")).alias(c)
        for c in LOG_COLUMNS
    ]
    return df.select(*projection)


def empty_logs(spark) -> DataFrame:
    return spark.createDataFrame([], LOG_SCHEMA)


def union_logs(*logs: DataFrame) -> DataFrame:
    """Union heterogeneous log batches (pandas union-of-keys, made explicit)."""
    frames = [lg for lg in logs if lg is not None]
    if not frames:
        raise ValueError("no log frames")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    ).select(*LOG_COLUMNS)


def orphan_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    *,
    filename: str,
    id_col: str | None = None,
) -> DataFrame:
    """Referential-integrity audit the reference lacks (SURVEY §2.3).

    Returns a log stream of child rows whose key has no match in parent
    (left_anti join — broadcast when the parent is dimension-sized). The
    reference lets orphans flow through silently (verified: enc-000106 /
    p-0999 lands in the final table); the engine keeps that behavior for the
    data but reports the orphans to the logs table.
    """
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    orphans = child.join(F.broadcast(keys), on=child_key, how="left_anti")
    return log_frame(
        orphans,
        patient_id=F.col(id_col) if id_col else F.col(child_key),
        filename=F.lit(filename),
        column_name=F.lit(child_key),
        original_value=F.col(child_key),
        reason=F.lit("orphan_" + child_key),
    )


def fk_graph_audit(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Whole-schema referential-integrity audit: one row per FK edge
    (name, child_df, child_key, parent_df, parent_key) with child row
    count, orphan count (non-null keys missing from the parent), and
    null-key count (NULL FKs don't violate RI in SQL semantics — they
    are reported separately, not as orphans). Each edge is one
    broadcast-dim left join + aggregate; the per-edge results union
    into the audit table a schema owner reviews per ingest."""
    from functools import reduce

    outs = []
    for name, child, ck, parent, pk in edges:
        keyed = (
            parent.select(F.col(pk).alias("_k"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        j = child.select(F.col(ck).alias("_k")).join(
            F.broadcast(keyed), on="_k", how="left"
        )
        outs.append(
            j.agg(
                F.lit(name).alias("edge"),
                F.count(F.lit(1)).alias("n_child"),
                F.sum(
                    F.when(
                        F.col("_k").isNotNull() & F.col("_hit").isNull(), 1
                    ).otherwise(0)
                ).alias("n_orphans"),
                F.sum(F.when(F.col("_k").isNull(), 1).otherwise(0)).alias(
                    "n_null_keys"
                ),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)
