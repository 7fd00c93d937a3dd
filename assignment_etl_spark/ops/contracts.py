"""Data contracts: declarative column constraints validated in one pass.

The generic form of the pipeline-specific quality checks (ops/quality.py):
a contract is {rule_name: violation_predicate}; validation computes every
rule's violation count in ONE aggregation over the scan (conditional
sums — no per-rule pass, no collect), and `flag_violations` tags rows
with the array of rules they break for quarantine routing.

Set-level rules that need their own aggregation shape get builders:
`unique_key` (group-count duplicates) and `foreign_key` (broadcast
anti-join orphans) return 1-row DataFrames unioned into the same report.

At 100 TB: row-level rules cost one shared scan; uniqueness shuffles on
the key (hash agg); FK is an anti-join against a broadcast dim. Nothing
iterates rules against the data more than once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> Column:
    """Violation predicate: value is NULL."""
    return F.col(col).isNull()


def in_set(col: str, values: list) -> Column:
    """Violation predicate: non-null value outside the enum."""
    return F.col(col).isNotNull() & ~F.col(col).isin(values)


def in_range(col: str, lo=None, hi=None) -> Column:
    """Violation predicate: non-null value outside [lo, hi]."""
    c = F.col(col)
    pred = F.lit(False)
    if lo is not None:
        pred = pred | (c < F.lit(lo))
    if hi is not None:
        pred = pred | (c > F.lit(hi))
    return c.isNotNull() & pred


def matches(col: str, pattern: str) -> Column:
    """Violation predicate: non-null value not matching the regex."""
    return F.col(col).isNotNull() & ~F.col(col).rlike(pattern)


def _q(name: str) -> str:
    """Backtick-quote a column reference so rule names containing dots
    (e.g. 'price.usd_positive') resolve as whole column names rather than
    struct-field accesses; literal backticks are doubled per Spark's
    escaping rules."""
    return "`" + name.replace("`", "``") + "`"


def check_contract(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_violations) — every row-level rule in ONE aggregation."""
    aggs = [
        F.sum(pred.cast("long")).alias(name) for name, pred in rules.items()
    ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.coalesce(F.col(_q(name)), F.lit(0)).alias("n_violations"),
                    )
                    for name in rules
                ]
            )
        ).alias("r")
    )
    return stacked.select("r.*")


def unique_key(df: DataFrame, cols: list[str], *, rule: str | None = None) -> DataFrame:
    """1-row (rule, n_violations): rows beyond the first per duplicate key."""
    name = rule or f"unique({','.join(cols)})"
    dup = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("n_violations"))
    )
    return dup.select(F.lit(name).alias("rule"), "n_violations")


def foreign_key(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str, *, rule: str | None = None
) -> DataFrame:
    """1-row (rule, n_violations): non-null keys with no match in the dim."""
    name = rule or f"fk({col})"
    orphans = df.filter(F.col(col).isNotNull()).join(
        F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()),
        on=col,
        how="left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(name).alias("rule"), "n_violations"
    )


def validate(
    df: DataFrame,
    rules: dict[str, Column],
    *,
    set_rules: list[DataFrame] | None = None,
) -> DataFrame:
    """Full report: row-level rules + any set-level rule frames unioned."""
    report = check_contract(df, rules)
    for extra in set_rules or []:
        report = report.unionByName(extra)
    return report


def flag_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Append ``violated_rules`` (array of names, empty = clean) for
    quarantine routing — one projection, no shuffle."""
    arr = F.array_compact(
        F.array(
            *[
                F.when(pred, F.lit(name)).otherwise(F.lit(None))
                for name, pred in rules.items()
            ]
        )
    )
    return df.withColumn("violated_rules", arr)
