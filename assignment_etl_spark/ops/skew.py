"""Skew mitigation primitives for hot keys at scale.

AQE's skew-join splitting handles most cases at runtime
(`session.py` enables it); these helpers cover the two shapes AQE can't:
a skewed *aggregation* key, and a skewed join where the build side must be
replicated per salt. Both are pure DataFrame rewrites — no RDDs.

The classic 100 TB case: one bot user_id owning 1% of a trillion events
makes one reduce task process 10 B rows. Salting fans that key across
``n_salts`` partial groups, then merges — two small shuffles instead of one
unbounded task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}; these are the mergeable aggregates a salted
    two-phase plan supports (avg = sum+count composed by the caller;
    distinct needs a different plan — see approx_count_distinct).

    Phase 1 groups on (keys + random salt) — hot keys split across
    n_salts tasks; phase 2 merges the partials on the true keys.
    """
    mergeable = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial_aggs = []
    final_aggs = []
    for out, (col, fn) in aggs.items():
        if fn not in mergeable:
            raise ValueError(f"{fn} is not mergeable under salting")
        partial = F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)
        partial_aggs.append(partial.alias(f"_p_{out}"))
        final_aggs.append(mergeable[fn](f"_p_{out}").alias(out))
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*final_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact ⋈ small-ish dim: salt the fact key, replicate the dim
    once per salt (explode), join on (key, salt). Use when the dim is too
    big to broadcast outright but small enough to replicate n_salts× across
    the shuffle; for broadcastable dims just use broadcast()."""
    salted_fact = fact.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    replicated = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(replicated, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts + share of total for the heaviest
    keys — the number you look at before choosing n_salts."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("share", F.round(F.col("rows") / F.lit(float(total)), 6))
        .orderBy(F.desc("rows"))
        .limit(top)
    )
