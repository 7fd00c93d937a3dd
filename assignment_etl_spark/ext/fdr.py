"""Multiple-testing control: Benjamini–Hochberg FDR over per-segment
hypothesis tests.

A drift monitor doesn't run ONE test — it runs one per segment (event
type, country, source) every window, and at α=0.05 a 100-segment sweep
fires five false alarms a week. BH (Benjamini & Hochberg 1995 — public)
caps the FALSE DISCOVERY RATE: sort the m p-values ascending, find the
largest k with p_(k) ≤ k·q/m, reject exactly the k smallest.

Scale shape: the input to BH is ONE ROW PER SEGMENT — already the
output of an aggregation, bounded by segment cardinality, never by data
size. The ranking window here is over that aggregated table (the
plan-audit global-window rule distinguishes exactly this case), and the
step-up scan is one running max over it. The per-segment tests
themselves are hash aggregates over the data (the ext/drift.py
two-proportion machinery): one pass, map-side combined.

Determinism: counts are exact; z is one closed-form double; the normal
tail probability uses the Abramowitz–Stegun 7.1.26 erfc polynomial —
pure arithmetic + exp, replayable verbatim in SQL (the repo already
relies on cross-engine ln/log2/pow in the PSI and perplexity gates; exp
is the same class). p-values are rounded to 9 before the BH compare so
both engines step up over identical values.

Reference parity note: the reference repo has no testing surface; this
completes the ext/drift.py A/B family the way a fleet-wide monitor
needs it (many segments, one FDR budget).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Abramowitz & Stegun 7.1.26 constants (|error| < 1.5e-7)
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def erfc_as(x: Column) -> Column:
    """erfc(x) for x ≥ 0 via the A&S 7.1.26 polynomial — a single
    closed-form expression (one exp, one reciprocal, a degree-5
    polynomial) any engine evaluates identically up to libm exp ulps,
    absorbed by the caller's rounding."""
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * x)
    poly = (
        F.lit(_AS_A[0]) * t
        + F.lit(_AS_A[1]) * t * t
        + F.lit(_AS_A[2]) * t * t * t
        + F.lit(_AS_A[3]) * t * t * t * t
        + F.lit(_AS_A[4]) * t * t * t * t * t
    )
    return poly * F.exp(-(x * x))


def normal_two_sided_p(z: Column) -> Column:
    """Two-sided normal p-value: p = erfc(|z|/√2). sqrt, not pow —
    sqrt is IEEE-correctly-rounded in both engines, pow(x, 0.5) is
    not guaranteed to be."""
    return erfc_as(F.abs(z) / F.sqrt(F.lit(2.0)))


def bh_adjust(
    tests: DataFrame,
    *,
    p_col: str = "p_value",
    key_cols: list[str] | None = None,
    q: float = 0.05,
) -> DataFrame:
    """Benjamini–Hochberg step-up over a SEGMENT-LEVEL table (one row
    per test). Appends (bh_rank, bh_critical, rejected). NULL p-values
    (degenerate segments — zero variance, empty arm) are excluded from
    m and never rejected, but kept in the output with NULL rank so the
    caller sees them.

    The window runs over the aggregated test table — bounded by
    segment cardinality by construction. ``rejected`` is true for
    ranks 1..k where k = max{i : p_(i) ≤ i·q/m} (the step-up: a
    p-value above its own critical line is still rejected if a LARGER
    one passes)."""
    if not 0.0 < q < 1.0:
        raise ValueError(f"need 0 < q < 1, got {q}")
    key_cols = key_cols or ["segment"]
    p = F.col(p_col)
    valid = tests.filter(p.isNotNull())
    w = Window.orderBy(p.asc(), *[F.col(c).asc() for c in key_cols])
    # _m (test count) and _k (the step-up cutoff) ride full-frame
    # windows on the SAME sorted pass that assigns bh_rank — the old
    # 1-row broadcasts each re-evaluated the ranked lineage (the
    # upstream test aggregation ran 3×, plus two extra sorts)
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        valid
        .withColumn("bh_rank", F.row_number().over(w))
        .withColumn("_m", F.count(F.lit(1)).over(wfull))
        .withColumn(
            "bh_critical",
            F.round(F.col("bh_rank") * F.lit(q) / F.col("_m"), 9),
        )
    )
    # step-up: k = max rank whose p <= critical; rejected = rank <= k
    out = ranked.withColumn(
        "_k",
        F.max(F.when(p <= F.col("bh_critical"), F.col("bh_rank"))).over(
            wfull
        ),
    ).withColumn(
        "rejected",
        F.when(F.col("_k").isNotNull(), F.col("bh_rank") <= F.col("_k"))
        .otherwise(F.lit(False)),
    ).drop("_m", "_k")
    # NULL-p rows ride along unranked (lazily — no isEmpty probe; the
    # union of an empty frame is free)
    nulls = (
        tests.filter(p.isNull())
        .withColumn("bh_rank", F.lit(None).cast("int"))
        .withColumn("bh_critical", F.lit(None).cast("double"))
        .withColumn("rejected", F.lit(False))
    )
    return out.unionByName(nulls)


def segment_proportion_tests(
    df: DataFrame,
    *,
    segment_col: str,
    group_col: str,
    success: Column,
    group_a,
    group_b,
    round_to: int = 9,
) -> DataFrame:
    """Per-segment two-proportion z-tests in ONE hash aggregate:
    (segment, n_a, n_b, x_a, x_b, z, p_value). Pooled-variance z; a
    segment where the pooled rate is 0 or 1, or either arm is empty,
    gets NULL z/p (no information — bh_adjust carries it unranked).

    One pass over the data, map-side combined; the output is one row
    per segment. The erfc polynomial keeps the p-value SQL-replayable."""
    g = F.col(group_col)
    agg = (
        df.filter(g.isin([group_a, group_b]))
        .groupBy(F.col(segment_col).alias("segment"))
        .agg(
            F.sum(F.when(g == group_a, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(g == group_b, 1).otherwise(0)).alias("n_b"),
            F.sum(
                F.when(g == group_a, success.cast("int")).otherwise(0)
            ).alias("x_a"),
            F.sum(
                F.when(g == group_b, success.cast("int")).otherwise(0)
            ).alias("x_b"),
        )
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    x_a, x_b = F.col("x_a"), F.col("x_b")
    pool = (x_a + x_b) / (n_a + n_b)
    se = F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / n_a + F.lit(1.0) / n_b))
    z = (x_a / n_a - x_b / n_b) / se
    ok = (n_a > 0) & (n_b > 0) & (x_a + x_b > 0) & (x_a + x_b < n_a + n_b)
    return agg.select(
        "segment", "n_a", "n_b", "x_a", "x_b",
        F.when(ok, F.round(z, round_to)).alias("z"),
        F.when(ok, F.round(normal_two_sided_p(z), round_to)).alias("p_value"),
    )
