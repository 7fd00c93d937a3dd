"""Rank-based two-sample tests: Kolmogorov–Smirnov and Mann–Whitney U.

PSI / chi-square / Welch (ext/drift.py) compare BINNED or MOMENT
summaries; the rank statistics here compare whole distributions with no
binning contract — the standard nonparametric monitors for "did this
score/price/latency column shift between two cohorts" when you can't
assume a parametric family or pick bin edges up front.

Scale shape — the whole point of this module: the naive implementation
ranks the concatenated samples with a global ORDER BY window, the
classic single-partition 100 TB funnel. Instead both tests:

1. collapse the input to ONE row per distinct value with per-sample
   counts (a hash aggregate — map-side combined, output ∝ distinct
   values, not rows);
2. run ONE range exchange over that distinct-value table to get every
   cumulative count at once (ops/ids.global_cumsum_multi — the only
   single-partition window is over the #partitions-row offsets table);
3. finish with a 1-row aggregate of closed-form per-value expressions.

Ties are handled exactly by construction: a tied block IS one row of
the distinct-value table (KS evaluates the empirical CDFs at block
ends, which is where the sup is attained; MWU uses midranks and the
Σ(t³−t) tie correction).

Determinism / cross-engine policy: every count is exact (long /
decimal(38,0) — rank-sum terms reach O(N²) and overflow int64 past
~3 B rows, so the per-value products accumulate as decimal). Doubles
appear only in single closed-form expressions computed identically by
any engine from those exact integers, rounded once at the end — the
repo's standard float policy.

Reference parity note: the reference repo has no statistical testing
surface; this extends the drift/ab-test family (ext/drift.py) with the
nonparametric pair a production data-quality monitor runs beside PSI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.ops.ids import global_cumsum_multi

# KS_ALPHA_COEFF[alpha] = c(alpha) in the large-sample rejection rule
# D > c(alpha) * sqrt((n1+n2)/(n1*n2))  (two-sided asymptotic)
KS_ALPHA_COEFF = {0.10: 1.224, 0.05: 1.358, 0.01: 1.628}


def _two_sample_counts(
    df: DataFrame, group_col: str, value_col: str, group_a, group_b
) -> DataFrame:
    """One row per distinct value with per-sample counts (na, nb) —
    the shared reduction both tests start from. NULL values are
    excluded (they have no rank); rows outside the two groups are
    filtered before the aggregate so the scan prunes early."""
    g = F.col(group_col)
    return (
        df.filter(g.isin([group_a, group_b]) & F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("val"))
        .agg(
            F.sum(F.when(g == group_a, 1).otherwise(0)).alias("na"),
            F.sum(F.when(g == group_b, 1).otherwise(0)).alias("nb"),
        )
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    *,
    alpha: float = 0.05,
    num_partitions: int | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test: ONE row
    ``(n_a, n_b, d_stat, ks_scaled, reject)``.

    d_stat = sup_x |F_a(x) − F_b(x)| evaluated at distinct-value block
    ends (where the sup of a pair of step functions is attained);
    ks_scaled = sqrt(n_a·n_b/(n_a+n_b)) · d_stat; reject is the
    two-sided asymptotic decision at ``alpha``. Empty samples yield
    NULL d_stat rather than a misleading 0. Always returns exactly one
    row (the drift-family contract — see ext/drift.ab_test)."""
    if alpha not in KS_ALPHA_COEFF:
        raise ValueError(f"alpha must be one of {sorted(KS_ALPHA_COEFF)}")
    perv = _two_sample_counts(df, group_col, value_col, group_a, group_b)
    cum = global_cumsum_multi(
        perv,
        [F.asc("val")],
        [("na", "cna"), ("nb", "cnb")],
        num_partitions=num_partitions,
    )
    tot = perv.agg(
        F.sum("na").alias("n_a_t"), F.sum("nb").alias("n_b_t")
    )
    # per-value |CDF gap|: one closed-form double from exact longs —
    # identical IEEE expression in any engine, so max() is portable
    gap = F.abs(
        F.col("cna") / F.col("n_a_t") - F.col("cnb") / F.col("n_b_t")
    )
    agg = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n_a_t").alias("n_a"),
            F.first("n_b_t").alias("n_b"),
            F.max(gap).alias("_d"),
        )
    )
    n_a, n_b, d = F.col("n_a"), F.col("n_b"), F.col("_d")
    scale = F.sqrt(n_a * n_b / (n_a + n_b))
    crit = F.lit(KS_ALPHA_COEFF[alpha])
    # global agg always yields exactly one row; on empty input the
    # sums are NULL — coalesce counts to 0 (the ADVICE-r5 cuped_adjust
    # contract: the caller sees WHY there is no statistic) and leave
    # the statistics NULL via the guards below
    return agg.select(
        F.coalesce(n_a, F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(n_b, F.lit(0)).cast("long").alias("n_b"),
        F.round(d, 9).alias("d_stat"),
        F.round(scale * d, 9).alias("ks_scaled"),
        F.when(
            (n_a > 0) & (n_b > 0), (scale * d) > crit
        ).alias("reject"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) with midrank ties and the
    Σ(t³−t) tie-corrected normal approximation: ONE row
    ``(n_a, n_b, u2_stat, u_stat, z_stat)``.

    Midranks never materialize per input row: for a tied block of size
    t starting after ``before`` smaller values, each member's midrank
    is before + (t+1)/2, so sample A's doubled rank sum is the exact
    integer  Σ na·(2·before + t + 1)  — accumulated as decimal(38,0)
    because the terms are O(N²). u2_stat = 2·U (exact integer; U itself
    may end in .5), z uses σ² = n_a·n_b/12 · ((N+1) − Σ(t³−t)/(N(N−1)))
    with no continuity correction (documented choice — matches the
    large-sample form an oracle can replay verbatim). Degenerate inputs
    (either sample empty, or all values tied so σ = 0) yield NULL z."""
    perv = _two_sample_counts(df, group_col, value_col, group_a, group_b)
    perv = perv.withColumn("t", (F.col("na") + F.col("nb")).cast("long"))
    cum = global_cumsum_multi(
        perv, [F.asc("val")], [("t", "ct")], num_partitions=num_partitions
    )
    dec = "decimal(38,0)"
    before = (F.col("ct") - F.col("t")).cast(dec)
    # doubled rank-sum term for sample A at this block + tie cube term
    r2_term = F.col("na").cast(dec) * (
        F.lit(2).cast(dec) * before + F.col("t") + F.lit(1)
    )
    tie_term = F.col("t").cast(dec) * F.col("t") * F.col("t") - F.col("t")
    agg = cum.agg(
        F.coalesce(F.sum("na"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("nb"), F.lit(0)).cast("long").alias("n_b"),
        F.sum(r2_term).alias("_r2"),
        F.sum(tie_term).alias("_ties"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    n = n_a + n_b
    # 2U = 2R_a − n_a(n_a+1): exact decimal
    u2 = F.col("_r2") - n_a.cast(dec) * (n_a + F.lit(1))
    u = u2.cast("double") / 2.0
    mu = n_a.cast("double") * n_b.cast("double") / 2.0
    var = (
        n_a.cast("double") * n_b.cast("double") / 12.0
    ) * (
        (n + 1).cast("double")
        - F.col("_ties").cast("double")
        / (n.cast("double") * (n - 1).cast("double"))
    )
    z = (u - mu) / F.sqrt(var)
    # global agg always yields exactly one row; counts coalesce to 0 on
    # empty input, statistics stay NULL via the guards (same contract
    # as ks_two_sample)
    return agg.select(
        "n_a",
        "n_b",
        F.when((n_a > 0) | (n_b > 0), u2).alias("u2_stat"),
        F.when((n_a > 0) | (n_b > 0), F.round(u, 1)).alias("u_stat"),
        F.when(
            (n_a > 0) & (n_b > 0) & (var > 0), F.round(z, 9)
        ).alias("z_stat"),
    )


def conformal_threshold(
    df: DataFrame,
    score_col: str,
    *,
    alpha: float = 0.1,
    calib_col: str = "is_calib",
    round_to: int = 9,
) -> DataFrame:
    """Split-conformal calibration (Vovk et al.; Angelopoulos & Bates
    2021 tutorial — public): the threshold is the ⌈(n+1)(1−α)⌉-th
    smallest calibration nonconformity score, guaranteeing ≥ 1−α
    coverage on exchangeable test points. As a pipeline operator: gate
    a scorer (quality model, outlier detector) with a finite-sample
    guarantee instead of an eyeballed cutoff.

    ``calib_col`` is boolean: true rows calibrate, false rows report
    empirical coverage. Returns ONE row
    (n_calib, rank_q, threshold, n_test, n_covered, coverage).

    Scale shape: the quantile is NOT a global sort — calibration
    scores collapse to one row per distinct value (hash aggregate),
    ONE range exchange gives the cumulative counts
    (ops/ids.global_cumsum), and the threshold is min(value | cum ≥ r),
    a 1-row aggregate. Test coverage is one more aggregate against the
    broadcast threshold. When r > n_calib (too few calibration points
    for the requested α) the threshold is +∞ by the math — reported as
    NULL with full coverage, and n_calib says why.

    Determinism: counts and ranks are exact longs; the threshold is a
    data value (no interpolation — conformal uses the empirical
    quantile); coverage is one long/long division rounded once."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"need 0 < alpha < 1, got {alpha}")
    from assignment_etl_spark.ops.ids import global_cumsum

    scores = df.filter(F.col(score_col).isNotNull())
    calib = scores.filter(F.col(calib_col))
    perv = calib.groupBy(F.col(score_col).alias("val")).agg(
        F.count(F.lit(1)).alias("n")
    )
    cum = global_cumsum(perv, [F.asc("val")], "n", out_col="cn")
    n_calib = calib.agg(F.count(F.lit(1)).alias("n_calib"))
    # r = ceil((n+1)(1-alpha)) exactly: with alpha = a/b rational this
    # is integer math, but alpha arrives as a double — ceil on the
    # double product is the standard implementation (both engines
    # compute the identical double, so the same r)
    r = F.ceil((F.col("n_calib") + 1) * F.lit(1.0 - alpha)).cast("long")
    thr = (
        cum.crossJoin(F.broadcast(n_calib))
        .select("val", "cn", r.alias("r"), "n_calib")
        .agg(
            F.first("n_calib").alias("n_calib"),
            F.first("r").alias("rank_q"),
            F.min(F.when(F.col("cn") >= F.col("r"), F.col("val"))).alias(
                "threshold"
            ),
        )
    )
    test = scores.filter(~F.col(calib_col))
    cov = test.crossJoin(F.broadcast(thr)).agg(
        F.first("n_calib").alias("n_calib"),
        F.first("rank_q").alias("rank_q"),
        F.first("threshold").alias("threshold"),
        F.count(F.lit(1)).alias("n_test"),
        F.sum(
            F.when(
                F.col("threshold").isNull()
                | (F.col(score_col) <= F.col("threshold")),
                1,
            ).otherwise(0)
        ).alias("n_covered"),
    )
    return cov.select(
        F.coalesce("n_calib", F.lit(0)).cast("long").alias("n_calib"),
        F.col("rank_q").cast("long").alias("rank_q"),
        "threshold",
        F.col("n_test").cast("long").alias("n_test"),
        F.coalesce("n_covered", F.lit(0)).cast("long").alias("n_covered"),
        F.when(
            F.col("n_test") > 0,
            F.round(F.col("n_covered") / F.col("n_test"), round_to),
        ).alias("coverage"),
    )


def score_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    *,
    round_to: int = 9,
    num_partitions: int | None = None,
) -> DataFrame:
    """ROC AUC of a score against a binary label WITHOUT sorting the
    corpus: AUC = P(score⁺ > score⁻) + ½P(tie) = U/(n⁺·n⁻), the
    Mann–Whitney identity — so the whole evaluation is the midrank
    reduction :func:`mann_whitney_u` already does (distinct-value
    counts + one range exchange + a 1-row aggregate). The classifier-
    evaluation primitive for scorer validation at corpus scale (the
    companion to ext/textclf's calibration gate).

    ``label_col`` is boolean/int (truthy = positive). Returns ONE row
    (n_pos, n_neg, auc, z_stat) — z is the tie-corrected null test
    (AUC = 0.5). Degenerate inputs (one class absent) yield NULL auc."""
    lab = F.coalesce(F.col(label_col).cast("boolean"), F.lit(False))
    tagged = df.withColumn("_auc_lab", lab.cast("int"))
    mw = mann_whitney_u(
        tagged, "_auc_lab", score_col, 1, 0, num_partitions=num_partitions
    )
    n_pos, n_neg = F.col("n_a"), F.col("n_b")
    auc = F.col("u2_stat").cast("double") / (
        F.lit(2.0) * n_pos * n_neg
    )
    return mw.select(
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
        F.when((n_pos > 0) & (n_neg > 0), F.round(auc, round_to)).alias(
            "auc"
        ),
        "z_stat",
    )
