"""Distribution drift detection between two table snapshots: population
stability index (PSI) and per-bin drift profiles.

PSI is the standard monitoring statistic for "did this column's
distribution move between the reference snapshot and the current one":
bin both sides identically, compare bin shares, and sum
(p_cur − p_ref) · ln(p_cur / p_ref). Rule-of-thumb thresholds: < 0.1
stable, 0.1–0.25 moderate shift, > 0.25 action. Categorical drift uses
the category itself as the bin.

Scale shape: each side is ONE hash aggregate producing ≤ n_bins rows
(map-side combined, shuffle is bins × partitions at worst); the compare
is a join of two tiny bin tables. Nothing here scans twice or collects.
Binning is fixed-width from EXPLICIT bounds — deterministic and
SQL-replayable, and at 100 TB you want bounds pinned by contract (not
data-dependent quantiles that reshuffle every run); out-of-range values
clamp to the edge bins so no row is silently dropped.

Determinism: bin shares are exact rationals (count/total) compared in
double via one expression per bin, then rounded — the repo's standard
cross-engine float policy (single expression, no accumulation-order
dependence; the final sum is over ≤ n_bins terms rounded first).

Reference parity note: the reference repo has no drift surface; this
extends the data-quality layer (ops/quality.py, ops/contracts.py) with
the snapshot-comparison statistic a production training-data pipeline
monitors between ingests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EPS = 1e-6  # Laplace-style floor so empty bins don't blow up the log


def fixed_width_bin(col: str, *, lo: float, hi: float, n_bins: int) -> F.Column:
    """Bin index in [0, n_bins-1] with edge clamping: floor((x-lo)/w),
    out-of-range values land in the first/last bin, nulls stay null."""
    w = (hi - lo) / n_bins
    raw = F.floor((F.col(col) - F.lit(lo)) / F.lit(w)).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def bin_counts(df: DataFrame, bin_col: F.Column) -> DataFrame:
    """(bin, n) for one snapshot — the mergeable form (union + sum), so
    per-partition or per-micro-batch counts accumulate incrementally
    (see ext/streaming.stream_bin_count_sink)."""
    return df.select(bin_col.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("n")
    )


def shares_from_counts(counts: DataFrame, *, round_to: int = 10) -> DataFrame:
    """(bin, n, share) from a (bin, n) table: share = n/total via a
    window over the bin-bounded counts (never a driver scalar). The
    total used to ride a 1-row broadcast, but its build re-evaluated
    the counts lineage — a second full scan of the underlying data per
    call; the window keeps it one pass.

    CONTRACT: ``counts`` must be a BOUNDED per-bin count table
    (≤ bin-domain rows — the bin_counts/bin_shares shape), never raw
    data. The empty-frame global window single-partitions its input;
    on a bounded counts table that is free at any scale, but a caller
    passing an unbounded frame would silently funnel it through one
    task (r12 ADVICE — the requirement is part of this function's
    public contract, not an implementation detail)."""
    return counts.select(
        "bin",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(Window.partitionBy()), round_to
        ).alias("share"),
    )


def bin_shares(
    df: DataFrame, bin_col: F.Column, *, round_to: int = 10
) -> DataFrame:
    """(bin, n, share) for one snapshot: one aggregate + the share
    projection."""
    return shares_from_counts(bin_counts(df, bin_col), round_to=round_to)


def psi_profile(
    ref: DataFrame,
    cur: DataFrame,
    bin_col: F.Column,
    *,
    round_to: int = 8,
) -> DataFrame:
    """Per-bin drift table: (bin, n_ref, n_cur, share_ref, share_cur,
    psi_term), full-outer so bins present on only one side still
    contribute (their share floors at EPS inside the log)."""
    return psi_profile_from_counts(
        bin_counts(ref, bin_col), bin_counts(cur, bin_col), round_to=round_to
    )


def psi_profile_from_counts(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    *,
    round_to: int = 8,
) -> DataFrame:
    """psi_profile over pre-aggregated (bin, n) tables — the entry point
    for incrementally maintained counts (the streaming sink's
    accumulated epochs, per-partition partials)."""
    r = shares_from_counts(ref_counts).select(
        F.col("bin"), F.col("n").alias("n_ref"), F.col("share").alias("share_ref")
    )
    c = shares_from_counts(cur_counts).select(
        F.col("bin"), F.col("n").alias("n_cur"), F.col("share").alias("share_cur")
    )
    j = r.join(c, on="bin", how="full").select(
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        F.coalesce("share_ref", F.lit(0.0)).alias("share_ref"),
        F.coalesce("share_cur", F.lit(0.0)).alias("share_cur"),
    )
    term = (F.col("share_cur") - F.col("share_ref")) * F.log(
        F.greatest(F.col("share_cur"), F.lit(EPS))
        / F.greatest(F.col("share_ref"), F.lit(EPS))
    )
    return j.withColumn("psi_term", F.round(term, round_to))


def quantiles_from_histogram(
    counts: DataFrame,
    *,
    lo: float,
    hi: float,
    n_bins: int,
    qs: list[float],
    round_to: int = 6,
) -> DataFrame:
    """(q, est) approximate quantiles from a fixed-width (bin, n)
    histogram by linear interpolation inside the target bin — the
    mergeable-quantile shape: per-partition or per-micro-batch
    histograms sum together (union + groupBy sum), then ONE ≤n_bins-row
    computation answers any quantile, with error bounded by the bin
    width. Pairs with bin_counts / stream_bin_count_sink the way
    hll_cardinality pairs with hll_sketch.

    est(q) = bin_lo + width · (rank − cum_below) / bin_n, where rank =
    q·(N−1) in the continuous convention; clamped-edge bins mean
    estimates never leave [lo, hi]. Deterministic: cumulative counts are
    integers, the interpolation is one double expression per (q, bin)."""
    w = (hi - lo) / n_bins
    # both windows run over the ≤ n_bins-row histogram, never the data
    below_w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.select(
        "bin",
        "n",
        F.sum("n").over(below_w).alias("_below"),
        F.sum("n").over(Window.partitionBy()).alias("_total"),
    ).select(
        "bin", "n", F.coalesce("_below", F.lit(0)).alias("below"), "_total"
    )
    targets = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    j = targets.crossJoin(cum).withColumn(
        "_rank", F.col("q") * (F.col("_total") - 1)
    )
    hit = j.filter(
        (F.col("_rank") >= F.col("below"))
        & (F.col("_rank") < F.col("below") + F.col("n"))
    )
    est = F.round(
        F.lit(lo)
        + F.col("bin") * F.lit(w)
        + F.lit(w) * (F.col("_rank") - F.col("below")) / F.col("n"),
        round_to,
    )
    # a rank can sit exactly at _total-1 (q=1.0): it lands in the last
    # populated bin via the < bound on the NEXT bin not existing — catch
    # it with a union of the max-bin edge case
    top = (
        j.filter(F.col("q") == 1.0)
        .filter(F.col("below") + F.col("n") == F.col("_total"))
        .withColumn("est", F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(w), round_to))
        .select("q", "est")
    )
    return (
        hit.select("q", est.alias("est"))
        .unionByName(top)
        .groupBy("q")
        .agg(F.min("est").alias("est"))
        .orderBy("q")
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """1-row (chi2, dof, n): Pearson chi-square statistic for
    independence of two categorical columns. One (a,b) contingency
    aggregate (only OBSERVED cells — structural zeros never materialize,
    because chi² = Σ_observed o²/e − n algebraically absorbs them:
    Σ_all (o−e)²/e = Σ_all o²/e − 2n + Σ_all e and zero cells contribute
    only to Σe = n); marginals and the total ride windows over the cell
    table, never re-aggregating the data. Each
    o²/e term is a single double expression rounded and summed as
    decimal — the determinism policy — so the statistic replays exactly
    in SQL. Compare against the chi-square critical value for
    dof = (|A|−1)(|B|−1) offline."""
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("o"))
    # Marginals (n_a, n_b) and the grand total n are pure column sums of
    # the cells table, so they ride windows over the |A|·|B|-bounded
    # aggregate instead of three more aggregates of it — unpersisted,
    # each of those re-scanned the raw input (4 scans for 1 statistic);
    # with windows the input is scanned exactly once. ka/kb fold into
    # the final global aggregate (cells has one row per observed pair,
    # so countDistinct there equals the old tot's countDistinct).
    term = F.round(
        F.col("o") * F.col("o") / F.col("_e"), 10
    ).cast("decimal(28,10)")
    return (
        cells.withColumn("n_a", F.sum("o").over(Window.partitionBy(col_a)))
        .withColumn("n_b", F.sum("o").over(Window.partitionBy(col_b)))
        .withColumn("n", F.sum("o").over(Window.partitionBy()))
        .withColumn(
            "_e", F.col("n_a").cast("double") * F.col("n_b") / F.col("n")
        )
        .agg(
            F.round(
                F.sum(term).cast("double") - F.max("n"), round_to
            ).alias("chi2"),
            (
                (F.countDistinct(col_a) - 1) * (F.countDistinct(col_b) - 1)
            ).alias("dof"),
            F.max("n").alias("n"),
        )
    )


def column_entropy(
    df: DataFrame,
    cols: list[str],
    *,
    round_to: int = 6,
) -> DataFrame:
    """(column, n_distinct, entropy_nats) per requested column: Shannon
    entropy of the value distribution (NULL is a category), all columns
    in ONE pass — an explode to (column, value-as-string) pairs, one
    count aggregate, per-column totals re-aggregated from the tiny count
    table. Entropy ranks columns by information content (0 = constant,
    ln(n_distinct) = uniform) — the profiling signal behind key
    discovery and feature triage. Terms decimal-summed per the
    determinism policy."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("_cv")
    ).select("_cv.column", "_cv.v")
    counts = pairs.groupBy("column", "v").agg(F.count(F.lit(1)).alias("n"))
    term = F.round(
        -(F.col("n") / F.col("_tot")) * F.log(F.col("n") / F.col("_tot")), 10
    ).cast("decimal(28,10)")
    return (
        # per-column totals ride a window over the counts table — the
        # old broadcast's build re-ran the explode + count aggregate
        counts.withColumn(
            "_tot", F.sum("n").over(Window.partitionBy("column"))
        )
        .groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(F.sum(term).cast("double"), round_to).alias("entropy_nats"),
        )
        .orderBy("column")
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """1-row (mi_nats, n): I(A;B) = Σ_ab p_ab·ln(p_ab/(p_a·p_b)) over
    OBSERVED cells only (zero cells contribute 0 to MI exactly, unlike
    chi-square — no identity trick needed). Same one-aggregate +
    windowed-marginals shape as chi_square_independence; per-cell terms
    rounded then decimal-summed. MI = 0 ⟺ independent; units are nats."""
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("o"))
    # marginals + total as windows over the bounded cells table (the
    # chi_square_independence shape): one input scan instead of four
    term = F.round(
        (F.col("o") / F.col("n"))
        * F.log(
            F.col("o").cast("double")
            * F.col("n")
            / (F.col("n_a") * F.col("n_b"))
        ),
        10,
    ).cast("decimal(28,10)")
    return (
        cells.withColumn("n_a", F.sum("o").over(Window.partitionBy(col_a)))
        .withColumn("n_b", F.sum("o").over(Window.partitionBy(col_b)))
        .withColumn("n", F.sum("o").over(Window.partitionBy()))
        .agg(
            F.round(F.sum(term).cast("double"), round_to).alias("mi_nats"),
            F.max("n").alias("n"),
        )
    )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    bin_col: F.Column,
    *,
    round_to: int = 6,
) -> DataFrame:
    """1-row (psi): sum of the per-bin terms, each rounded then carried
    as decimal(18,8) so the sum is exact and order-independent (the
    decimal-sum determinism policy)."""
    return psi_profile(ref, cur, bin_col).agg(
        F.round(
            F.sum(F.col("psi_term").cast("decimal(18,8)")).cast("double"), round_to
        ).alias("psi")
    )


def ab_test(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    decimal_scale: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Welch's unequal-variance two-sample test between ``group_a`` and
    ``group_b``: EXACTLY ONE row with per-arm counts/means, the mean
    difference, its standard error, and the z statistic (the
    experiment-analysis primitive; at the n of any A/B test worth
    running, Student-t ≡ z). A misconfigured arm cannot vanish
    silently: the row always materializes, with NULL statistics (and
    the true n_a/n_b, possibly 0) whenever either arm has fewer than
    two usable values — so the caller sees WHY there is no verdict
    instead of an empty frame.

    Scale shape: the entire stream reduces in ONE conditional hash
    aggregate to a single row of per-arm (n, Σx, Σx²) — decimal sums so
    partial-aggregation order cannot shift them — and the scalar
    algebra is a projection of that row. Nothing iterates, nothing
    collects; the test costs one scan.

    Variance is the computational form (Σx² − (Σx)²/n)/(n−1), exact up
    to the documented decimal rounding of per-row x and x²; every
    downstream double op is a fixed single expression, so an
    independent engine replays the statistic bit-for-bit before the
    final rounding.
    """
    dec = f"decimal(28,{decimal_scale})"
    x = F.col(value_col)
    g = F.col(group_col)

    def arm_aggs(which, suffix):
        cond = x.isNotNull() & (g == which)
        return [
            F.sum(cond.cast("long")).alias(f"n_{suffix}"),
            F.sum(F.when(cond, x).cast(dec)).cast("double").alias(f"sx_{suffix}"),
            F.sum(F.when(cond, x * x).cast(dec)).cast("double").alias(
                f"sxx_{suffix}"
            ),
        ]

    row = df.agg(*arm_aggs(group_a, "a"), *arm_aggs(group_b, "b"))
    mean_a = F.col("sx_a") / F.col("n_a")
    mean_b = F.col("sx_b") / F.col("n_b")
    var_a = (F.col("sxx_a") - F.col("sx_a") * F.col("sx_a") / F.col("n_a")) / (
        F.col("n_a") - 1
    )
    var_b = (F.col("sxx_b") - F.col("sx_b") * F.col("sx_b") / F.col("n_b")) / (
        F.col("n_b") - 1
    )
    se = F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    z = (mean_a - mean_b) / se
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2)
    return row.select(
        F.col("n_a"),
        F.col("n_b"),
        F.when(F.col("n_a") >= 1, F.round(mean_a, round_to)).alias("mean_a"),
        F.when(F.col("n_b") >= 1, F.round(mean_b, round_to)).alias("mean_b"),
        F.when(
            (F.col("n_a") >= 1) & (F.col("n_b") >= 1),
            F.round(mean_a - mean_b, round_to),
        ).alias("mean_diff"),
        F.when(ok, F.round(se, round_to)).alias("se"),
        F.when(ok & (se > 0), F.round(z, round_to)).alias("z_score"),
        F.when(ok & (se > 0), F.abs(z) > F.lit(1.959964)).alias(
            "significant_95"
        ),
    )


def benford_audit(
    df: DataFrame,
    *,
    value_col: str,
    decimal_scale: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """First-digit (Benford's law) distribution audit — the standard
    fabricated-numbers screen for financial/measurement columns: the
    observed share of each leading digit 1-9 of |value| against the
    Benford expectation log10(1 + 1/d), with the per-digit PEARSON
    chi-square component (observed - expected)²/expected on COUNTS —
    sum the column for the 8-degrees-of-freedom test statistic. All
    nine digits are always emitted: a digit with zero observations
    still carries its full component (omitting it would understate the
    statistic exactly when the distribution is most suspicious).

    Digit extraction avoids float log10 entirely: values scale to
    integer units (``decimal_scale``), and the leading digit is the
    first character of the BIGINT's decimal rendering — integer→string
    is identical in every engine, so the digit histogram is exact.
    Expectations are Python-computed double literals (one source for
    both engines). One hash aggregate over the column; the 9-row digit
    spine carries the scalar total via broadcast.

    Zero values carry no leading digit and are excluded (the share
    denominator is the nonzero count).
    """
    import math

    scaled = F.abs(
        F.round(F.col(value_col) * (10**decimal_scale), 0).cast("long")
    )
    # the leading digit of a positive integer is 1..9 by construction;
    # the clamp is an identity that PINS the grouping domain (the plan
    # auditor's bounded-key idiom), licensing the windowed total below
    digit = F.least(
        F.greatest(
            F.substring(scaled.cast("string"), 1, 1).cast("int"), F.lit(1)
        ),
        F.lit(9),
    )
    counts = (
        df.filter(F.col(value_col).isNotNull() & (scaled > 0))
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    counts = spine.join(counts, "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).alias("n")
    )
    expected = None
    for d in range(1, 10):
        e = F.lit(math.log10(1.0 + 1.0 / d))
        expected = (
            F.when(F.col("digit") == d, e)
            if expected is None
            else expected.when(F.col("digit") == d, e)
        )
    share = F.col("n") / F.col("_tot")
    exp_n = F.col("_exp") * F.col("_tot")
    return (
        # the 9-row total rides a window over the clamped-digit counts
        # instead of a broadcast whose build re-scanned the input
        counts.withColumn("_tot", F.sum("n").over(Window.partitionBy()))
        .withColumn("_exp", expected)
        .select(
            "digit",
            "n",
            F.round(share, round_to).alias("share"),
            F.round(F.col("_exp"), round_to).alias("expected"),
            F.round(
                (F.col("n") - exp_n) * (F.col("n") - exp_n) / exp_n,
                round_to,
            ).alias("chi2_component"),
        )
        .orderBy("digit")
    )


def ab_conversion_test(
    df: DataFrame,
    *,
    group_col: str,
    conversion_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Two-proportion z-test — the conversion-RATE companion to
    :func:`ab_test`'s mean test: one row with per-arm trials/
    conversions/rates, the rate difference, the pooled standard error

        se = sqrt(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ = (x_a+x_b)/(n_a+n_b)

    and z = (p_a − p_b)/se. Same robustness contract as ab_test: the
    row ALWAYS materializes (one conditional hash aggregate), with NULL
    statistics when either arm has no trials or the pooled rate is
    degenerate (0 or 1 — se would be 0). ``conversion_col`` is any
    boolean/0-1 expression-compatible column. Counts are exact
    integers, every double op a fixed expression — bit-replayable.
    """
    g = F.col(group_col)
    c = F.col(conversion_col).cast("long")

    def arm(which, s):
        cond = c.isNotNull() & (g == which)
        return [
            F.sum(cond.cast("long")).alias(f"n_{s}"),
            F.sum(F.when(cond, c)).alias(f"x_{s}"),
        ]

    row = df.agg(*arm(group_a, "a"), *arm(group_b, "b"))
    n_a, x_a = F.col("n_a").cast("double"), F.col("x_a").cast("double")
    n_b, x_b = F.col("n_b").cast("double"), F.col("x_b").cast("double")
    p_a, p_b = x_a / n_a, x_b / n_b
    pool = (x_a + x_b) / (n_a + n_b)
    se = F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / n_a + F.lit(1.0) / n_b)
    )
    z = (p_a - p_b) / se
    ok = (F.col("n_a") >= 1) & (F.col("n_b") >= 1)
    valid = ok & (se > 0)
    return row.select(
        F.col("n_a"),
        F.col("n_b"),
        F.col("x_a"),
        F.col("x_b"),
        F.when(ok, F.round(p_a, round_to)).alias("rate_a"),
        F.when(ok, F.round(p_b, round_to)).alias("rate_b"),
        F.when(ok, F.round(p_a - p_b, round_to)).alias("rate_diff"),
        F.when(valid, F.round(se, round_to)).alias("se"),
        F.when(valid, F.round(z, round_to)).alias("z_score"),
        F.when(valid, F.abs(z) > F.lit(1.959964)).alias("significant_95"),
    )


def cuped_adjust(
    df: DataFrame,
    *,
    key_col: str,
    metric_col: str,
    covariate_col: str,
    decimal_scale: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013) — the standard
    pre-experiment-covariate adjustment every experimentation platform
    applies before a t/z test: with θ = cov(X,Y)/var(X) estimated from
    the data, the adjusted metric Y − θ(X − E[X]) has the same mean as Y
    but variance var(Y)·(1 − ρ²), shrinking required sample sizes by the
    squared correlation with the pre-period covariate.

    Input is ALREADY one row per unit (compose with a groupBy upstream:
    per-user pre-period X, experiment-period Y). Shape: ONE conditional
    hash aggregate collapses the table to a single row of decimal sums
    (n, Σx, Σy, Σxy, Σx², Σy²) — partial-aggregation order cannot shift
    them — and θ, means, variances, and the reduction factor are a pure
    projection of that row. Nothing iterates, nothing collects. Returns
    EXACTLY ONE row: (n, theta, mean_y, var_y, var_cuped, reduction);
    rows with NULL metric or covariate are excluded from the moments;
    var/θ are NULL when n < 2 or var(X) = 0 (constant covariate), in
    which case reduction is NULL too — the caller sees why there is no
    adjustment instead of a division blowing up.

    Determinism: population variances from the computational identities
    (Σy² − (Σy)²/n)/n etc. over decimal sums; every double op is one
    fixed expression, replayed exactly by the SQL oracle.
    """
    dec = f"decimal(28,{decimal_scale})"
    x = F.col(covariate_col)
    y = F.col(metric_col)
    ok = x.isNotNull() & y.isNotNull()
    row = df.agg(
        # coalesce: F.sum over zero rows is NULL, but the one-row contract
        # promises the caller sees WHY there is no adjustment — n=0, not an
        # ambiguous NULL count (ADVICE r5)
        F.coalesce(F.sum(ok.cast("long")), F.lit(0)).alias("n"),
        F.sum(F.when(ok, x).cast(dec)).cast("double").alias("sx"),
        F.sum(F.when(ok, y).cast(dec)).cast("double").alias("sy"),
        F.sum(F.when(ok, x * y).cast(dec)).cast("double").alias("sxy"),
        F.sum(F.when(ok, x * x).cast(dec)).cast("double").alias("sxx"),
        F.sum(F.when(ok, y * y).cast(dec)).cast("double").alias("syy"),
    )
    n = F.col("n")
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / n
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / n
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / n
    theta = cov / var_x
    # var(Y - θX) = var(Y) - cov²/var(X)  (θ plugged in)
    var_adj = var_y - cov * cov / var_x
    valid = (n >= 2) & (var_x > 0)
    return row.select(
        n,
        F.when(valid, F.round(theta, round_to)).alias("theta"),
        F.when(n >= 1, F.round(F.col("sy") / n, round_to)).alias("mean_y"),
        F.when(n >= 2, F.round(var_y, round_to)).alias("var_y"),
        F.when(valid, F.round(var_adj, round_to)).alias("var_cuped"),
        F.when(
            valid & (var_y > 0),
            F.round(F.lit(1.0) - var_adj / var_y, round_to),
        ).alias("reduction"),
    )


def cuped_ab_test(
    df: DataFrame,
    *,
    group_col: str,
    metric_col: str,
    covariate_col: str,
    group_a,
    group_b,
    decimal_scale: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """The production experiment-analysis pipeline: CUPED-adjust the
    per-unit metric with the POOLED θ (standard practice — estimating θ
    per arm would bias the contrast), then run Welch's z on the adjusted
    metric between the two arms via :func:`ab_test`. Input is one row
    per unit with (group, metric, covariate); rows with NULL metric or
    covariate contribute to neither θ nor the test.

    Scale shape: one pooled decimal-moment aggregate (a 1-row broadcast
    carrying θ and the covariate mean, each rounded so the adjusted
    metric is a fixed replayable expression), one projection, then
    ab_test's single conditional aggregate — three passes total, no
    shuffle wider than a 1-row broadcast. Degenerate inputs inherit both
    contracts: constant covariate → θ is NULL → adjusted metric falls
    back to the RAW metric (CUPED with no usable covariate is a no-op,
    not a NULL-out), and thin arms get ab_test's NULL-stats row.
    """
    dec = f"decimal(28,{decimal_scale})"
    x = F.col(covariate_col)
    y = F.col(metric_col)
    ok = x.isNotNull() & y.isNotNull() & F.col(group_col).isin(
        [group_a, group_b]
    )
    m = df.agg(
        F.sum(ok.cast("long")).alias("_n"),
        F.sum(F.when(ok, x).cast(dec)).cast("double").alias("_sx"),
        F.sum(F.when(ok, y).cast(dec)).cast("double").alias("_sy"),
        F.sum(F.when(ok, x * y).cast(dec)).cast("double").alias("_sxy"),
        F.sum(F.when(ok, x * x).cast(dec)).cast("double").alias("_sxx"),
    )
    n = F.col("_n")
    var_x = (F.col("_sxx") - F.col("_sx") * F.col("_sx") / n) / n
    cov = (F.col("_sxy") - F.col("_sx") * F.col("_sy") / n) / n
    stats = m.select(
        F.when((n >= 2) & (var_x > 0), F.round(cov / var_x, 9)).alias(
            "_theta"
        ),
        F.when(n >= 1, F.round(F.col("_sx") / n, 9)).alias("_xbar"),
    )
    adjusted = df.crossJoin(F.broadcast(stats)).withColumn(
        "_y_adj",
        F.when(
            x.isNotNull() & y.isNotNull() & F.col("_theta").isNotNull(),
            y - F.col("_theta") * (x - F.col("_xbar")),
        ).otherwise(F.when(x.isNotNull() & y.isNotNull(), y)),
    )
    return ab_test(
        adjusted,
        group_col=group_col,
        value_col="_y_adj",
        group_a=group_a,
        group_b=group_b,
        decimal_scale=decimal_scale,
        round_to=round_to,
    )


def cusum_changepoint(
    series: DataFrame,
    *,
    time_col: str,
    value_col: str,
    value_scale: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """CUSUM change-point estimate over a PRE-AGGREGATED series (one
    row per time bucket — the caller aggregates raw data to buckets
    first, so this table is bounded by the time range, not data size;
    the page-Hinkley/CUSUM chart every pipeline monitor draws).

    S_t = Σ_{i≤t} (x_i − x̄); the change-point estimate is the bucket
    maximizing |S_t| (ties → earliest bucket). Returns ONE row
    (n_buckets, cp_time, s_abs_max, mean).

    Exactness: the argmax is computed on  n·S_t = n·C_t − t·T  (C_t
    running sum, T total, all decimal — x is rounded to
    ``value_scale`` once on entry, the raw-data rounding class), so
    the maximizer is integer-exact with NO float comparison anywhere;
    doubles appear only in the reported s_abs_max = max|n·S_t|/n and
    mean = T/n, each one division rounded once. The ordering window
    runs over the bucketed
    table (aggregated input by contract — the plan-audit global-window
    rule's sanctioned case)."""
    dec = f"decimal(38,{value_scale})"
    x = F.round(F.col(value_col), value_scale).cast(dec)
    s = series.filter(
        F.col(time_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(F.col(time_col).alias("t"), x.alias("x"))
    w = Window.orderBy("t")
    # n_buckets/tt ride full-frame windows on the SAME sorted pass that
    # computes the running sum — the old 1-row broadcast re-evaluated
    # the pre-aggregated series lineage (a second scan of the raw data)
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = (
        s.withColumn(
            "ct", F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_buckets", F.count(F.lit(1)).over(wfull))
        .withColumn("tt", F.sum("x").over(wfull))
    )
    ns = (
        F.col("n_buckets").cast(dec) * F.col("ct")
        - F.col("rn").cast(dec) * F.col("tt")
    )
    top = (
        cum
        .select("t", "n_buckets", "tt", F.abs(ns).alias("absns"))
        .orderBy(F.desc("absns"), F.asc("t"))
        .limit(1)
    )
    return top.select(
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("t").alias("cp_time"),
        F.round(
            F.col("absns").cast("double") / F.col("n_buckets"), round_to
        ).alias("s_abs_max"),
        F.round(
            F.col("tt").cast("double") / F.col("n_buckets"), round_to
        ).alias("mean"),
    )


def theil_sen_trend(
    series: DataFrame,
    *,
    time_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Theil–Sen robust trend over a PRE-AGGREGATED series (the
    cusum_changepoint contract: one row per time bucket, bounded by
    the time range — so the O(buckets²) pairwise self-join is bounded
    by calendar size, never data size; ~73k pairs for a year of days).

    slope = median of pairwise slopes (x_j − x_i)/(t_j − t_i), t_i<t_j;
    intercept = median of (x_i − slope·t_i) — the estimator that
    shrugs off the outlier days OLS would chase (up to ~29%
    contamination). Returns ONE row
    (n_buckets, n_pairs, slope, intercept).

    ``time_col`` must be numeric (the caller converts dates to day
    numbers — keeps the slope's unit explicit). Exact medians
    (Spark `percentile` ≡ DuckDB `quantile_cont`, the equivalence the
    winsorize gate certifies); each slope is one double division of
    exact inputs, so both engines take the median of identical
    doubles."""
    # s feeds both sides of the pairwise self-join AND the residual
    # pass, and m (the O(buckets²) median) feeds both the residual
    # broadcast and the final row — persist them (calendar-bounded and
    # 1 row respectively) so the upstream series aggregation and the
    # pairwise join each evaluate once, not once per consumer
    from assignment_etl_spark.caching import scoped_persist

    s = scoped_persist(series.filter(
        F.col(time_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(time_col).cast("double").alias("t"),
        F.col(value_col).cast("double").alias("x"),
    ))
    a = s.select(F.col("t").alias("t1"), F.col("x").alias("x1"))
    b = s.select(F.col("t").alias("t2"), F.col("x").alias("x2"))
    pairs = a.join(b, F.col("t1") < F.col("t2")).select(
        ((F.col("x2") - F.col("x1")) / (F.col("t2") - F.col("t1"))).alias(
            "slope"
        )
    )
    m = scoped_persist(pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile("slope", F.lit(0.5)).alias("m_slope"),
    ))
    resid = s.crossJoin(F.broadcast(m)).select(
        (F.col("x") - F.col("m_slope") * F.col("t")).alias("r"),
    )
    # global aggregates (never zero rows): an empty series yields the
    # drift-family degenerate ONE-row contract (n_buckets=0, n_pairs=0,
    # NULL slope/intercept) instead of vanishing — ADVICE r6: the old
    # groupBy over an empty resid returned zero rows, unlike
    # ks_two_sample/cusum_changepoint/cuped_adjust
    ic = resid.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.percentile("r", F.lit(0.5)).alias("m_intercept"),
    )
    return m.crossJoin(F.broadcast(ic)).select(
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round("m_slope", round_to).alias("slope"),
        F.round("m_intercept", round_to).alias("intercept"),
    )
