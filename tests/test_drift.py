"""PSI drift detection (ext/drift.py): zero drift on identical data,
known-shift direction, clamping, one-sided bins."""

import math

from pyspark.sql import functions as F

from assignment_etl_spark.ext.drift import bin_shares, fixed_width_bin, psi, psi_profile


def _nums(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "x double")


def test_identical_snapshots_zero_psi(spark):
    df = _nums(spark, range(100))
    b = fixed_width_bin("x", lo=0, hi=100, n_bins=10)
    assert psi(df, df, b).first().psi == 0.0


def test_shift_detected(spark):
    ref = _nums(spark, range(100))            # uniform 0..99
    cur = _nums(spark, [v % 50 for v in range(100)])  # mass moved to lower half
    b = fixed_width_bin("x", lo=0, hi=100, n_bins=10)
    got = psi(ref, cur, b).first().psi
    # analytic: 5 bins go 0.1→0.2 (term 0.2*ln2 each... no: (0.2-0.1)*ln(2))
    # and 5 bins go 0.1→~0: large PSI, certainly > 0.25
    assert got > 0.25


def test_clamping_keeps_all_rows(spark):
    ref = _nums(spark, [-50, 0, 50, 150])
    b = fixed_width_bin("x", lo=0, hi=100, n_bins=4)
    shares = {r.bin: r.n for r in bin_shares(ref, b).collect()}
    assert shares == {0: 2, 2: 1, 3: 1}  # -50 clamps to 0, 150 clamps to 3


def test_one_sided_bin_contributes(spark):
    ref = _nums(spark, [5] * 10)
    cur = _nums(spark, [5] * 9 + [95])
    b = fixed_width_bin("x", lo=0, hi=100, n_bins=10)
    prof = {r.bin: r for r in psi_profile(ref, cur, b).collect()}
    assert prof[9].n_ref == 0 and prof[9].n_cur == 1
    # bin 9: (0.1 - 0) * ln(0.1 / 1e-6) > 1 — the EPS floor keeps it finite
    assert prof[9].psi_term > 1.0
    assert math.isfinite(prof[9].psi_term)


def test_categorical_drift_via_column_bin(spark):
    ref = spark.createDataFrame([("a",)] * 8 + [("b",)] * 2, "k string")
    cur = spark.createDataFrame([("a",)] * 2 + [("b",)] * 8, "k string")
    got = psi(ref, cur, F.col("k")).first().psi
    # symmetric swap: 2 * (0.6 * ln(4)) ≈ 1.663553
    assert abs(got - 2 * 0.6 * math.log(4)) < 1e-5


def test_quantiles_from_histogram_uniform(spark):
    from assignment_etl_spark.ext.drift import (
        bin_counts,
        fixed_width_bin,
        quantiles_from_histogram,
    )

    df = _nums(spark, range(1000))  # uniform 0..999
    counts = bin_counts(df, fixed_width_bin("x", lo=0, hi=1000, n_bins=100))
    got = {
        r.q: r.est
        for r in quantiles_from_histogram(
            counts, lo=0, hi=1000, n_bins=100, qs=[0.0, 0.25, 0.5, 0.9, 1.0]
        ).collect()
    }
    # uniform data: estimates within one bin width (10) of the exact value
    assert got[0.0] == 0.0
    assert abs(got[0.25] - 249.75) <= 10
    assert abs(got[0.5] - 499.5) <= 10
    assert abs(got[0.9] - 899.1) <= 10
    assert abs(got[1.0] - 999.0) <= 10


def test_quantiles_histogram_merge_invariance(spark):
    from assignment_etl_spark.ext.drift import (
        bin_counts,
        fixed_width_bin,
        quantiles_from_histogram,
    )

    a = _nums(spark, range(0, 300))
    b = _nums(spark, range(300, 1000))
    bcol = fixed_width_bin("x", lo=0, hi=1000, n_bins=50)
    merged = (
        bin_counts(a, bcol)
        .unionByName(bin_counts(b, bcol))
        .groupBy("bin")
        .agg(F.sum("n").alias("n"))
    )
    full = bin_counts(_nums(spark, range(1000)), bcol)
    qa = quantiles_from_histogram(merged, lo=0, hi=1000, n_bins=50, qs=[0.5, 0.95])
    qb = quantiles_from_histogram(full, lo=0, hi=1000, n_bins=50, qs=[0.5, 0.95])
    assert sorted(map(tuple, qa.collect())) == sorted(map(tuple, qb.collect()))


def test_ab_test_welch(spark):
    from assignment_etl_spark.ext.drift import ab_test

    rows = [("A", 1.0), ("A", 2.0), ("A", 3.0), ("C", 99.0),
            ("B", 2.0), ("B", 4.0), ("B", 6.0), ("B", 8.0), ("B", None)]
    df = spark.createDataFrame(rows, "variant string, value double")
    r = ab_test(
        df, group_col="variant", value_col="value", group_a="A", group_b="B"
    ).collect()[0]
    # A: n=3 mean=2 var=1; B: n=4 mean=5 var=20/3; C and NULLs excluded
    assert (r.n_a, r.n_b) == (3, 4)
    assert (r.mean_a, r.mean_b, r.mean_diff) == (2.0, 5.0, -3.0)
    assert abs(r.se - (1 / 3 + (20 / 3) / 4) ** 0.5) < 1e-6   # = sqrt(2)
    assert abs(r.z_score - (-3 / 2**0.5)) < 1e-6
    assert bool(r.significant_95) is True


def test_benford_audit(spark):
    import math

    from assignment_etl_spark.ext.drift import benford_audit

    rows = [(v,) for v in [1.23, 12.0, 199.0, 2.5, 31.0, 0.0, None, -4.2, 9.99]]
    df = spark.createDataFrame(rows, "v double")
    out = {r.digit: r for r in benford_audit(df, value_col="v").collect()}
    # zeros and NULLs excluded; 7 nonzero values
    assert sum(r.n for r in out.values()) == 7
    assert out[1].n == 3 and out[2].n == 1 and out[3].n == 1
    assert out[4].n == 1 and out[9].n == 1
    assert abs(out[1].expected - round(math.log10(2), 6)) < 1e-9
    assert all(r.chi2_component >= 0 for r in out.values())


def test_ab_conversion_test(spark):
    from assignment_etl_spark.ext.drift import ab_conversion_test

    # A: 8/10 convert; B: 2/10 convert -> clearly significant
    rows = [("A", 1)] * 8 + [("A", 0)] * 2 + [("B", 1)] * 2 + [("B", 0)] * 8
    df = spark.createDataFrame(rows, "variant string, converted int")
    r = ab_conversion_test(
        df, group_col="variant", conversion_col="converted",
        group_a="A", group_b="B",
    ).collect()[0]
    assert (r.n_a, r.x_a, r.n_b, r.x_b) == (10, 8, 10, 2)
    assert (r.rate_a, r.rate_b, r.rate_diff) == (0.8, 0.2, 0.6)
    # pooled p=0.5 -> se = sqrt(0.25*0.2) = sqrt(0.05)
    assert abs(r.se - 0.05**0.5) < 1e-6
    assert bool(r.significant_95) is True

    # degenerate pooled rate (all convert) -> NULL stats, row still there
    allc = spark.createDataFrame(
        [("A", 1), ("A", 1), ("B", 1)], "variant string, converted int"
    )
    r2 = ab_conversion_test(
        allc, group_col="variant", conversion_col="converted",
        group_a="A", group_b="B",
    ).collect()[0]
    assert r2.se is None and r2.z_score is None
    assert (r2.rate_a, r2.rate_b) == (1.0, 1.0)


def test_cuped_adjust(spark):
    import pytest

    from assignment_etl_spark.ext.drift import cuped_adjust

    # y strongly correlated with x -> large reduction
    rows = [(i, float(i % 17), float(i % 17) * 2.0 + (i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, "uid long, x double, y double")
    r = cuped_adjust(df, key_col="uid", metric_col="y", covariate_col="x").collect()[0]
    assert r.n == 60
    assert r.theta == pytest.approx(2.0, abs=0.1)
    assert r.var_cuped < r.var_y
    assert r.reduction > 0.9

    # numpy golden on the same data
    import numpy as np

    x = np.array([float(i % 17) for i in range(60)])
    y = np.array([float(i % 17) * 2.0 + (i % 3) for i in range(60)])
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    var_adj = np.var(y) - np.cov(x, y, bias=True)[0, 1] ** 2 / np.var(x)
    assert r.theta == pytest.approx(theta, abs=1e-4)
    assert r.var_cuped == pytest.approx(var_adj, abs=1e-3)

    # constant covariate -> no adjustment, NULL stats (never a div-by-zero)
    const = spark.createDataFrame(
        [(i, 1.0, float(i)) for i in range(10)], "uid long, x double, y double"
    )
    r2 = cuped_adjust(const, key_col="uid", metric_col="y", covariate_col="x").collect()[0]
    assert r2.n == 10 and r2.theta is None and r2.var_cuped is None and r2.reduction is None
    assert r2.var_y is not None

    # NULL rows excluded from moments but counted out of n
    some_null = spark.createDataFrame(
        [(1, None, 5.0), (2, 2.0, 4.0), (3, 3.0, 6.0), (4, 4.0, 8.0)],
        "uid long, x double, y double",
    )
    r3 = cuped_adjust(some_null, key_col="uid", metric_col="y", covariate_col="x").collect()[0]
    assert r3.n == 3

    # empty input: the one-row contract reports n=0, never NULL (ADVICE r5)
    empty = spark.createDataFrame([], "uid long, x double, y double")
    r4 = cuped_adjust(empty, key_col="uid", metric_col="y", covariate_col="x").collect()[0]
    assert r4.n == 0 and r4.theta is None and r4.mean_y is None

    # all-NULL covariate behaves the same: n=0, not NULL
    all_null = spark.createDataFrame(
        [(1, None, 5.0), (2, None, 4.0)], "uid long, x double, y double"
    )
    r5 = cuped_adjust(all_null, key_col="uid", metric_col="y", covariate_col="x").collect()[0]
    assert r5.n == 0


def test_cuped_ab_test(spark):
    import pytest

    from assignment_etl_spark.ext.drift import ab_test, cuped_ab_test

    # covariate strongly predicts the metric; a small true lift on arm B
    rows = [
        (i, "A" if i % 2 == 0 else "B",
         float(i % 23),
         float(i % 23) * 3.0 + (1.0 if i % 2 else 0.0) + (i % 5) * 0.1)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "uid long, variant string, x double, y double")
    raw = ab_test(df, group_col="variant", value_col="y",
                  group_a="A", group_b="B").collect()[0]
    adj = cuped_ab_test(df, group_col="variant", metric_col="y",
                        covariate_col="x", group_a="A", group_b="B").collect()[0]
    # 200/23 is not integral, so the arms' covariate means differ — the
    # raw contrast is biased by that imbalance while CUPED removes it:
    # the adjusted estimate lands on the TRUE lift (-1.0) with a much
    # smaller standard error
    assert adj.n_a == raw.n_a and adj.n_b == raw.n_b
    assert adj.mean_diff == pytest.approx(-1.0, abs=0.05)
    assert abs(adj.mean_diff - -1.0) < abs(raw.mean_diff - -1.0)
    assert adj.se < raw.se * 0.2
    assert adj.significant_95  # the adjusted test detects the true lift

    # constant covariate -> theta NULL -> adjusted test IS the raw test
    const = df.withColumn("x", df.x * 0)
    fallback = cuped_ab_test(const, group_col="variant", metric_col="y",
                             covariate_col="x", group_a="A", group_b="B").collect()[0]
    raw2 = ab_test(const, group_col="variant", value_col="y",
                   group_a="A", group_b="B").collect()[0]
    assert fallback == raw2
