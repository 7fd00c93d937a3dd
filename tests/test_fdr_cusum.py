"""ext/fdr.py and ext/drift.cusum_changepoint: brute-force replays,
the step-up rescue property, degenerate segments, planted change."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.drift import cusum_changepoint
from assignment_etl_spark.ext.fdr import bh_adjust, segment_proportion_tests


def test_segment_tests_match_brute(spark):
    rng = np.random.RandomState(31)
    rows = []
    rates = {"a": (0.5, 0.5), "b": (0.7, 0.3), "c": (0.5, 0.52)}
    for seg, (ra, rb) in rates.items():
        for arm, r in ((1, ra), (0, rb)):
            for _ in range(200):
                rows.append((seg, arm, bool(rng.rand() < r)))
    df = spark.createDataFrame(rows, "seg string, arm int, succ boolean")
    out = segment_proportion_tests(
        df, segment_col="seg", group_col="arm",
        success=F.col("succ"), group_a=1, group_b=0,
    ).collect()
    assert len(out) == 3
    for r in out:
        xa = sum(1 for s, a, y in rows if s == r.segment and a == 1 and y)
        xb = sum(1 for s, a, y in rows if s == r.segment and a == 0 and y)
        assert (r.x_a, r.x_b, r.n_a, r.n_b) == (xa, xb, 200, 200)
        pool = (xa + xb) / 400
        z = (xa / 200 - xb / 200) / math.sqrt(pool * (1 - pool) * (2 / 200))
        assert r.z == pytest.approx(z, abs=1e-6)
        # A&S polynomial vs libm erfc: |err| < 1.5e-7 by construction
        assert r.p_value == pytest.approx(
            math.erfc(abs(z) / math.sqrt(2)), abs=2e-7
        )


def test_bh_stepup_rescue_and_rejection_set(spark):
    # classic step-up case: p2 is above its own line but p3 passes,
    # so ranks 1..3 are ALL rejected (q=0.2, m=4):
    # criticals = .05 .10 .15 .20 ; ps = .01 .12 .14 .90
    rows = [("s1", 0.01), ("s2", 0.12), ("s3", 0.14), ("s4", 0.90)]
    df = spark.createDataFrame(rows, "segment string, p_value double")
    out = {r.segment: r for r in bh_adjust(df, q=0.2).collect()}
    assert [out[s].rejected for s in ("s1", "s2", "s3", "s4")] == [
        True, True, True, False,
    ]
    assert out["s2"].p_value > out["s2"].bh_critical  # rescued anyway


def test_bh_null_p_unranked_never_rejected(spark):
    rows = [("s1", 0.001), ("s2", None), ("s3", 0.5)]
    df = spark.createDataFrame(rows, "segment string, p_value double")
    out = {r.segment: r for r in bh_adjust(df, q=0.05).collect()}
    assert out["s2"].bh_rank is None and out["s2"].rejected is False
    # m counts only non-NULL tests: critical for rank1 = 0.05/2
    assert out["s1"].bh_critical == pytest.approx(0.025)
    assert out["s1"].rejected is True


def test_bh_all_null_and_q_guard(spark):
    df = spark.createDataFrame(
        [("s1", None)], "segment string, p_value double"
    )
    out = bh_adjust(df).collect()
    assert len(out) == 1 and out[0].rejected is False
    with pytest.raises(ValueError, match="q"):
        bh_adjust(df, q=0.0)


def test_cusum_matches_brute_and_finds_planted_shift(spark):
    rng = np.random.RandomState(7)
    # planted mean shift at bucket 60 of 100
    xs = np.concatenate([rng.poisson(50, 60), rng.poisson(80, 40)])
    rows = [(int(t), int(x)) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "t long, x long")
    row = cusum_changepoint(df, time_col="t", value_col="x").collect()[0]
    n = len(xs)
    cum = np.cumsum(xs)
    ns = n * cum - np.arange(1, n + 1) * cum[-1]
    best = int(np.lexsort((np.arange(n), -np.abs(ns)))[0])
    assert row.n_buckets == n
    assert row.cp_time == best
    assert row.s_abs_max == pytest.approx(abs(ns[best]) / n, abs=1e-6)
    assert row.mean == pytest.approx(xs.mean(), abs=1e-6)
    # the planted change at index 59 (0-based last pre-shift bucket)
    assert abs(row.cp_time - 59) <= 3


def test_cusum_constant_series_and_null_filter(spark):
    rows = [(1, 5.0), (2, 5.0), (3, 5.0), (None, 9.0), (4, None)]
    df = spark.createDataFrame(rows, "t int, x double")
    row = cusum_changepoint(df, time_col="t", value_col="x").collect()[0]
    assert row.n_buckets == 3
    assert row.s_abs_max == 0.0  # no drift in a constant series
    assert row.cp_time == 1  # tie at 0 everywhere -> earliest bucket


def test_theil_sen_matches_brute_and_resists_outliers(spark):
    from assignment_etl_spark.ext.drift import theil_sen_trend

    rng = np.random.RandomState(9)
    t = np.arange(50, dtype=float)
    x = 3.0 * t + 10 + rng.randn(50).round(2)
    x[[5, 17, 40]] = [500.0, -300.0, 999.0]  # gross outliers
    rows = [(float(a), float(b)) for a, b in zip(t, x)]
    df = spark.createDataFrame(rows, "t double, x double")
    row = theil_sen_trend(df, time_col="t", value_col="x").collect()[0]
    slopes = sorted(
        (x[j] - x[i]) / (t[j] - t[i])
        for i in range(50) for j in range(i + 1, 50)
    )
    m = float(np.median(slopes))
    assert row.n_pairs == 50 * 49 // 2 and row.n_buckets == 50
    assert row.slope == pytest.approx(m, abs=1e-6)
    assert row.intercept == pytest.approx(
        float(np.median(x - m * t)), abs=1e-6
    )
    # robustness: three gross outliers barely move the slope
    assert abs(row.slope - 3.0) < 0.05


def test_theil_sen_null_filter(spark):
    from assignment_etl_spark.ext.drift import theil_sen_trend

    rows = [(1.0, 1.0), (2.0, 2.0), (None, 9.0), (3.0, None), (3.0, 3.0)]
    df = spark.createDataFrame(rows, "t double, x double")
    row = theil_sen_trend(df, time_col="t", value_col="x").collect()[0]
    assert row.n_buckets == 3 and row.slope == pytest.approx(1.0)


def test_theil_sen_empty_input_one_row(spark):
    """Empty series follows the drift-family degenerate contract: ONE
    row with n_buckets=0, n_pairs=0, NULL slope/intercept (ADVICE r6:
    the old groupBy path returned zero rows)."""
    from assignment_etl_spark.ext.drift import theil_sen_trend

    empty = spark.createDataFrame([], "t double, x double")
    rows = theil_sen_trend(empty, time_col="t", value_col="x").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_buckets, r.n_pairs, r.slope, r.intercept) == (0, 0, None, None)
    # single bucket: no pairs, NULL slope, intercept = median residual
    # is NULL too (r = x - NULL*t)
    one = spark.createDataFrame([(1.0, 5.0)], "t double, x double")
    r1 = theil_sen_trend(one, time_col="t", value_col="x").collect()
    assert len(r1) == 1
    assert (r1[0].n_buckets, r1[0].n_pairs, r1[0].slope) == (1, 0, None)
