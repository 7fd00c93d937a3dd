"""Robust outliers: median/MAD math, MAD=0 groups, NULL handling."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ops.outliers import flag_outliers, group_robust_stats


@pytest.fixture(scope="module")
def data(spark):
    rows = (
        [("a", float(x)) for x in [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]]
        + [("b", 5.0)] * 10  # constant group: MAD = 0
        + [("c", None), ("c", 1.0), ("c", 2.0), ("c", 3.0)]
    )
    return spark.createDataFrame(rows, "g string, v double")


def test_stats(data):
    stats = {r.g: r for r in group_robust_stats(data, value_col="v", by=["g"]).collect()}
    assert stats["a"].median == 5.5
    assert stats["a"].mad == 2.5  # deviations 0.5..4.5 + 994.5; median 2.5
    assert stats["b"].mad == 0.0
    assert stats["c"].n == 3  # NULLs not counted


def test_flagging(data):
    out = flag_outliers(data, value_col="v", by=["g"], k=3.5)
    a = {r.v: r for r in out.filter("g = 'a'").collect()}
    assert a[1000.0].is_outlier
    assert not a[5.0].is_outlier
    # 1 is z = -4.5/(1.4826*2.5) = -1.21 -> inlier
    assert not a[1.0].is_outlier


def test_mad_zero_group_yields_null_not_verdict(data):
    b = flag_outliers(data, value_col="v", by=["g"]).filter("g = 'b'").collect()
    assert all(r.robust_z is None and r.is_outlier is None for r in b)


def test_null_value_not_flagged(data):
    c = flag_outliers(data, value_col="v", by=["g"]).filter("g = 'c' and v is null")
    r = c.first()
    assert r.robust_z is None and r.is_outlier is None


def test_broadcast_plan(data):
    out = flag_outliers(data, value_col="v", by=["g"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_approx_mode_runs(data):
    out = flag_outliers(data, value_col="v", by=["g"], exact=False)
    a = {r.v: r.is_outlier for r in out.filter("g = 'a'").collect()}
    assert a[1000.0]  # the gross outlier survives approximation


def test_null_group_key_rows_are_kept_and_flagged(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0)]
        + [(None, float(x)) for x in [1, 2, 3, 4, 5, 200]],
        "g string, v double",
    )
    out = flag_outliers(df, value_col="v", by=["g"], k=3.5)
    assert out.count() == 9  # annotation operator: no row loss
    nulls = {r.v: r.is_outlier for r in out.filter("g is null").collect()}
    assert nulls[200.0] is True  # NULL is a group of its own, stats apply
    assert nulls[3.0] is False
