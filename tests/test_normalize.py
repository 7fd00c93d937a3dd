"""Feature normalization (ops/normalize.py): hand-checked scaling per
method, grouped stats, and degenerate spans."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ops.normalize import normalize, quantile_bin


@pytest.fixture(scope="module")
def feats(spark):
    return spark.createDataFrame(
        [("a", 0.0), ("a", 10.0), ("a", 20.0), ("b", 5.0), ("b", 5.0)],
        "grp string, x double",
    )


def test_zscore_grouped(feats):
    out = {(r.grp, r.x): r.x_norm for r in
           normalize(feats, "x", method="zscore", group_by=["grp"]).collect()}
    # group a: mean 10, stddev_samp 10 -> z = -1, 0, 1
    assert out[("a", 0.0)] == pytest.approx(-1.0)
    assert out[("a", 10.0)] == pytest.approx(0.0)
    assert out[("a", 20.0)] == pytest.approx(1.0)
    # group b: zero variance -> NULL, not inf
    assert out[("b", 5.0)] is None


def test_minmax(feats):
    out = {(r.grp, r.x): r.x_norm for r in
           normalize(feats, "x", method="minmax", group_by=["grp"]).collect()}
    assert out[("a", 0.0)] == 0.0 and out[("a", 20.0)] == 1.0
    assert out[("a", 10.0)] == pytest.approx(0.5)
    assert out[("b", 5.0)] is None  # zero span


def test_robust_global(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], "x double")
    out = normalize(df, "x", method="robust").collect()
    by_x = {r.x: r.x_norm for r in out}
    # median 50.5, IQR = 75.25 - 25.75 = 49.5
    assert by_x[50.5] if 50.5 in by_x else True
    assert by_x[100.0] == pytest.approx((100 - 50.5) / 49.5)
    assert by_x[1.0] == pytest.approx((1 - 50.5) / 49.5)


def test_bad_method(feats):
    with pytest.raises(ValueError):
        normalize(feats, "x", method="log")


def test_quantile_bin_equi_depth(spark):
    df = spark.createDataFrame([(i, float(i % 50)) for i in range(100)], "id long, x double")
    out = quantile_bin(df, "x", 4, id_col="id")
    sizes = {r.x_bin: r.n for r in out.groupBy("x_bin").agg(
        F.count("id").alias("n")
    ).collect()}
    assert sizes == {0: 25, 1: 25, 2: 25, 3: 25}
    # ties split deterministically by id: rerun gives identical assignment
    a = {(r.id, r.x_bin) for r in out.collect()}
    b = {(r.id, r.x_bin) for r in quantile_bin(df, "x", 4, id_col="id").collect()}
    assert a == b


def test_quantile_bin_nulls_and_groups(spark):
    df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", None), (3, "g", 1.0), (4, "h", 9.0)],
        "id long, grp string, x double",
    )
    out = {r.id: r.x_bin for r in quantile_bin(
        df, "x", 2, id_col="id", group_by=["grp"]
    ).collect()}
    assert out[2] is None          # null value -> null bucket
    assert out[3] == 0 and out[1] == 1  # within-group ordering
    assert out[4] == 0             # singleton group -> bucket 0
