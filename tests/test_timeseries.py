"""Resample + gapfill: bucket math, grid densification, fill methods."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ops.timeseries import (
    bucket_ts,
    gapfill,
    resample,
    rolling_aggregate,
)


def test_rolling_aggregate_hand_checked(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u", base, 1.0),
        ("u", base + dt.timedelta(seconds=600), 2.0),   # within 900s of #1
        ("u", base + dt.timedelta(seconds=1200), 4.0),  # within 900s of #2 only
        ("u", base + dt.timedelta(seconds=5000), 8.0),  # alone
        ("v", base + dt.timedelta(seconds=600), 100.0), # other key untouched
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = rolling_aggregate(
        df, key_col="k", ts_col="ts", value_col="v", window_seconds=900
    )
    got = {
        (r.k, r.ts): (r.w_count, float(r.w_sum), r.w_min, r.w_max, r.w_avg)
        for r in out.collect()
    }
    assert got[("u", base)] == (1, 1.0, 1.0, 1.0, 1.0)
    assert got[("u", base + dt.timedelta(seconds=600))] == (2, 3.0, 1.0, 2.0, 1.5)
    assert got[("u", base + dt.timedelta(seconds=1200))] == (2, 6.0, 2.0, 4.0, 3.0)
    assert got[("u", base + dt.timedelta(seconds=5000))] == (1, 8.0, 8.0, 8.0, 8.0)
    assert got[("v", base + dt.timedelta(seconds=600))][0] == 1


def test_rolling_aggregate_duplicate_timestamps_are_peers(spark):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("u", base, 1.0), ("u", base, 5.0)], "k string, ts timestamp, v double"
    )
    out = rolling_aggregate(
        df, key_col="k", ts_col="ts", value_col="v", window_seconds=60
    ).collect()
    # RANGE frame includes peers: both rows see both values
    assert all(r.w_count == 2 and float(r.w_sum) == 6.0 for r in out)

H = 3600


def _ts(hour, minute=0):
    return dt.datetime(2024, 1, 1, hour, minute)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("a", _ts(0, 10), 10.0),
        ("a", _ts(0, 50), 20.0),  # same bucket as above -> avg 15
        ("a", _ts(3, 0), 45.0),  # buckets 1,2 are gaps
        ("a", _ts(5, 0), 5.0),  # bucket 4 is a gap
        ("b", _ts(2, 0), 7.0),  # single-bucket key: no gaps
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


@pytest.fixture(scope="module")
def bucketed(series):
    return resample(
        series, ts_col="ts", value_col="v", key_cols=["k"],
        step_seconds=H, agg="avg",
    )


def test_resample_buckets_and_avg(bucketed):
    got = {(r.k, r.bucket % 24): (r.value, r.n_obs) for r in bucketed.collect()}
    base = 473352  # hours since epoch for 2024-01-01 00:00
    assert len(got) == 4
    assert got[("a", base % 24)] == (15.0, 2)


def test_gapfill_none_marks_gaps(bucketed):
    out = gapfill(bucketed, key_cols=["k"], method="none")
    a = out.filter(F.col("k") == "a")
    assert a.count() == 6  # hours 0..5 dense
    assert a.filter("is_gap").count() == 3
    assert out.filter(F.col("k") == "b").count() == 1


def test_gapfill_locf(bucketed):
    out = gapfill(bucketed, key_cols=["k"], method="locf")
    vals = [r.value for r in out.filter("k = 'a'").orderBy("bucket").collect()]
    assert vals == [15.0, 15.0, 15.0, 45.0, 45.0, 5.0]


def test_gapfill_linear(bucketed):
    out = gapfill(bucketed, key_cols=["k"], method="linear")
    vals = [r.value for r in out.filter("k = 'a'").orderBy("bucket").collect()]
    assert vals == [15.0, 25.0, 35.0, 45.0, 25.0, 5.0]


def test_gapfill_linear_leading_gap_stays_null(spark):
    df = spark.createDataFrame(
        [("a", 10, None), ("a", 11, 4.0), ("a", 13, 8.0)],
        "k string, bucket long, value double",
    )
    out = {r.bucket: r.value for r in gapfill(df, key_cols=["k"]).collect()}
    assert out == {10: None, 11: 4.0, 12: 6.0, 13: 8.0}


def test_bucket_ts_roundtrip(spark, bucketed):
    out = bucketed.select("bucket", bucket_ts("bucket", H).alias("t")).collect()
    for r in out:
        assert r.t == dt.datetime.fromtimestamp(r.bucket * H, dt.UTC).replace(tzinfo=None)


def test_invalid_args(series, bucketed):
    with pytest.raises(ValueError):
        resample(series, ts_col="ts", value_col="v", key_cols=["k"], step_seconds=0)
    with pytest.raises(ValueError):
        resample(series, ts_col="ts", value_col="v", key_cols=["k"],
                 step_seconds=H, agg="median")
    with pytest.raises(ValueError):
        gapfill(bucketed, key_cols=["k"], method="spline")


def test_sessionize_gap_boundaries(spark):
    from datetime import datetime

    from assignment_etl_spark.ops.timeseries import sessionize

    t = lambda m: datetime(2024, 1, 1, 10, m, 0)
    rows = [
        (1, t(0), "a"), (1, t(10), "b"), (1, t(50), "c"),  # 40-min gap → new
        (1, t(55), "d"),
        (2, t(0), "e"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, e string")
    got = {
        (r.u, r.e): r.session_id
        for r in sessionize(df, user_col="u", ts_col="ts", order_cols=["e"],
                            gap_seconds=1800).collect()
    }
    assert got == {(1, "a"): 1, (1, "b"): 1, (1, "c"): 2, (1, "d"): 2, (2, "e"): 1}


def test_sessionize_exact_gap_stays(spark):
    from datetime import datetime

    from assignment_etl_spark.ops.timeseries import sessionize

    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), "a"),
        (1, datetime(2024, 1, 1, 10, 30, 0), "b"),  # gap == 1800s: same session
        (1, datetime(2024, 1, 1, 11, 0, 1), "c"),   # gap 1801s: new session
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, e string")
    got = [r.session_id for r in sessionize(
        df, user_col="u", ts_col="ts", order_cols=["e"], gap_seconds=1800
    ).orderBy("e").collect()]
    assert got == [1, 1, 2]


def test_ewma_hand_computed(spark):
    from assignment_etl_spark.ops.timeseries import ewma

    rows = [
        ("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 4.0),
        ("b", 1, 1.0), ("b", 2, None), ("b", 3, 4.0),
    ]
    df = spark.createDataFrame(rows, "k string, i int, value double").select(
        "k", F.timestamp_seconds(F.col("i")).alias("ts"), "i", "value"
    )
    out = {
        (r.k, r.i): r.ewma
        for r in ewma(
            df, key_col="k", ts_col="ts", value_col="value",
            alpha=0.5, max_lags=8, tie_break="i",
        ).collect()
    }
    # adjust=True: y_t = sum w_j x_{t-j} / sum w_j, w_j = 0.5^j
    assert out[("a", 1)] == 1.0
    assert abs(out[("a", 2)] - 2.5 / 1.5) < 1e-9
    assert out[("a", 3)] == 3.0  # (4 + 1 + 0.25) / 1.75
    # NULL values drop out of both sums; the row still gets a smoothed value
    assert out[("b", 2)] == 1.0
    assert out[("b", 3)] == 4.25 / 1.25


def test_rolling_corr_known_values(spark):
    from assignment_etl_spark.ops.timeseries import rolling_corr

    # y = 2x + 1 -> corr exactly 1; then an anti-correlated tail
    rows = [("a", i, float(i), float(2 * i + 1)) for i in range(1, 6)]
    rows += [("b", 1, 1.0, 3.0), ("b", 2, 2.0, 1.0), ("b", 3, 3.0, None)]
    df = spark.createDataFrame(rows, "k string, i int, x double, y double").select(
        "k", F.timestamp_seconds(F.col("i")).alias("ts"), "i", "x", "y"
    )
    out = {
        (r.k, r.i): r.corr
        for r in rolling_corr(
            df, key_col="k", ts_col="ts", x_col="x", y_col="y",
            window_rows=4, tie_break="i",
        ).collect()
    }
    assert out[("a", 1)] is None           # single-row frame
    assert out[("a", 3)] == 1.0 and out[("a", 5)] == 1.0
    assert out[("b", 2)] == -1.0
    # NULL y at b3: frame keeps the two valid rows -> still -1
    assert out[("b", 3)] == -1.0


def test_trend_slope(spark):
    from assignment_etl_spark.ops.timeseries import trend_slope

    rows = [("a", float(i), 2.0 * i + 1) for i in range(5)]
    rows += [("b", 1.0, 5.0), ("b", 2.0, None), ("c", 3.0, 9.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r.k: r for r in trend_slope(df, key_col="k", x_col="x", y_col="y").collect()}
    assert out["a"].slope == 2.0 and out["a"].n == 5
    assert out["b"].slope is None and out["b"].n == 1  # <2 usable points
    assert out["c"].slope is None                       # zero x-variance
