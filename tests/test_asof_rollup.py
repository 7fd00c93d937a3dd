"""As-of join (union+window custom operator) + hypertable rollup merge."""

import datetime as dt

from pyspark.sql import functions as F

from assignment_etl_spark.analytics.rollup import merge_rollup, rollup_time
from assignment_etl_spark.ops.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, _m(0)), (1, _m(10)), (1, _m(20)), (2, _m(5))],
        "user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _m(4), 100.0), (1, _m(10), 200.0), (1, _m(25), 300.0), (3, _m(0), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        (r.user_id, r.ts): (r.value_right, r.ts_right)
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }
    assert out[(1, _m(0))] == (None, None)  # no prior right row
    assert out[(1, _m(10))] == (200.0, _m(10))  # tie is inclusive
    assert out[(1, _m(20))] == (200.0, _m(10))  # latest at-or-before
    assert out[(2, _m(5))] == (None, None)  # group with no right rows


def test_asof_carries_multiple_columns(spark):
    left = spark.createDataFrame([(1, _m(10))], "user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _m(5), 7.0, "a")], "user_id long, ts timestamp, value double, tag string"
    )
    row = asof_join(left, right, on="ts", by="user_id").first()
    assert row.value_right == 7.0 and row.tag_right == "a"


def test_asof_equivalent_to_quadratic(spark):
    """Property: the union+window as-of equals the naive quadratic
    definition (max right.ts <= left.ts per left row) on randomized data."""
    import random

    rng = random.Random(42)
    left_rows = [
        (u, _m(rng.randrange(0, 500)), i) for i, u in enumerate(rng.choices(range(5), k=120))
    ]
    right_rows = [
        (u, _m(rng.randrange(0, 500)), float(i)) for i, u in enumerate(rng.choices(range(5), k=80))
    ]
    left = spark.createDataFrame(left_rows, "user_id long, ts timestamp, lid long")
    right = spark.createDataFrame(
        right_rows, "user_id long, ts timestamp, value double"
    ).dropDuplicates(["user_id", "ts"])  # unique as-of keys → deterministic

    got = {
        r.lid: r.ts_right
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }

    r2 = right.toDF("user_id", "rts", "value")
    quad = (
        left.join(r2, (left.user_id == r2.user_id) & (r2.rts <= left.ts), "left")
        .groupBy("lid")
        .agg(F.max("rts").alias("rts"))
    )
    expected = {r.lid: r.rts for r in quad.collect()}
    assert got == expected


def test_rollup_merge_lossless(spark):
    rows = [
        (i, T0 + dt.timedelta(minutes=37 * i), "t%d" % (i % 2), float(i))
        for i in range(200)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    hourly = rollup_time(events, keys=["event_type"], unit="hour")
    daily_merged = merge_rollup(hourly, unit="day", keys=["event_type"])
    daily_direct = rollup_time(events, keys=["event_type"], unit="day")
    a = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in daily_merged.collect()
    }
    b = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value, r.min_value, r.max_value)
        for r in daily_direct.collect()
    }
    assert a == b  # exact: decimal partials are mergeable


def test_rollup_rejects_bad_unit(spark):
    events = spark.createDataFrame([(1, T0, "a", 1.0)], "e long, ts timestamp, event_type string, value double")
    import pytest

    with pytest.raises(ValueError):
        rollup_time(events, unit="fortnight")


def test_asof_null_in_matched_row_preserved(spark):
    """A NULL in the matched (latest) right row must SURVIVE — not be
    back-filled from an older right row — and all carried columns must come
    from the same matched row (single-struct carry)."""
    from assignment_etl_spark.ops.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "ts long, lid int").withColumn(
        "ts", F.timestamp_seconds(F.lit(1000))
    )
    right = spark.createDataFrame(
        [(900, "old", 1.0), (950, None, 2.0)], "t long, tag string, v double"
    ).select(F.timestamp_seconds("t").alias("ts"), "tag", "v")
    row = asof_join(left, right, on="ts").first()
    assert row.v_right == 2.0  # latest right row matched
    assert row.tag_right is None  # its NULL tag NOT back-filled from "old"


def test_asof_directions_and_tolerance(spark):
    """merge_asof parity: forward picks the earliest right at/after,
    nearest picks the closer side (ties backward), tolerance nulls far
    matches."""
    import datetime as dt

    from assignment_etl_spark.ops.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, ts(10)), (1, ts(25)), (1, ts(100)), (2, ts(5))],
        "user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(0), 1.0), (1, ts(20), 2.0), (1, ts(30), 3.0)],
        "user_id long, ts timestamp, v double",
    )

    def got(direction, tol=None):
        out = asof_join(
            left, right, on="ts", by="user_id",
            direction=direction, tolerance_seconds=tol,
        )
        return {(r.user_id, r.ts): r.v_right for r in out.collect()}

    back = got("backward")
    assert back[(1, ts(10))] == 1.0 and back[(1, ts(25))] == 2.0
    assert back[(1, ts(100))] == 3.0 and back[(2, ts(5))] is None

    fwd = got("forward")
    assert fwd[(1, ts(10))] == 2.0 and fwd[(1, ts(25))] == 3.0
    assert fwd[(1, ts(100))] is None and fwd[(2, ts(5))] is None

    near = got("nearest")
    # 10min: prev@0 (10) vs next@20 (10) — equidistant tie → backward
    assert near[(1, ts(10))] == 1.0
    # 25min: prev@20 (5) vs next@30 (5)? 25-20=5, 30-25=5 → tie → backward
    assert near[(1, ts(25))] == 2.0
    assert near[(1, ts(100))] == 3.0 and near[(2, ts(5))] is None

    tol = got("backward", tol=600)  # 10 minutes, boundary inclusive
    assert tol[(1, ts(10))] == 1.0   # gap exactly 600s → kept
    assert tol[(1, ts(25))] == 2.0   # 300s gap → kept
    assert tol[(1, ts(100))] is None  # 4200s gap → nulled by tolerance
