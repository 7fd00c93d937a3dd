"""SCD2 builder and funnel operator unit tests (hand-checked semantics;
the oracle-gated forms live in __spark_entry__)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ops.funnel import funnel
from assignment_etl_spark.ops.scd import scd2_build, version_conflicts


def _ts(day, h=0, m=0):
    return dt.datetime(2024, 1, day, h, m)


class TestScd2:
    @pytest.fixture(scope="class")
    def log(self, spark):
        rows = [
            (1, _ts(1), "bronze"),
            (1, _ts(5), "bronze"),   # no-change heartbeat
            (1, _ts(9), "silver"),
            (1, _ts(20), "gold"),
            (2, _ts(3), "silver"),
        ]
        return spark.createDataFrame(rows, "cust long, ts timestamp, tier string")

    def test_versions_and_intervals(self, spark, log):
        out = scd2_build(
            log, key_cols=["cust"], ts_col="ts", attr_cols=["tier"]
        )
        rows = {(r.cust, r.version): r for r in out.collect()}
        assert len(rows) == 4  # heartbeat dropped
        assert rows[(1, 1)].tier == "bronze"
        assert rows[(1, 1)].effective_to == _ts(9)
        assert rows[(1, 2)].tier == "silver"
        assert rows[(1, 3)].tier == "gold" and rows[(1, 3)].is_current
        assert rows[(2, 1)].is_current

    def test_keep_unchanged(self, spark, log):
        out = scd2_build(
            log, key_cols=["cust"], ts_col="ts", attr_cols=["tier"],
            drop_unchanged=False,
        )
        assert out.count() == 5

    def test_conflict_audit(self, spark, log):
        dup = log.union(
            log.sparkSession.createDataFrame(
                [(1, _ts(9), "platinum")], "cust long, ts timestamp, tier string"
            )
        )
        bad = version_conflicts(dup, key_cols=["cust"], ts_col="ts")
        assert bad.count() == 1  # (1, day9) twice -> nondeterministic order
        assert version_conflicts(log, key_cols=["cust"], ts_col="ts").count() == 0


class TestFunnel:
    @pytest.fixture(scope="class")
    def events(self, spark):
        rows = [
            # u1 full funnel
            (1, _ts(1, 0), "view"), (1, _ts(1, 1), "click"), (1, _ts(2), "purchase"),
            # u2 stops after click
            (2, _ts(1), "view"), (2, _ts(3), "click"),
            # u3 clicks but never views -> never enters
            (3, _ts(1), "click"), (3, _ts(2), "purchase"),
            # u4 clicked BEFORE first view -> click doesn't count; later click does
            (4, _ts(1), "click"), (4, _ts(2), "view"), (4, _ts(5), "click"),
            # u5 purchase before click -> stops at click stage
            (5, _ts(1), "view"), (5, _ts(2), "purchase"), (5, _ts(3), "click"),
        ]
        return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    def test_first_touch_ordering(self, spark, events):
        out = {r.step: r for r in funnel(events, ["view", "click", "purchase"]).collect()}
        assert out[1].n_users == 4          # u1 u2 u4 u5
        assert out[2].n_users == 4          # u1 u2 u4(late click) u5
        assert out[3].n_users == 1          # only u1 purchases after click
        assert out[2].conversion == 1.0
        assert out[3].conversion == 0.25
        assert out[1].mean_secs_from_start == 0.0

    def test_within_window(self, spark, events):
        out = {
            r.step: r
            for r in funnel(
                events, ["view", "click", "purchase"],
                within_seconds=24 * 3600,
            ).collect()
        }
        # u2 (2 days), u4 (3 days), u5 (2 days) all exceed the window
        assert out[2].n_users == 1          # u1 only
        # u1's purchase is exactly 24h after start: boundary is inclusive
        assert out[3].n_users == 1

    def test_needs_two_steps(self, spark, events):
        with pytest.raises(ValueError):
            funnel(events, ["view"])


class TestScd2Lookup:
    def test_point_in_time(self, spark):
        from assignment_etl_spark.ops.scd import scd2_build, scd2_lookup

        log = spark.createDataFrame(
            [(1, _ts(1), "bronze"), (1, _ts(10), "gold"), (2, _ts(5), "silver")],
            "cust long, ts timestamp, tier string",
        )
        dim = scd2_build(log, key_cols=["cust"], ts_col="ts", attr_cols=["tier"])
        facts = spark.createDataFrame(
            [
                (100, 1, _ts(2)),    # inside v1
                (101, 1, _ts(10)),   # boundary: new version starts AT ts
                (102, 1, _ts(25)),   # open current version
                (103, 2, _ts(1)),    # before first version -> NULL
                (104, 3, _ts(9)),    # unknown key -> NULL
            ],
            "fact_id long, cust long, ts timestamp",
        )
        out = {
            r.fact_id: r.tier_dim
            for r in scd2_lookup(
                facts, dim, key_cols=["cust"], ts_col="ts", attr_cols=["tier"]
            ).collect()
        }
        assert out == {100: "bronze", 101: "gold", 102: "gold",
                       103: None, 104: None}

    def test_gap_masks_closed_interval(self, spark):
        from assignment_etl_spark.ops.scd import scd2_lookup

        # hand-built dim with a validity GAP: [day1, day3) then nothing
        dim = spark.createDataFrame(
            [(1, _ts(1), _ts(3), "bronze")],
            "cust long, effective_from timestamp, effective_to timestamp, tier string",
        )
        facts = spark.createDataFrame(
            [(200, 1, _ts(2)), (201, 1, _ts(7))],
            "fact_id long, cust long, ts timestamp",
        )
        out = {
            r.fact_id: r.tier_dim
            for r in scd2_lookup(
                facts, dim, key_cols=["cust"], ts_col="ts", attr_cols=["tier"]
            ).collect()
        }
        assert out == {200: "bronze", 201: None}  # closed interval masked
