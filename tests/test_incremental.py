"""Incremental aggregate maintenance (ops/incremental.py): merging partial
states must equal a full recompute, across key-disjoint and overlapping
batches, nulls, and repeated merges (associativity)."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ops.incremental import (
    aggregate_batch,
    finalize,
    merge_states,
)

KEYS, VALS = ["k"], ["v"]


@pytest.fixture(scope="module")
def batches(spark):
    b1 = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("c", None)], "k string, v double"
    )
    b2 = spark.createDataFrame(
        [("a", 5.0), ("c", 7.0), ("d", -2.0)], "k string, v double"
    )
    return b1, b2


def _full_recompute(spark, b1, b2):
    allr = b1.unionByName(b2)
    return {
        r.k: r
        for r in allr.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("v_count"),
            F.sum("v").alias("v_sum"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
            F.avg("v").alias("v_avg"),
        )
        .collect()
    }


def test_merge_equals_full_recompute(spark, batches):
    b1, b2 = batches
    merged = finalize(
        merge_states(
            aggregate_batch(b1, KEYS, VALS), aggregate_batch(b2, KEYS, VALS), KEYS, VALS
        ),
        VALS,
    )
    got = {r.k: r for r in merged.collect()}
    exp = _full_recompute(spark, b1, b2)
    assert set(got) == set(exp) == {"a", "b", "c", "d"}
    for k in exp:
        assert got[k].n_rows == exp[k].n_rows
        assert got[k].v_count == exp[k].v_count
        assert float(got[k].v_sum) == pytest.approx(exp[k].v_sum or 0.0)
        assert got[k].v_min == exp[k].v_min
        assert got[k].v_max == exp[k].v_max
        if exp[k].v_avg is None:
            assert got[k].v_avg is None
        else:
            assert got[k].v_avg == pytest.approx(exp[k].v_avg)


def test_merge_is_associative(spark, batches):
    b1, b2 = batches
    b3 = spark.createDataFrame([("b", 1.5), ("e", 0.0)], "k string, v double")
    s1, s2, s3 = (aggregate_batch(b, KEYS, VALS) for b in (b1, b2, b3))
    left = merge_states(merge_states(s1, s2, KEYS, VALS), s3, KEYS, VALS)
    right = merge_states(s1, merge_states(s2, s3, KEYS, VALS), KEYS, VALS)
    a = {tuple(r) for r in left.collect()}
    b = {tuple(r) for r in right.collect()}
    assert a == b


def test_null_only_group(spark):
    df = spark.createDataFrame([("x", None)], "k string, v double")
    out = finalize(aggregate_batch(df, KEYS, VALS), VALS).first()
    assert out.n_rows == 1 and out.v_count == 0
    assert out.v_min is None and out.v_avg is None


def test_join_view_delta_equals_full_recompute(spark):
    from assignment_etl_spark.ops.incremental import merge_join_view

    a = spark.createDataFrame(
        [(1, "x1"), (2, "x2"), (3, "x3"), (4, "x4")], "k long, av string"
    )
    b = spark.createDataFrame(
        [(1, "y1"), (2, "y2"), (5, "y5")], "k long, bv string"
    )
    base_a, delta_a = a.filter("k <= 2"), a.filter("k > 2")
    base_b, delta_b = b.filter("k = 1"), b.filter("k != 1")
    view = base_a.join(base_b, on=["k"])
    merged = merge_join_view(view, base_a, delta_a, base_b, delta_b, ["k"])
    full = a.join(b, on=["k"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_join_view_delta_counts_cross_term_once(spark):
    from assignment_etl_spark.ops.incremental import join_view_delta

    # the ONLY match is ΔA ⋈ ΔB — it must appear exactly once
    base_a = spark.createDataFrame([(9, "old")], "k long, av string")
    delta_a = spark.createDataFrame([(1, "na")], "k long, av string")
    base_b = spark.createDataFrame([(8, "oldb")], "k long, bv string")
    delta_b = spark.createDataFrame([(1, "nb")], "k long, bv string")
    got = join_view_delta(base_a, delta_a, base_b, delta_b, ["k"]).collect()
    assert [tuple(r) for r in got] == [(1, "na", "nb")]


def test_join_view_empty_deltas_add_nothing(spark):
    from assignment_etl_spark.ops.incremental import join_view_delta

    a = spark.createDataFrame([(1, "x")], "k long, av string")
    b = spark.createDataFrame([(1, "y")], "k long, bv string")
    empty_a = a.filter("k < 0")
    empty_b = b.filter("k < 0")
    assert join_view_delta(a, empty_a, b, empty_b, ["k"]).count() == 0
