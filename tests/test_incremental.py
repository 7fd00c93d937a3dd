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
