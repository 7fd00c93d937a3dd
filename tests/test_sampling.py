"""Deterministic sampling: partitioning-invariance, rate fidelity,
weighted-bias sanity."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.sampling import (
    portable_hash01,
    priority_sample,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def pop(spark):
    return spark.range(10_000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") % 100 + 1).cast("double").alias("w"),
    )


def test_hash01_in_range_and_deterministic(spark, pop):
    u = pop.select(portable_hash01(F.col("id")).alias("u"))
    mn, mx = u.agg(F.min("u"), F.max("u")).first()
    assert 0 < mn and mx <= 1
    a = pop.select("id", portable_hash01(F.col("id")).alias("u"))
    b = pop.repartition(17).select("id", portable_hash01(F.col("id")).alias("u"))
    assert a.exceptAll(b).count() == 0


def test_stratified_rates_and_membership_stability(spark, pop):
    rates = {"0": 0.5, "1": 0.1, "2": 1.0}  # grp 3 absent -> dropped
    kept = stratified_hash_sample(pop, rates, stratum_col="grp", id_col="id")
    counts = {r.grp: r.n for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"0", "1", "2"}
    assert counts["2"] == 2500  # rate 1.0 keeps the whole stratum
    assert abs(counts["0"] / 2500 - 0.5) < 0.05
    assert abs(counts["1"] / 2500 - 0.1) < 0.05
    # membership identical under different partitioning (pure projection)
    kept2 = stratified_hash_sample(
        pop.repartition(13), rates, stratum_col="grp", id_col="id"
    )
    assert kept.select("id").exceptAll(kept2.select("id")).count() == 0


def test_stratified_rejects_bad_rate(spark, pop):
    with pytest.raises(ValueError):
        stratified_hash_sample(pop, {"0": 1.5}, stratum_col="grp", id_col="id")


def test_priority_sample_size_determinism_and_bias(spark, pop):
    s = priority_sample(pop, 500, weight_col="w", id_col="id")
    rows = s.collect()
    assert len(rows) == 500
    # determinism under repartition
    s2 = priority_sample(pop.repartition(23), 500, weight_col="w", id_col="id")
    assert {r.id for r in rows} == {r.id for r in s2.collect()}
    # weighted: sampled mean weight must exceed population mean
    pop_mean = pop.agg(F.avg("w")).first()[0]
    smp_mean = s.agg(F.avg("w")).first()[0]
    assert smp_mean > pop_mean * 1.2


def test_priority_sample_grouped(spark, pop):
    s = priority_sample(pop, 10, weight_col="w", id_col="id", by=["grp"])
    per = {r.grp: r.n for r in s.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert per == {"0": 10, "1": 10, "2": 10, "3": 10}


def test_priority_sample_excludes_nonpositive_weights(spark):
    df = spark.range(100).select(
        "id", F.when(F.col("id") < 50, -1.0).otherwise(1.0).alias("w")
    )
    s = priority_sample(df, 100, weight_col="w", id_col="id")
    assert s.count() == 50
    assert s.agg(F.min("id")).first()[0] >= 50


def test_priority_sample_global_plan_is_take_ordered(spark, pop):
    s = priority_sample(pop, 50, weight_col="w", id_col="id")
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_string_id_raises_instead_of_empty_sample(spark):
    df = spark.createDataFrame([("u1", "a", 1.0)], "id string, grp string, w double")
    with pytest.raises(TypeError):
        stratified_hash_sample(df, {"a": 0.5}, stratum_col="grp", id_col="id")
    with pytest.raises(TypeError):
        priority_sample(df, 5, weight_col="w", id_col="id")
