"""Privacy audit (ext/privacy.py): k-anonymity class math, l-diversity,
suppression, and generalization."""

from pyspark.sql import functions as F

from assignment_etl_spark.ext.privacy import (
    anonymity_classes,
    anonymity_report,
    flag_below_k,
    generalize_num,
    suppress_below_k,
)


def _people(spark):
    # classes: (US,30)=3 rows, (US,40)=2, (DE,30)=1
    rows = [
        ("US", 30, "flu"),
        ("US", 30, "flu"),
        ("US", 30, "cold"),
        ("US", 40, "flu"),
        ("US", 40, "asthma"),
        ("DE", 30, "flu"),
    ]
    return spark.createDataFrame(rows, "country string, age int, dx string")


def test_anonymity_classes(spark):
    got = {
        (r.country, r.age): (r.class_size, r.n_sensitive)
        for r in anonymity_classes(
            _people(spark), ["country", "age"], sensitive="dx"
        ).collect()
    }
    assert got == {("US", 30): (3, 2), ("US", 40): (2, 2), ("DE", 30): (1, 1)}


def test_report_per_k(spark):
    rep = {
        r.k: r
        for r in anonymity_report(
            _people(spark), ["country", "age"], ks=[2, 3], sensitive="dx", l=2
        ).collect()
    }
    assert rep[2].n_classes == 3
    assert rep[2].n_classes_below == 1 and rep[2].n_rows_below == 1
    assert rep[3].n_classes_below == 2 and rep[3].n_rows_below == 3
    # l=2: only (DE,30) has < 2 distinct dx
    assert rep[2].n_classes_low_diversity == 1
    assert rep[2].n_rows_low_diversity == 1


def test_flag_and_suppress(spark):
    df = _people(spark)
    flagged = flag_below_k(df, ["country", "age"], 2)
    assert flagged.filter(~F.col("is_k_anonymous")).count() == 1
    kept = suppress_below_k(df, ["country", "age"], 2)
    assert kept.count() == 5
    assert kept.columns == df.columns  # audit columns dropped
    assert kept.filter(F.col("country") == "DE").count() == 0


def test_suppress_is_idempotent(spark):
    df = _people(spark)
    once = suppress_below_k(df, ["country", "age"], 2)
    twice = suppress_below_k(once, ["country", "age"], 2)
    assert once.count() == twice.count()


def test_generalize_num(spark):
    df = spark.createDataFrame([(17,), (23,), (-5,)], "age int")
    got = [r.b for r in df.select(generalize_num("age", 10).alias("b")).collect()]
    assert got == [10.0, 20.0, -10.0]  # floor semantics, negatives too
