"""Skew mitigation: salted aggregation/join equivalence with plain plans."""

from pyspark.sql import functions as F

from assignment_etl_spark.ops.skew import key_skew_profile, salted_agg, salted_join


def _skewed_df(spark):
    # 10k rows, key "hot" owns 60%
    hot = spark.range(6000).select(F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v"))
    cold = spark.range(4000).select(
        F.concat(F.lit("c"), (F.col("id") % 50)).alias("k"),
        (F.col("id") % 31).cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {
        (r.k): (r.s, r.n, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.s, r.n, r.mx)
        for r in salted_agg(
            df, ["k"], {"s": ("v", "sum"), "n": ("v", "count"), "mx": ("v", "max")}
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"c{i}", f"D{i}") for i in range(50)], "k string, label string"
    )
    plain = fact.join(dim, on="k").groupBy("label").count()
    salted = salted_join(fact, dim, "k").groupBy("label").count()
    assert {(r.label, r["count"]) for r in plain.collect()} == {
        (r.label, r["count"]) for r in salted.collect()
    }


def test_key_skew_profile(spark):
    prof = key_skew_profile(_skewed_df(spark), "k", top=3).collect()
    assert prof[0].k == "hot"
    assert prof[0].share == 0.6
