"""Regression tests for the scale-data amplifier (tools/make_scale_data):
the round-8 int32 overflow — `_rep (int) × 100M (int literal)` wrapped
negative at rep ≥ 22 with ANSI off, so factor-100 amplification produced
negative/colliding-looking ids and `vec_id < 8` matched 84,008 rows at
sf10 (a 16.8B-pair join artifact in the IVF scale sweep)."""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from tools.make_scale_data import OFF, _rebase, _rep  # noqa: E402


def test_rebase_factor_100_stays_nonnegative_and_distinct(spark):
    base = spark.range(50).select(F.col("id").alias("k"))
    out = _rebase(_rep(base, 100), ["k"]).drop("_rep")
    stats = out.agg(
        F.min("k").alias("mn"),
        F.max("k").alias("mx"),
        F.countDistinct("k").alias("nd"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert stats.mn >= 0, "int32 wraparound regression: negative ids"
    assert stats.mx == 49 + 99 * OFF
    assert stats.nd == stats.n == 5000


def test_rebase_output_type_is_long(spark):
    base = spark.range(3).select(F.col("id").cast("long").alias("k"))
    out = _rebase(_rep(base, 30), ["k"])
    assert dict(out.dtypes)["k"] == "bigint"
