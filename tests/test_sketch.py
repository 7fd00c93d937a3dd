"""Portable HLL (ext/sketch.py): estimator accuracy, merge algebra,
sparse-register invariants."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.sketch import (
    hll_cardinality,
    hll_merge,
    hll_sketch,
    portable_hash_int,
)


def _est(spark, n, p=10):
    df = spark.range(n).select(F.col("id").alias("k"))
    regs = hll_sketch(df, "k", p=p)
    return hll_cardinality(regs, p=p).first()["est"]


def test_estimates_within_tolerance(spark):
    """Std error at p=10 is ~3.3%; small range uses linear counting and
    is tighter. Allow 3 sigma."""
    for n in (150, 1000, 20000):
        est = _est(spark, n)
        assert abs(est - n) / n < 0.10, (n, est)


def test_duplicates_do_not_change_sketch(spark):
    df = spark.range(500).select((F.col("id") % 50).alias("k"))
    regs = hll_sketch(df, "k", p=10)
    regs_dedup = hll_sketch(df.distinct(), "k", p=10)
    assert sorted(map(tuple, regs.collect())) == sorted(map(tuple, regs_dedup.collect()))


def test_merge_is_union_and_commutative(spark):
    a = spark.range(0, 800).select(F.col("id").alias("k"))
    b = spark.range(400, 1200).select(F.col("id").alias("k"))
    ra, rb = hll_sketch(a, "k"), hll_sketch(b, "k")
    merged = hll_merge(ra, rb)
    full = hll_sketch(a.unionByName(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    swapped = hll_merge(rb, ra)
    assert sorted(map(tuple, swapped.collect())) == sorted(map(tuple, merged.collect()))


def test_registers_sparse_and_bounded(spark):
    df = spark.range(300).select(F.col("id").alias("k"))
    regs = hll_sketch(df, "k", p=8).collect()
    assert len(regs) <= 256
    assert all(0 <= r.idx < 256 and 1 <= r.rho <= 24 for r in regs)


def test_grouped_sketch(spark):
    df = spark.range(1000).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("k")
    )
    est = {r.g: r.est for r in hll_cardinality(
        hll_sketch(df, "k", by="g", p=10), p=10, by="g"
    ).collect()}
    for g, e in est.items():
        assert abs(e - 250) / 250 < 0.10, (g, e)


def test_hash_matches_sampling_family(spark):
    """portable_hash_int is the integer stage of portable_hash01 — the
    uniform must equal (h+1)/(P+1) exactly."""
    from assignment_etl_spark.ext.sampling import portable_hash01
    from assignment_etl_spark.portable import PRIME_P

    df = spark.range(100)
    both = df.select(
        portable_hash_int(F.col("id"), 7).alias("h"),
        portable_hash01(F.col("id"), 7).alias("u"),
    ).collect()
    for r in both:
        assert r.u == (r.h + 1) / (PRIME_P + 1)


def test_p_bounds():
    import pyspark.sql.functions as F  # noqa: F401

    with pytest.raises(ValueError):
        hll_sketch(None, "k", p=3)
