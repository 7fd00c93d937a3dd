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


def test_cm_exact_when_no_collisions(spark):
    from assignment_etl_spark.ext.sketch import cm_estimate, cm_sketch

    df = spark.createDataFrame(
        [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    sk = cm_sketch(df, "k", w=512, d=4)
    est = {r.k: r.est for r in cm_estimate(sk, df.select("k").distinct(), "k", w=512, d=4).collect()}
    assert est == {"a": 7, "b": 3, "c": 1}


def test_cm_never_undercounts(spark):
    from assignment_etl_spark.ext.sketch import cm_estimate, cm_sketch

    df = spark.range(2000).select((F.col("id") % 100).alias("k"))
    sk = cm_sketch(df, "k", w=16, d=3)  # heavy collisions on purpose
    est = {r.k: r.est for r in cm_estimate(sk, df.distinct(), "k", w=16, d=3).collect()}
    assert all(e >= 20 for e in est.values())  # true count per key = 20


def test_cm_merge_equals_full(spark):
    from assignment_etl_spark.ext.sketch import cm_merge, cm_sketch

    a = spark.range(500).select((F.col("id") % 7).alias("k"))
    b = spark.range(300).select((F.col("id") % 5).alias("k"))
    merged = cm_merge(cm_sketch(a, "k"), cm_sketch(b, "k"))
    full = cm_sketch(a.unionByName(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_cm_absent_item_is_zero_or_collision(spark):
    from assignment_etl_spark.ext.sketch import cm_estimate, cm_sketch

    df = spark.createDataFrame([("x",)] * 5, "k string")
    sk = cm_sketch(df, "k", w=512, d=4)
    items = spark.createDataFrame([("never",)], "k string")
    est = cm_estimate(sk, items, "k", w=512, d=4).first().est
    assert est == 0  # w=512 with one true key: no collision possible


def test_bloom_no_false_negatives(spark):
    from assignment_etl_spark.ext.sketch import bloom_build, bloom_prune

    members = spark.range(0, 300).select(F.col("id").alias("k"))
    sk = bloom_build(members, "k", m_bits=4096, k=3)
    kept = bloom_prune(members, "k", sk, m_bits=4096, k=3)
    assert kept.count() == 300  # every member must survive the prune


def test_bloom_false_positive_rate_sane(spark):
    from assignment_etl_spark.ext.sketch import bloom_build, bloom_prune

    members = spark.range(0, 300).select(F.col("id").alias("k"))
    sk = bloom_build(members, "k", m_bits=4096, k=3)
    probes = spark.range(10_000, 14_000).select(F.col("id").alias("k"))
    fp = bloom_prune(probes, "k", sk, m_bits=4096, k=3).count()
    # (1 - e^(-3*300/4096))^3 ≈ 0.8% → expect ~31 of 4000; allow 4x
    assert fp < 150, fp


def test_bloom_merge_equals_full(spark):
    from assignment_etl_spark.ext.sketch import bloom_build, bloom_merge

    a = spark.range(0, 200).select(F.col("id").alias("k"))
    b = spark.range(150, 400).select(F.col("id").alias("k"))
    merged = bloom_merge(bloom_build(a, "k"), bloom_build(b, "k"))
    full = bloom_build(a.unionByName(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    swapped = bloom_merge(bloom_build(b, "k"), bloom_build(a, "k"))
    assert sorted(map(tuple, swapped.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_bloom_words_positive_and_bounded(spark):
    from assignment_etl_spark.ext.sketch import WORD_BITS, bloom_build

    members = spark.range(0, 500).select(F.col("id").alias("k"))
    rows = bloom_build(members, "k", m_bits=4096, k=3).collect()
    n_words = (4096 + WORD_BITS - 1) // WORD_BITS
    assert all(0 <= r.word < n_words for r in rows)
    assert all(0 < r.bits < (1 << WORD_BITS) for r in rows)


def test_bloom_empty_build_prunes_everything(spark):
    from assignment_etl_spark.ext.sketch import bloom_build, bloom_prune

    members = spark.range(0, 10).filter(F.col("id") < 0).select(
        F.col("id").alias("k")
    )
    sk = bloom_build(members, "k")
    probes = spark.range(0, 50).select(F.col("id").alias("k"))
    assert bloom_prune(probes, "k", sk).count() == 0


def test_bloom_string_keys(spark):
    from assignment_etl_spark.ext.sketch import bloom_build, bloom_prune

    members = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",)], "k string"
    )
    sk = bloom_build(members, "k", m_bits=1024, k=3)
    probes = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("delta",), ("epsilon",)],
        "k string",
    )
    kept = {r.k for r in bloom_prune(probes, "k", sk, m_bits=1024, k=3).collect()}
    assert {"alpha", "beta", "gamma"} <= kept  # no false negatives


def test_hll_intersection_estimate(spark):
    from assignment_etl_spark.ext.sketch import hll_intersection_estimate

    a = spark.range(0, 2000).select(F.col("id").alias("k"))
    b = spark.range(1000, 3000).select(F.col("id").alias("k"))
    row = hll_intersection_estimate(
        hll_sketch(a, "k"), hll_sketch(b, "k")
    ).first()
    # truth: |A|=|B|=2000, |A∪B|=3000, |A∩B|=1000; p=10 → ~3-10% error
    assert abs(row.est_union - 3000) / 3000 < 0.10
    assert abs(row.est_intersection - 1000) / 1000 < 0.25


def test_cm_join_size_exact_when_no_collisions(spark):
    from assignment_etl_spark.ext.sketch import cm_join_size_estimate, cm_sketch

    a = spark.createDataFrame([(1,)] * 3 + [(2,)] * 2, "k long")
    b = spark.createDataFrame([(1,)] * 4 + [(3,)] * 5, "k long")
    est = cm_join_size_estimate(
        cm_sketch(a, "k", w=512, d=4), cm_sketch(b, "k", w=512, d=4)
    ).first().est
    assert est == 12  # only k=1 joins: 3*4


def test_cm_join_size_never_undercounts(spark):
    from pyspark.sql import functions as F

    from assignment_etl_spark.ext.sketch import cm_join_size_estimate, cm_sketch

    a = spark.range(2000).select((F.col("id") % 97).alias("k"))
    b = spark.range(1500).select((F.col("id") % 53).alias("k"))
    exact = a.join(b, on="k").count()
    for w in (16, 128, 2048):
        est = cm_join_size_estimate(
            cm_sketch(a, "k", w=w, d=3), cm_sketch(b, "k", w=w, d=3)
        ).first().est
        assert est >= exact, (w, est, exact)
    # with a wide sketch the estimate is tight
    est = cm_join_size_estimate(
        cm_sketch(a, "k", w=4096, d=4), cm_sketch(b, "k", w=4096, d=4)
    ).first().est
    assert est <= exact * 1.2


def test_hll_sliding_matches_per_window_sketch(spark):
    from assignment_etl_spark.ext.sketch import (
        hll_cardinality,
        hll_sketch,
        hll_sliding_cardinality,
    )

    # 10 "days" of events, user ids drift over time
    df = spark.range(5000).select(
        (F.lit(1700000000) + (F.col("id") % 10) * 86400).alias("epoch"),
        ((F.col("id") * 13) % 700).alias("user"),
    ).select(F.timestamp_seconds("epoch").alias("ts"), "user")
    got = {
        r.end_bucket: r.est
        for r in hll_sliding_cardinality(
            df, ts_col="ts", col="user", bucket_seconds=86400, window_buckets=3
        ).collect()
    }
    # reference: sketch each trailing-3-bucket slice directly
    b0 = 1700000000 // 86400
    for end in (b0, b0 + 4, b0 + 9):
        slice_df = df.filter(
            (F.unix_timestamp("ts") / 86400).cast("long").between(end - 2, end)
        )
        want = hll_cardinality(hll_sketch(slice_df, "user"), p=10).first().est
        assert got[end] == want, (end, got[end], want)
    assert len(got) == 10  # one row per populated bucket


def test_cm_heavy_hitters_exact_and_superset(spark):
    """Sketch-guided exact heavy hitters: output equals the brute-force
    groupBy threshold EXACTLY (the CM filter only prunes, never drops a
    true hitter), on a skewed corpus and at a tiny width that forces
    collisions."""
    from assignment_etl_spark.ext.sketch import cm_heavy_hitters

    rows = []
    for i in range(40):
        rows += [(f"u{i}",)] * (40 - i)  # Zipf-ish: u0 x40 ... u39 x1
    df = spark.createDataFrame(rows, "k string").repartition(8)
    for w in (512, 16):  # w=16 forces heavy collisions: still exact
        got = {
            (r.value, r.n)
            for r in cm_heavy_hitters(df, "k", min_count=20, w=w, d=4).collect()
        }
        want = {(f"u{i}", 40 - i) for i in range(40) if 40 - i >= 20}
        assert got == want, w
    # integral key path + parameter guard
    di = spark.createDataFrame([(7,)] * 30 + [(9,)] * 3, "k long")
    got = cm_heavy_hitters(di, "k", min_count=10).collect()
    assert [(r.value, r.n) for r in got] == [(7, 30)]
    import pytest as _pt

    with _pt.raises(ValueError, match="min_count"):
        cm_heavy_hitters(di, "k", min_count=0)
