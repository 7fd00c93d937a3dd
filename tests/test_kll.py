"""ext/sketch.py KLL-class rank sketch: merge associativity /
partitioning-independence, quantile accuracy vs exact, trim-0 exactness,
NULL handling, parameter guards.

The sketch is the deterministic level-sampling variant (hash-assigned
levels), so the headline property is that ANY build/merge order yields
the bit-identical sketch — pinned here — with DKW-bounded rank error.
"""

import math

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.sketch import (
    kll_merge,
    kll_n_estimate,
    kll_quantiles,
    kll_sketch,
)


def _data(spark, n, parts=8):
    # deterministic skewed-ish values decoupled from the hash (id-keyed)
    return spark.range(n).repartition(parts).select(
        F.col("id"),
        (F.pow(F.pmod(F.col("id") * 37 + 11, F.lit(10000)) / 10000.0, 2.0) * 100.0).alias("x"),
    )


def _rows(df):
    return sorted((r.lvl, r.value, r.trim) for r in df.collect())


def test_trim_zero_keeps_everything_and_is_exact(spark):
    df = _data(spark, 500)
    sk = kll_sketch(df, "x", "id", cap=2048)
    rows = sk.collect()
    assert len(rows) == 500
    assert all(r.trim == 0 for r in rows)
    qs = [0.1, 0.5, 0.9]
    got = {r.q: r.est for r in kll_quantiles(sk, qs).collect()}
    want = df.agg(
        *[F.round(F.percentile("x", F.lit(q)), 6).alias(f"p{q}") for q in qs]
    ).collect()[0]
    for q in qs:
        assert got[q] == pytest.approx(want[f"p{q}"], abs=1e-9)
    # n estimate is exact at trim 0
    assert kll_n_estimate(sk).collect()[0].n_est == 500.0


def test_partitioning_independence_and_merge_associativity(spark):
    full = _data(spark, 30000, parts=16)
    a = full.filter(F.col("id") < 10000)
    b = full.filter((F.col("id") >= 10000) & (F.col("id") < 20000))
    c = full.filter(F.col("id") >= 20000)
    cap = 512
    sk_full = kll_sketch(full, "x", "id", cap=cap)
    sk_full_1part = kll_sketch(full.coalesce(1), "x", "id", cap=cap)
    sa, sb, sc = (kll_sketch(d, "x", "id", cap=cap) for d in (a, b, c))
    left = kll_merge(kll_merge(sa, sb, cap=cap), sc, cap=cap)
    right = kll_merge(sa, kll_merge(sb, sc, cap=cap), cap=cap)
    swapped = kll_merge(sc, kll_merge(sa, sb, cap=cap), cap=cap)
    want = _rows(sk_full)
    assert want  # trimmed but non-empty
    assert _rows(sk_full_1part) == want
    assert _rows(left) == want
    assert _rows(right) == want
    assert _rows(swapped) == want
    # the trim actually engaged (30k rows >> cap)
    assert all(t > 0 for (_, _, t) in want)
    assert len(want) <= cap


def test_quantile_accuracy_within_dkw(spark):
    n, cap = 40000, 2048
    df = spark.range(n).select(
        F.col("id"), (F.pmod(F.col("id") * 101 + 7, F.lit(n)) / float(n)).alias("x")
    )  # near-uniform on [0,1): value error ≈ rank error
    sk = kll_sketch(df, "x", "id", cap=cap)
    m = sk.count()
    assert cap // 4 <= m <= cap
    eps = math.sqrt(math.log(2 / 0.01) / (2 * m))  # DKW at 99%
    got = kll_quantiles(sk, [0.1, 0.25, 0.5, 0.75, 0.9]).collect()
    for r in got:
        assert abs(r.est - r.q) <= eps, (r.q, r.est, eps)
    # n estimate within a loose factor (Bernoulli count concentration)
    n_est = kll_n_estimate(sk).collect()[0].n_est
    assert 0.7 * n <= n_est <= 1.4 * n


def test_nulls_excluded_and_empty_input(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 7.0)], "id long, x double"
    )
    sk = kll_sketch(df, "x", "id", cap=16)
    assert sorted(r.value for r in sk.collect()) == [5.0, 7.0]
    empty = kll_sketch(df.filter("id < 0"), "x", "id", cap=16)
    assert empty.count() == 0
    est = kll_quantiles(empty, [0.5]).collect()
    assert len(est) == 1 and est[0].est is None


def test_param_guards(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, x double")
    with pytest.raises(ValueError, match="cap"):
        kll_sketch(df, "x", "id", cap=1)
    with pytest.raises(ValueError, match="max_level"):
        kll_sketch(df, "x", "id", max_level=0)
    sk = kll_sketch(df, "x", "id")
    with pytest.raises(ValueError, match="at least one"):
        kll_quantiles(sk, [])
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        kll_quantiles(sk, [1.5])


def test_rank_estimates_inverse_of_quantiles(spark):
    from assignment_etl_spark.ext.sketch import kll_rank

    n = 20000
    df = spark.range(n).select(
        F.col("id"), (F.pmod(F.col("id") * 13 + 3, F.lit(n)) / float(n)).alias("x")
    )
    sk = kll_sketch(df, "x", "id", cap=1024)
    got = {r.value: r.rank_est for r in kll_rank(sk, [0.1, 0.5, 0.9]).collect()}
    n_est = kll_n_estimate(sk).collect()[0].n_est
    m = sk.count()
    eps = math.sqrt(math.log(2 / 0.01) / (2 * m))  # DKW at 99%
    for v in (0.1, 0.5, 0.9):
        # the NORMALIZED CDF estimate is DKW-bounded (count fluctuation
        # cancels against kll_n_estimate's identical survivor set)...
        assert abs(got[v] / n_est - v) <= eps, (v, got[v], n_est)
        # ...while the absolute rank inherits the Bernoulli count
        # variance on top (docstring note) — looser band
        assert abs(got[v] - v * n) <= 0.15 * n, (v, got[v])
    # exact at trim 0
    small = kll_sketch(df.filter("id < 100"), "x", "id", cap=1024)
    got0 = kll_rank(small, [2.0]).collect()[0]
    assert got0.rank_est == 100.0
    with pytest.raises(ValueError, match="probe"):
        kll_rank(sk, [])
