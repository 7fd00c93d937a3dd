"""Rank-agreement metrics (ext/rankcmp.py): exact endpoints on
identical/reversed rankings, hand-computed RBO, and validation."""

import math

import pytest

from assignment_etl_spark.ext.rankcmp import ranked, rbo_estimate, spearman_rho


@pytest.fixture(scope="module")
def scores(spark):
    # ids 1..10 with strictly decreasing score: rank_i = i
    rows = [(i, float(100 - i)) for i in range(1, 11)]
    return spark.createDataFrame(rows, "doc_id long, s double")


def test_identical_rankings(spark, scores):
    a = ranked(scores, id_col="doc_id", score_col="s")
    r = spearman_rho(a, a, id_col="doc_id").collect()[0]
    assert (r.n, r.rho) == (10, 1.0)
    rb = rbo_estimate(a, a, id_col="doc_id", p=0.9, depth=5).collect()[0]
    # overlap@d = d for every d → Ad = 1 → rbo = (1-p)·Σ p^(d-1) = 1 - p^5
    assert rb.overlap_at_depth == 5
    assert rb.rbo == pytest.approx(1 - 0.9**5, abs=1e-6)


def test_reversed_rankings(spark, scores):
    rev = scores.selectExpr("doc_id", "-s AS s")
    a = ranked(scores, id_col="doc_id", score_col="s")
    b = ranked(rev, id_col="doc_id", score_col="s")
    r = spearman_rho(a, b, id_col="doc_id").collect()[0]
    assert r.rho == -1.0
    rb = rbo_estimate(a, b, id_col="doc_id", p=0.9, depth=5).collect()[0]
    # top-5 prefixes are disjoint halves → zero overlap everywhere
    assert (rb.overlap_at_depth, rb.rbo) == (0, 0.0)


def test_rank_ties_broken_by_id(spark):
    tied = spark.createDataFrame(
        [(3, 1.0), (1, 1.0), (2, 2.0)], "doc_id long, s double"
    )
    got = {r.doc_id: r.rank for r in ranked(tied, id_col="doc_id", score_col="s").collect()}
    assert got == {2: 1, 1: 2, 3: 3}


def test_partial_overlap_hand_computed(spark):
    # a ranks 1,2,3,4 ; b swaps the top two → m = (2,2,3,4)
    a_df = spark.createDataFrame(
        [(i, float(10 - i)) for i in (1, 2, 3, 4)], "doc_id long, s double"
    )
    b_df = spark.createDataFrame(
        [(1, 9.0), (2, 10.0), (3, 7.0), (4, 6.0)], "doc_id long, s double"
    )
    a = ranked(a_df, id_col="doc_id", score_col="s")
    b = ranked(b_df, id_col="doc_id", score_col="s")
    rb = rbo_estimate(a, b, id_col="doc_id", p=0.5, depth=4).collect()[0]
    # overlap: d=1→0, d=2→2, d=3→3, d=4→4
    expect = 0.5 * (0.5 * 0 / 1 + 0.5**1 * 2 / 2 + 0.5**2 * 3 / 3 + 0.5**3 * 4 / 4)
    assert rb.rbo == pytest.approx(expect, abs=1e-6)
    r = spearman_rho(a, b, id_col="doc_id").collect()[0]
    # d² sum = 1+1 = 2 → rho = 1 − 12/(4·15) = 0.8
    assert r.rho == 0.8


def test_validation(spark, scores):
    a = ranked(scores, id_col="doc_id", score_col="s")
    with pytest.raises(ValueError, match="0 < p < 1"):
        rbo_estimate(a, a, id_col="doc_id", p=1.5)
    with pytest.raises(ValueError, match="depth"):
        rbo_estimate(a, a, id_col="doc_id", depth=0)


def test_spearman_partial_scorer_reranks_intersection(spark, scores):
    # a partial scorer covering only ids 9,10 (which rank 9,10 = LAST in
    # the full ranking): raw-rank d would be 8 each and the permutation
    # formula would emit rho = -19207-style garbage; re-ranking within
    # the intersection must give exactly rho = 1 (same relative order)
    partial = scores.filter("doc_id >= 9")
    a = ranked(partial, id_col="doc_id", score_col="s")
    b = ranked(scores, id_col="doc_id", score_col="s")
    r = spearman_rho(a, b, id_col="doc_id").collect()[0]
    assert r.n == 2
    assert r.rho == 1.0
    # and reversed relative order on the intersection → exactly -1
    rev = partial.selectExpr("doc_id", "-s AS s")
    r2 = spearman_rho(
        ranked(rev, id_col="doc_id", score_col="s"), b, id_col="doc_id"
    ).collect()[0]
    assert r2.rho == -1.0


def test_spearman_tied_input_ranks_deterministic(spark):
    # rank()-style TIED input ranks (not produced by ranked()): the
    # intersection re-rank must break ties by id on both sides, making
    # the result stable and equal across repeated runs
    a = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 2), (2, 2), (3, 1)], "doc_id long, rank long"
    )
    r1 = spearman_rho(a, b, id_col="doc_id").collect()[0]
    r2 = spearman_rho(a, b, id_col="doc_id").collect()[0]
    assert (r1.n, r1.rho) == (r2.n, r2.rho)
    # ties broken by doc_id: a -> (1,2,3); b -> (2,3,1); d2 = 1+1+4
    assert r1.rho == round(1 - 6 * 6 / (3 * 8), 6)
