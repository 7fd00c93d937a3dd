"""ext/rankstats.py: KS and Mann–Whitney vs brute-force NumPy oracles,
tie handling, NULL/empty contracts, and the multi-column cumsum."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.rankstats import ks_two_sample, mann_whitney_u
from assignment_etl_spark.ops.ids import global_cumsum_multi


def _brute_ks(a, b):
    allv = np.sort(np.unique(np.concatenate([a, b])))
    cdfa = np.searchsorted(np.sort(a), allv, side="right") / len(a)
    cdfb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
    return float(np.abs(cdfa - cdfb).max())


def _brute_mwu(a, b):
    comb = np.concatenate([a, b])
    order = np.argsort(comb, kind="mergesort")
    ranks = np.empty(len(comb))
    sv = comb[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n1, n2, n = len(a), len(b), len(comb)
    u = ranks[: len(a)].sum() - n1 * (n1 + 1) / 2
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(comb.tolist()).values())
    var = n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u - n1 * n2 / 2) / np.sqrt(var) if var > 0 else None
    return u, z


def _df(spark, a, b):
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    return spark.createDataFrame(rows, "grp string, val double")


def test_ks_matches_brute_force(spark):
    rng = np.random.RandomState(11)
    a = rng.randint(0, 40, 350).astype(float)
    b = rng.randint(10, 50, 270).astype(float)
    row = ks_two_sample(_df(spark, a, b), "grp", "val", "a", "b").collect()[0]
    assert row.n_a == 350 and row.n_b == 270
    assert row.d_stat == pytest.approx(round(_brute_ks(a, b), 9), abs=1e-9)
    scale = np.sqrt(350 * 270 / 620)
    assert row.ks_scaled == pytest.approx(scale * _brute_ks(a, b), abs=1e-6)
    assert row.reject == (scale * _brute_ks(a, b) > 1.358)


def test_ks_identical_samples_zero(spark):
    vals = [1.0, 2.0, 2.0, 3.0] * 10
    rows = [("a", v) for v in vals] + [("b", v) for v in vals]
    df = spark.createDataFrame(rows, "grp string, val double")
    row = ks_two_sample(df, "grp", "val", "a", "b").collect()[0]
    assert row.d_stat == 0.0 and row.reject is False


def test_mwu_matches_brute_force_heavy_ties(spark):
    rng = np.random.RandomState(5)
    a = rng.randint(0, 8, 300).astype(float)  # 8 distinct values → huge ties
    b = rng.randint(2, 10, 240).astype(float)
    row = mann_whitney_u(_df(spark, a, b), "grp", "val", "a", "b").collect()[0]
    u, z = _brute_mwu(a, b)
    assert int(row.u2_stat) == int(round(2 * u))
    assert row.u_stat == pytest.approx(u, abs=1e-9)
    assert row.z_stat == pytest.approx(z, abs=1e-8)


def test_mwu_all_tied_null_z(spark):
    rows = [("a", 5.0)] * 4 + [("b", 5.0)] * 6
    df = spark.createDataFrame(rows, "grp string, val double")
    row = mann_whitney_u(df, "grp", "val", "a", "b").collect()[0]
    # var = 0 → z must be NULL, not inf/NaN; U is still defined
    assert row.z_stat is None
    u, _ = _brute_mwu(np.array([5.0] * 4), np.array([5.0] * 6))
    assert row.u_stat == pytest.approx(u)


def test_null_values_and_other_groups_excluded(spark):
    rows = [("a", 1.0), ("a", None), ("b", 2.0), ("c", 99.0), (None, 3.0)]
    df = spark.createDataFrame(rows, "grp string, val double")
    row = ks_two_sample(df, "grp", "val", "a", "b").collect()[0]
    assert row.n_a == 1 and row.n_b == 1 and row.d_stat == 1.0


def test_empty_and_one_sided_contracts(spark):
    empty = spark.createDataFrame([], "grp string, val double")
    row = ks_two_sample(empty, "grp", "val", "a", "b").collect()[0]
    assert (row.n_a, row.n_b, row.d_stat, row.reject) == (0, 0, None, None)
    row = mann_whitney_u(empty, "grp", "val", "a", "b").collect()[0]
    assert (row.n_a, row.n_b, row.u_stat, row.z_stat) == (0, 0, None, None)
    # one group missing entirely → counts reported, statistic NULL
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "grp string, val double")
    row = mann_whitney_u(one, "grp", "val", "a", "b").collect()[0]
    assert row.n_a == 2 and row.n_b == 0 and row.z_stat is None


def test_global_cumsum_multi_matches_single(spark):
    rng = np.random.RandomState(3)
    rows = [
        (int(k), int(x), int(y))
        for k, x, y in zip(
            rng.permutation(200), rng.randint(0, 9, 200), rng.randint(1, 5, 200)
        )
    ]
    df = spark.createDataFrame(rows, "k long, x long, y long")
    out = (
        global_cumsum_multi(
            df, [F.asc("k")], [("x", "cx"), ("y", "cy")], row_num_col="rn"
        )
        .orderBy("k")
        .collect()
    )
    xs = sorted(rows)
    cx = np.cumsum([r[1] for r in xs])
    cy = np.cumsum([r[2] for r in xs])
    for i, r in enumerate(out):
        assert (r.cx, r.cy, r.rn) == (cx[i], cy[i], i + 1)


def test_ks_rejects_bad_alpha(spark):
    df = spark.createDataFrame([("a", 1.0)], "grp string, val double")
    with pytest.raises(ValueError):
        ks_two_sample(df, "grp", "val", "a", "b", alpha=0.2)


def test_conformal_threshold_matches_brute(spark):
    from assignment_etl_spark.ext.rankstats import conformal_threshold

    rng = np.random.RandomState(17)
    vals = rng.randn(400).round(3)
    rows = [(int(i), float(v), bool(i % 2 == 0)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, s double, is_calib boolean")
    row = conformal_threshold(df, "s", alpha=0.1).collect()[0]
    calib = np.sort(vals[::2])
    r = int(np.ceil((len(calib) + 1) * 0.9))
    thr = calib[r - 1]
    test = vals[1::2]
    cov = float((test <= thr).mean())
    assert row.n_calib == len(calib) and row.rank_q == r
    assert row.threshold == pytest.approx(thr)
    assert row.n_test == len(test)
    assert row.coverage == pytest.approx(cov, abs=1e-9)
    # the conformal guarantee itself on exchangeable gaussian data
    assert row.coverage >= 0.85


def test_conformal_small_calibration_inf_threshold(spark):
    from assignment_etl_spark.ext.rankstats import conformal_threshold

    # n_calib = 3, alpha = 0.1 → r = ceil(4*0.9) = 4 > 3 → threshold +inf
    rows = [(1.0, True), (2.0, True), (3.0, True), (99.0, False)]
    df = spark.createDataFrame(rows, "s double, is_calib boolean")
    row = conformal_threshold(df, "s", alpha=0.1).collect()[0]
    assert row.threshold is None and row.n_covered == 1
    assert row.coverage == pytest.approx(1.0)


def test_conformal_alpha_guard(spark):
    from assignment_etl_spark.ext.rankstats import conformal_threshold

    df = spark.createDataFrame([(1.0, True)], "s double, is_calib boolean")
    with pytest.raises(ValueError, match="alpha"):
        conformal_threshold(df, "s", alpha=0.0)


def test_score_auc_matches_sklearn_free_brute(spark):
    from assignment_etl_spark.ext.rankstats import score_auc

    rng = np.random.RandomState(23)
    pos = rng.randn(150) + 0.8
    neg = rng.randn(200)
    rows = [(True, round(float(v), 2)) for v in pos] + [
        (False, round(float(v), 2)) for v in neg
    ]
    df = spark.createDataFrame(rows, "y boolean, s double")
    row = score_auc(df, "y", "s").collect()[0]
    # brute AUC with tie credit
    wins = ties = 0
    for p in pos:
        for n in neg:
            p2, n2 = round(p, 2), round(n, 2)
            if p2 > n2:
                wins += 1
            elif p2 == n2:
                ties += 1
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert (row.n_pos, row.n_neg) == (150, 200)
    assert row.auc == pytest.approx(want, abs=1e-9)
    assert row.z_stat > 3  # clearly separable -> significant


def test_score_auc_degenerate_single_class(spark):
    from assignment_etl_spark.ext.rankstats import score_auc

    df = spark.createDataFrame([(True, 1.0), (True, 2.0)], "y boolean, s double")
    row = score_auc(df, "y", "s").collect()[0]
    assert row.n_pos == 2 and row.n_neg == 0 and row.auc is None
