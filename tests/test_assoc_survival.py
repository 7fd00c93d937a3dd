"""ext/assoc.py and ext/survival.py vs brute-force replays, censoring
semantics, die-out tail, duplicate/NULL handling, guards."""

import math
from collections import OrderedDict, defaultdict

import numpy as np
import pytest

from assignment_etl_spark.ext.assoc import association_rules
from assignment_etl_spark.ext.survival import kaplan_meier


def test_association_rules_match_brute(spark):
    rng = np.random.RandomState(4)
    rows = []
    for u in range(200):
        for it, p in (("A", 0.5), ("B", 0.4), ("C", 0.3), ("D", 0.2)):
            if rng.rand() < p:
                rows.append((u, it))
        if rng.rand() < 0.5:  # correlated dup pair — multiplicity ignored
            rows.append((u, "A"))
            rows.append((u, "B"))
    df = spark.createDataFrame(rows, "u long, item string")
    got = {
        (r.antecedent, r.consequent): r
        for r in association_rules(
            df, basket_col="u", item_col="item", min_pair_support=2
        ).collect()
    }
    baskets = defaultdict(set)
    for u, it in rows:
        baskets[u].add(it)
    n = len(baskets)
    sup, supab = defaultdict(int), defaultdict(int)
    for its in baskets.values():
        for a in its:
            sup[a] += 1
            for b in its:
                if a < b:
                    supab[(a, b)] += 1
    expected = {(x, y) for (a, b), s in supab.items() if s >= 2
                for (x, y) in ((a, b), (b, a))}
    assert set(got) == expected
    for (x, y), r in got.items():
        s = supab[(min(x, y), max(x, y))]
        assert (r.sup_ab, r.sup_a, r.sup_b, r.n_baskets) == (s, sup[x], sup[y], n)
        assert r.support == pytest.approx(s / n, abs=1e-9)
        assert r.confidence == pytest.approx(s / sup[x], abs=1e-9)
        assert r.lift == pytest.approx(n * s / (sup[x] * sup[y]), abs=1e-9)


def test_association_rules_nulls_and_guard(spark):
    rows = [(1, "A"), (1, "B"), (None, "A"), (2, None), (2, "A"), (2, "B")]
    df = spark.createDataFrame(rows, "u long, item string")
    got = association_rules(
        df, basket_col="u", item_col="item", min_pair_support=2
    ).collect()
    # NULL basket/item rows dropped: both real baskets have {A,B}
    assert {(r.antecedent, r.consequent, r.sup_ab) for r in got} == {
        ("A", "B", 2), ("B", "A", 2),
    }
    with pytest.raises(ValueError, match="min_pair_support"):
        association_rules(df, basket_col="u", item_col="item", min_pair_support=0)


def _brute_km(dur, evt):
    tbl = OrderedDict()
    for d, e in sorted(zip(dur, evt)):
        tbl.setdefault(d, [0, 0])
        tbl[d][0 if e else 1] += 1
    at_risk, zero, cumlt = len(dur), False, 0.0
    out = []
    for t, (dd, cc) in tbl.items():
        if dd > 0 and dd == at_risk:
            zero = True
        if not zero and dd > 0:
            cumlt += round(math.log(1 - dd / at_risk), 9)
        s = 0.0 if zero else round(math.exp(cumlt), 6)
        out.append((t, at_risk, dd, cc, s))
        at_risk -= dd + cc
    return out


def test_kaplan_meier_matches_brute_with_dieout(spark):
    dur = [1, 1, 2, 2, 2, 3, 3, 4, 5, 5, 6, 6]
    evt = [1, 0, 1, 1, 0, 0, 1, 1, 0, 1, 1, 1]  # everyone left dies at 6
    df = spark.createDataFrame(
        [(float(d), bool(e)) for d, e in zip(dur, evt)], "d double, e boolean"
    )
    got = kaplan_meier(df, duration_col="d", event_col="e").orderBy("t").collect()
    want = _brute_km(dur, evt)
    assert [(r.t, r.n_risk, r.n_death, r.n_censor, r.survival) for r in got] == want
    assert got[-1].survival == 0.0  # die-out tail is exactly zero


def test_kaplan_meier_censoring_vs_naive(spark):
    # all censored → survival stays 1.0 (naive retention would decay)
    df = spark.createDataFrame(
        [(float(d), False) for d in (1, 2, 3)], "d double, e boolean"
    )
    got = kaplan_meier(df, duration_col="d", event_col="e").orderBy("t").collect()
    assert all(r.survival == 1.0 for r in got)
    assert [r.n_risk for r in got] == [3, 2, 1]


def test_kaplan_meier_null_handling(spark):
    # NULL duration excluded; NULL event flag counts as censored
    rows = [(1.0, True), (None, True), (2.0, None)]
    df = spark.createDataFrame(rows, "d double, e boolean")
    got = kaplan_meier(df, duration_col="d", event_col="e").orderBy("t").collect()
    assert len(got) == 2
    assert got[0].n_death == 1 and got[1].n_censor == 1
    assert got[0].survival == pytest.approx(0.5)
