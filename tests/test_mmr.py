"""ext/mmr.py: greedy selection vs a NumPy replay, diversity effect,
degenerate inputs, parameter guards."""

import numpy as np
import pytest

from assignment_etl_spark.ext.mmr import mmr_topk


def _numpy_mmr(vecs, q, k, lam, prefilter):
    qn = np.array(q)
    norm = np.sqrt((vecs**2).sum(1))
    rel = vecs @ qn / (np.sqrt(qn @ qn) * norm)
    head = sorted(range(len(vecs)), key=lambda i: (-rel[i], i))[:prefilter]
    sel, res = [], []
    for rnd in range(1, k + 1):
        best = None
        for i in head:
            if i in sel:
                continue
            if sel:
                ms = max(
                    vecs[i] @ vecs[s] / (norm[i] * norm[s]) for s in sel
                )
                sc = lam * rel[i] - (1 - lam) * ms
            else:
                sc = lam * rel[i]
            if best is None or sc > best[1] or (sc == best[1] and i < best[0]):
                best = (i, sc)
        if best is None:
            break
        sel.append(best[0])
        res.append((rnd, best[0], rel[best[0]], best[1]))
    return res


def test_matches_numpy_greedy(spark):
    rng = np.random.RandomState(21)
    vecs = rng.randn(120, 6).round(4)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [float(x) for x in vecs[5]]
    got = mmr_topk(df, q, k=6, lam=0.6, prefilter=48).collect()
    want = _numpy_mmr(vecs, q, 6, 0.6, 48)
    assert [(r.rank, r.pid) for r in got] == [(w[0], w[1]) for w in want]
    for r, w in zip(got, want):
        assert r.relevance == pytest.approx(w[2], abs=1e-6)
        assert r.mmr_score == pytest.approx(w[3], abs=1e-6)


def test_diversity_beats_plain_topk(spark):
    # two tight clusters near the query: plain top-k takes all of A,
    # MMR with a diversity weight must cross into cluster B
    a = [[1.0, 0.01 * i, 0.0] for i in range(6)]
    b = [[0.8, 0.0, 0.6]] * 3
    rows = [(i, v) for i, v in enumerate(a + b)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = mmr_topk(df, [1.0, 0.0, 0.0], k=3, lam=0.5, prefilter=9).collect()
    assert any(r.pid >= 6 for r in got)  # a B-cluster doc got selected


def test_lambda_one_is_plain_topk(spark):
    rng = np.random.RandomState(2)
    vecs = rng.randn(50, 4).round(4)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.0, 0.0, 0.0]
    got = mmr_topk(df, q, k=4, lam=1.0, prefilter=50).collect()
    norm = np.sqrt((vecs**2).sum(1))
    rel = vecs @ np.array(q) / norm
    want = sorted(range(50), key=lambda i: (-rel[i], i))[:4]
    assert [r.pid for r in got] == want


def test_zero_norm_and_null_excluded_and_short_pool(spark):
    rows = [(0, [0.0, 0.0]), (1, None), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = mmr_topk(df, [1.0, 1.0], k=5, lam=0.7, prefilter=10).collect()
    assert [r.pid for r in got] == [2, 3]  # only 2 usable candidates
    assert [r.rank for r in got] == [1, 2]


def test_param_guards(spark):
    df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="k >= 1"):
        mmr_topk(df, [1.0], k=0)
    with pytest.raises(ValueError, match="lam"):
        mmr_topk(df, [1.0], k=1, lam=1.5)
    with pytest.raises(ValueError, match="prefilter"):
        mmr_topk(df, [1.0], k=5, prefilter=3)


def test_kcenter_matches_numpy_greedy(spark):
    from assignment_etl_spark.ext.mmr import kcenter_coreset

    rng = np.random.RandomState(8)
    vecs = rng.randn(100, 5).round(4)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kcenter_coreset(df, k=6).collect()
    # numpy greedy farthest-point from id 0
    sel = [0]
    want = [(1, 0, None)]
    for rnd in range(2, 7):
        best = None
        for i in range(100):
            if i in sel:
                continue
            md = min(((vecs[i] - vecs[s]) ** 2).sum() for s in sel)
            if best is None or md > best[1] or (md == best[1] and i < best[0]):
                best = (i, md)
        sel.append(best[0])
        want.append((rnd, best[0], round(best[1], 6)))
    assert [(r.rank, r.pid, r.sel_dist) for r in got] == [
        (a, b, pytest.approx(c) if c is not None else None)
        for a, b, c in want
    ]
    # the coverage curve is non-increasing
    dists = [r.sel_dist for r in got if r.sel_dist is not None]
    assert all(a >= b for a, b in zip(dists, dists[1:]))


def test_kcenter_small_pool_and_guard(spark):
    from assignment_etl_spark.ext.mmr import kcenter_coreset

    rows = [(0, [0.0, 0.0]), (1, [3.0, 4.0]), (2, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kcenter_coreset(df, k=5).collect()
    assert [(r.rank, r.pid) for r in got] == [(1, 0), (2, 1)]
    assert got[1].sel_dist == pytest.approx(25.0)
    with pytest.raises(ValueError, match="k >= 1"):
        kcenter_coreset(df, k=0)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert kcenter_coreset(empty, k=3).count() == 0


def test_kcenter_batched_equals_batch1(spark):
    """Batched FPS is EXACT: any batch size reproduces batch=1 bit-for-bit
    (VERDICT r6 ask #6 — the in-batch re-check + strict admission
    threshold make batching a pure round-trip optimization)."""
    from assignment_etl_spark.ext.mmr import kcenter_coreset

    rng = np.random.RandomState(77)
    vecs = rng.randn(80, 4).round(3)
    # inject ties: duplicate vectors so equal distances exercise the
    # strict-threshold tie handling
    vecs[40] = vecs[7]
    vecs[41] = vecs[7]
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = [(r.rank, r.pid, r.sel_dist) for r in
            kcenter_coreset(df, k=10, batch=1).collect()]
    scans_b1 = kcenter_coreset.last_scan_count
    assert scans_b1 == 9  # k-1 scans at batch=1
    for b in (2, 4, 8, 16):
        got = [(r.rank, r.pid, r.sel_dist) for r in
               kcenter_coreset(df, k=10, batch=b).collect()]
        assert got == base, f"batch={b} diverged from batch=1"
        assert kcenter_coreset.last_scan_count < scans_b1
    # generous batch cuts round-trips toward ceil((k-1)/b)
    kcenter_coreset(df, k=10, batch=16)
    assert kcenter_coreset.last_scan_count <= 4


def test_kcenter_and_mmr_string_ids(spark):
    """pid inherits the input id dtype (ADVICE r6: hardcoded 'pid long'
    broke string doc ids at createDataFrame)."""
    from assignment_etl_spark.ext.mmr import kcenter_coreset

    rows = [("a", [0.0, 0.0]), ("b", [3.0, 4.0]), ("c", [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    got = kcenter_coreset(df, k=2).collect()
    assert [(r.rank, r.pid) for r in got] == [(1, "a"), (2, "b")]
    assert dict(got[0].asDict())["pid"] == "a"
    m = mmr_topk(df.filter("vec_id != 'a'"), [1.0, 0.0], k=2, lam=0.7,
                 prefilter=8).collect()
    assert {r.pid for r in m} == {"b", "c"}


def test_kcenter_unscorable_vector_never_picked(spark):
    """A wrong-length vector folds to inf min-distance (least() skips the
    NULL per-pick terms) — it must be excluded, and the loop must stop
    when only unscorable candidates remain (ADVICE r6)."""
    from assignment_etl_spark.ext.mmr import kcenter_coreset

    rows = [(0, [0.0, 0.0]), (1, [3.0, 4.0]), (2, [9.0]), (3, [1.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kcenter_coreset(df, k=4).collect()
    assert [r.pid for r in got] == [0, 1, 3]  # 2 is unscorable, skipped
    # only unscorable left: stops early instead of raising
    got2 = kcenter_coreset(df.filter("vec_id in (0, 2)"), k=3).collect()
    assert [r.pid for r in got2] == [0]


def test_mmr_batched_equals_batch1(spark):
    """Batched MMR is EXACT vs batch=1 — including the round-1 threshold
    inflation (negative cosines can RAISE an uncollected candidate's
    score above its collected λ·rel form)."""
    rng = np.random.RandomState(5)
    vecs = rng.randn(120, 5).round(3)
    vecs[60] = vecs[3]  # tie pressure
    vecs[61] = -vecs[3]  # anti-correlated: exercises negative cosines
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [float(x) for x in vecs[10]]
    for lam in (0.7, 0.3):
        base = [
            (r.rank, r.pid, r.relevance, r.mmr_score)
            for r in mmr_topk(
                df, q, k=8, lam=lam, prefilter=64, batch=1
            ).collect()
        ]
        scans_b1 = mmr_topk.last_scan_count
        assert scans_b1 == 8
        for b in (2, 4, 8):
            got = [
                (r.rank, r.pid, r.relevance, r.mmr_score)
                for r in mmr_topk(
                    df, q, k=8, lam=lam, prefilter=64, batch=b
                ).collect()
            ]
            assert got == base, (lam, b)
            assert mmr_topk.last_scan_count <= scans_b1
        mmr_topk(df, q, k=8, lam=lam, prefilter=64, batch=8)
        assert mmr_topk.last_scan_count <= 4, lam
