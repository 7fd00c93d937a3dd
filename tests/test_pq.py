"""ext/pq.py: subspace Lloyd vs a NumPy replay, ADC ranking, guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.pq import (
    pq_adc_topk,
    pq_encode_profile,
    pq_train,
)

N, DIM, M, DSUB, K, ITERS = 90, 8, 2, 4, 3, 2


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(3)
    return rng.randn(N, DIM).round(4)


@pytest.fixture(scope="module")
def emb(spark, vecs):
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _replay(vecs, sub):
    """NumPy replay of the portable per-subspace Lloyd kernel."""
    pts = vecs[:, sub * DSUB : (sub + 1) * DSUB]
    cents = pts[:K].astype(float).copy()
    for _ in range(ITERS):
        d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)  # argmin takes the first = smallest cidx
        for c in range(K):
            sel = pts[assign == c]
            if len(sel):
                cents[c] = np.round(sel, 7).sum(0) / len(sel)
    d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    assign = d.argmin(1)
    return assign, cents, d[np.arange(len(pts)), assign]


def test_train_matches_numpy_replay(emb, vecs):
    codes, cents = pq_train(emb, m=M, d_sub=DSUB, k=K, iters=ITERS)
    prof = pq_encode_profile(codes, cents).collect()
    assert len(prof) == M * K
    for r in prof:
        assign, c_np, dist = _replay(vecs, r.sub - 1)
        mask = assign == r.cidx - 1
        assert r.n_points == int(mask.sum())
        assert r.centroid_sum == pytest.approx(c_np[r.cidx - 1].sum(), abs=1e-6)
        assert r.sq_err == pytest.approx(
            float(np.round(dist[mask], 7).sum()), abs=1e-3
        )


def test_adc_matches_numpy(emb, vecs):
    codes, cents = pq_train(emb, m=M, d_sub=DSUB, k=K, iters=ITERS)
    q = [float(x) for x in vecs[7]]
    top = pq_adc_topk(codes, cents, q, m=M, d_sub=DSUB, topk=6).collect()
    adc = np.zeros(N)
    for sub in range(M):
        assign, c_np, _ = _replay(vecs, sub)
        qs = np.array(q[sub * DSUB : (sub + 1) * DSUB])
        lut = np.round(((c_np - qs) ** 2).sum(1), 7)
        adc += lut[assign]
    want = sorted(range(N), key=lambda i: (round(adc[i], 6), i))[:6]
    assert [r.pid for r in top] == want
    assert [r.rank for r in top] == list(range(1, 7))
    for r in top:
        assert r.adc_dist == pytest.approx(adc[r.pid], abs=1e-6)


def test_empty_cells_reported_not_dropped(spark):
    # all points identical → after iter 1 every point joins cell 1 and
    # cells 2..K keep their (identical) init centroid with population 0
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes, cents = pq_train(df, m=2, d_sub=2, k=3, iters=1)
    prof = pq_encode_profile(codes, cents).collect()
    assert len(prof) == 6
    pops = {(r.sub, r.cidx): r.n_points for r in prof}
    assert pops[(1, 1)] == 20 and pops[(1, 2)] == 0 and pops[(1, 3)] == 0


def test_dim_mismatch_raises(spark):
    rows = [(0, [1.0] * 8), (1, [1.0] * 7)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # the guard fires at execution time — the eager init checkpoint
    # inside pq_train is the first thing that scans the bad row
    with pytest.raises(Exception, match="pq: declared dim"):
        codes, _ = pq_train(df, m=2, d_sub=4, k=1, iters=1)
        codes.collect()


def test_param_validation(emb):
    with pytest.raises(ValueError, match="need m, k, d_sub"):
        pq_train(emb, m=0, d_sub=4, k=2)
    codes, cents = pq_train(emb, m=M, d_sub=DSUB, k=K, iters=1)
    with pytest.raises(ValueError, match="topk"):
        pq_adc_topk(codes, cents, [0.0] * DIM, m=M, d_sub=DSUB, topk=0)
    with pytest.raises(ValueError, match="query has length"):
        pq_adc_topk(codes, cents, [0.0] * 3, m=M, d_sub=DSUB, topk=1)


def _coarse_replay(vecs, kc, iters=2):
    """NumPy replay of ext/kmeans.kmeans (mean_round=9, comp 7)."""
    cents = vecs[:kc].astype(float).copy()
    for _ in range(iters):
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(kc):
            sel = vecs[assign == c]
            if len(sel):
                cents[c] = np.round(np.round(sel, 7).sum(0) / len(sel), 9)
    d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    return d.argmin(1), cents


def _pq_replay(res, m, dsub, kq, iters=2):
    """NumPy replay of pq_train on residual vectors (no mean rounding)."""
    out = []
    for sub in range(m):
        pts = res[:, sub * dsub : (sub + 1) * dsub]
        cents = pts[:kq].astype(float).copy()
        for _ in range(iters):
            d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(kq):
                sel = pts[assign == c]
                if len(sel):
                    cents[c] = np.round(sel, 7).sum(0) / len(sel)
        d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        out.append((d.argmin(1), cents))
    return out


def test_ivfpq_matches_numpy_pipeline(spark):
    from assignment_etl_spark.ext.kmeans import kmeans
    from assignment_etl_spark.ext.pq import ivfpq_search, pq_train
    from pyspark.sql import functions as F

    rng = np.random.RandomState(13)
    n, dim, m, dsub, kq, kc, nprobe, topk = 140, 8, 2, 4, 3, 3, 2, 6
    vecs = rng.randn(n, dim).round(4)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assign, ccents = kmeans(emb, k=kc, iters=2)
    res_df = (
        emb.select(F.col("vec_id").alias("pid"), F.col("embedding").alias("v"))
        .join(assign.select("pid", F.col("cidx").alias("cell")), on="pid")
        .join(ccents.select(F.col("cidx").alias("cell"), F.col("c").alias("cc")), on="cell")
        .select("pid", "cell", F.zip_with("v", "cc", lambda a, b: a - b).alias("res"))
        .localCheckpoint(eager=True)
    )
    codes, pq_cents = pq_train(res_df, id_col="pid", vec_col="res", m=m, d_sub=dsub, k=kq, iters=2)
    codes_cell = codes.join(res_df.select("pid", "cell"), on="pid").select("pid", "cell", "sub", "cidx")
    q = [float(x) for x in vecs[4]]
    got = ivfpq_search(codes_cell, pq_cents, ccents, q, m=m, d_sub=dsub, nprobe=nprobe, topk=topk).collect()

    # full NumPy replay
    ca, cc = _coarse_replay(vecs, kc)
    res = vecs - cc[ca]
    pq = _pq_replay(res, m, dsub, kq)
    qn = np.array(q)
    cell_d = ((cc - qn) ** 2).sum(1)
    probed = sorted(range(kc), key=lambda c: (cell_d[c], c))[:nprobe]
    adc = {}
    for i in range(n):
        if ca[i] not in probed:
            continue
        qr = qn - cc[ca[i]]
        s = 0.0
        for sub in range(m):
            a_sub, c_sub = pq[sub]
            lut = np.round(
                ((c_sub - qr[sub * dsub : (sub + 1) * dsub]) ** 2).sum(1), 7
            )
            s += lut[a_sub[i]]
        adc[i] = round(s, 6)
    want = sorted(adc, key=lambda i: (adc[i], i))[:topk]
    assert [r.pid for r in got] == want
    for r in got:
        assert r.adc_dist == pytest.approx(adc[r.pid], abs=1e-6)
    # structural: every hit lives in a probed cell
    cell_of = {i: int(ca[i]) for i in range(n)}
    assert all(cell_of[r.pid] in [int(p) for p in probed] for r in got)


def test_ivfpq_guards(spark):
    from assignment_etl_spark.ext.pq import ivfpq_search

    empty = spark.createDataFrame([], "pid long, cell int, sub int, cidx int")
    cents = spark.createDataFrame([], "sub int, cidx int, c array<double>")
    cc = spark.createDataFrame([], "cidx int, c array<double>")
    with pytest.raises(ValueError, match="topk, nprobe"):
        ivfpq_search(empty, cents, cc, [0.0] * 8, m=2, d_sub=4, nprobe=0)
    with pytest.raises(ValueError, match="query has length"):
        ivfpq_search(empty, cents, cc, [0.0] * 5, m=2, d_sub=4)
