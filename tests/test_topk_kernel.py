"""The shared exact top-k kernel (`_topk_tie_exact`) and its two
consumers (`bucket_topk_scorer`, `brute_force_topk_pandas`).

Pins the round-10 hardening: under MORE than tie_margin-way exact-score
ties at the k-th boundary the kernel widens to the full tie class, so
the (score desc, id asc) rule is exact and independent of candidate
input order — the shuffle-fetch-order nondeterminism ADVICE r9 flagged.
"""

import numpy as np
import pandas as pd
import pytest

from assignment_etl_spark.ext.similarity import (
    _topk_tie_exact,
    bucket_topk_scorer,
    brute_force_topk_pandas,
)


def _reference_topk(sims, ids, k):
    """Full-sort reference: per row, all unmasked cols by (-score, id)."""
    out = []
    for i in range(sims.shape[0]):
        cols = [j for j in range(sims.shape[1]) if sims[i, j] > -np.inf]
        cols.sort(key=lambda j: (-sims[i, j], ids[j]))
        out.append(np.asarray(cols[:k], dtype="int64"))
    return out


def test_kernel_matches_full_sort_random():
    rng = np.random.RandomState(7)
    sims = rng.rand(40, 200)
    # inject mass ties: a 30-way exact tie class straddling the boundary
    sims[:, 50:80] = 0.75
    sims[5, :] = 0.5  # whole row tied
    ids = rng.permutation(200).astype("int64")
    got = _topk_tie_exact(sims, ids, 10, tie_margin=8)
    want = _reference_topk(sims, ids, 10)
    for g, w in zip(got, want):
        assert g.tolist() == w.tolist()


def test_kernel_order_independent_under_mass_ties():
    """16 exact duplicates at the k boundary: permuting candidate column
    order must not change WHICH ids are selected (ascending-id rule over
    the full tie class, not over an arbitrary rim subset)."""
    rng = np.random.RandomState(3)
    n = 64
    sims = np.full((1, n), 0.1)
    sims[0, :16] = 0.9  # 16-way exact tie, tie_margin=8 < 16
    ids = np.arange(1000, 1000 + n).astype("int64")
    base = _topk_tie_exact(sims, ids, 5, tie_margin=8)[0]
    assert ids[base].tolist() == [1000, 1001, 1002, 1003, 1004]
    for _ in range(5):
        perm = rng.permutation(n)
        sel = _topk_tie_exact(sims[:, perm], ids[perm], 5, tie_margin=8)[0]
        assert ids[perm][sel].tolist() == [1000, 1001, 1002, 1003, 1004]


def test_kernel_masks_and_short_rows():
    sims = np.array([[-np.inf, 0.2, 0.9], [-np.inf, -np.inf, -np.inf]])
    ids = np.array([1, 2, 3], dtype="int64")
    got = _topk_tie_exact(sims, ids, 5, tie_margin=1)
    assert got[0].tolist() == [2, 1]
    assert got[1].tolist() == []


def test_bucket_scorer_sixteen_identical_vectors():
    """The ADVICE r9 scenario: a bucket holding 16 exact-duplicate
    vectors (cos_sim == 1.0 ties, > tie_margin=8). The ascending-dst
    rule must hold for every probe, in any within-bucket row order."""
    schema, score = bucket_topk_scorer(4)
    dup = [1.0, 2.0, 3.0]
    probes = pd.DataFrame(
        {
            "src": np.array([999], dtype="int64"),
            "_qv": [np.array(dup)],
            "_qn": [float(np.linalg.norm(dup))],
        }
    )
    cand_ids = np.arange(100, 116, dtype="int64")
    for order in (cand_ids, cand_ids[::-1].copy()):
        cands = pd.DataFrame(
            {
                "_cid": order,
                "_cv": [np.array(dup)] * 16,
                "_cn": [float(np.linalg.norm(dup))] * 16,
            }
        )
        out = score(probes, cands)
        assert out["dst"].tolist() == [100, 101, 102, 103]
        assert np.allclose(out["cos_sim"], 1.0)


def test_bucket_scorer_matches_reference_random():
    rng = np.random.RandomState(11)
    nq, nc, dim, k = 17, 60, 8, 6
    qv = rng.randn(nq, dim)
    cv = rng.randn(nc, dim)
    cv[20:40] = cv[20]  # 20-way duplicate class
    qids = np.arange(nq, dtype="int64")
    cids = rng.permutation(1000)[:nc].astype("int64")
    cids[5] = qids[5]  # one self-pair to mask
    schema, score = bucket_topk_scorer(k)
    probes = pd.DataFrame(
        {
            "src": qids,
            "_qv": list(qv),
            "_qn": np.linalg.norm(qv, axis=1),
        }
    )
    cands = pd.DataFrame(
        {"_cid": cids, "_cv": list(cv), "_cn": np.linalg.norm(cv, axis=1)}
    )
    out = score(probes, cands)
    sims = (qv @ cv.T) / np.outer(
        np.linalg.norm(qv, axis=1), np.linalg.norm(cv, axis=1)
    )
    sims[qids[:, None] == cids[None, :]] = -np.inf
    want = _reference_topk(sims, cids, k)
    got = {s: g["dst"].tolist() for s, g in out.groupby("src", sort=True)}
    for i, w in enumerate(want):
        assert got.get(qids[i], []) == cids[w].tolist()


def test_brute_force_pandas_uses_kernel(spark):
    """End-to-end: duplicate candidate vectors, ascending-neighbor_id
    ties, self-pair excluded — the unified kernel through mapInPandas."""
    rows = [(int(i), [1.0, 0.0, float(i % 3) * 0.01]) for i in range(12)]
    # ids 20-27 share one exact vector
    rows += [(int(20 + j), [0.5, 0.5, 0.5]) for j in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(100, [0.5, 0.5, 0.5])], "vec_id long, embedding array<double>"
    )
    out = brute_force_topk_pandas(q, df, 5).toPandas()
    assert out["neighbor_id"].tolist() == [20, 21, 22, 23, 24]
    assert out["rank"].tolist() == [1, 2, 3, 4, 5]
    assert np.allclose(out["cos_sim"], 1.0)
