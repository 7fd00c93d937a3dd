"""KNN-Shapley data valuation (ext/valuation.py): golden agreement with
a direct implementation of the Jia et al. recurrence, plus the efficiency
property that values sum to the validation accuracy."""

import math

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.valuation import knn_shapley


def _ref_knn_shapley(train, valid, k):
    """train/valid: [(id, vec, label)]; returns {train_id: mean shapley}."""

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(x * x for x in b))
        return num / (da * db) if da and db else 0.0

    acc = {tid: 0.0 for tid, _, _ in train}
    for _qid, qv, qy in valid:
        order = sorted(train, key=lambda t: (1.0 - cos(t[1], qv), t[0]))
        n = len(order)
        s = [0.0] * n
        s[n - 1] = (1.0 if order[n - 1][2] == qy else 0.0) / n
        for i in range(n - 2, -1, -1):
            mi = 1.0 if order[i][2] == qy else 0.0
            mj = 1.0 if order[i + 1][2] == qy else 0.0
            s[i] = s[i + 1] + (mi - mj) / k * min(k, i + 1) / (i + 1)
        for (tid, _, _), v in zip(order, s):
            acc[tid] += v
    return {tid: v / len(valid) for tid, v in acc.items()}


@pytest.fixture(scope="module")
def vec_tables(spark):
    rows = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(6)], i % 3)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    return rows, df


def test_matches_reference(spark, vec_tables):
    rows, df = vec_tables
    valid_rows = [r for r in rows if r[0] < 5]
    train_rows = [r for r in rows if r[0] >= 5]
    got = {
        r.vec_id: r.shapley
        for r in knn_shapley(
            df.filter("vec_id >= 5"), df.filter("vec_id < 5"), k=3
        ).collect()
    }
    want = _ref_knn_shapley(train_rows, valid_rows, 3)
    assert set(got) == set(want)
    for tid in want:
        assert got[tid] == pytest.approx(want[tid], abs=1e-6), tid


def test_efficiency_sums_to_accuracy(spark, vec_tables):
    """Σ_i shapley_i = K-NN accuracy of the full train set on valid —
    the Shapley efficiency axiom, a strong end-to-end invariant."""
    rows, df = vec_tables
    k = 3
    valid_rows = [r for r in rows if r[0] < 5]
    train_rows = [r for r in rows if r[0] >= 5]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a)) or 1.0
        db = math.sqrt(sum(x * x for x in b)) or 1.0
        return num / (da * db)

    accs = []
    for _qid, qv, qy in valid_rows:
        order = sorted(train_rows, key=lambda t: (1.0 - cos(t[1], qv), t[0]))
        topk = order[:k]
        accs.append(sum(1.0 for t in topk if t[2] == qy) / k)
    expected = sum(accs) / len(accs)

    total = (
        knn_shapley(df.filter("vec_id >= 5"), df.filter("vec_id < 5"), k=k)
        .agg(F.sum("shapley"))
        .collect()[0][0]
    )
    assert total == pytest.approx(expected, abs=1e-5)


def test_k_validation(spark, vec_tables):
    _rows, df = vec_tables
    with pytest.raises(ValueError, match="k must be"):
        knn_shapley(df, df, k=0)


def test_deterministic_across_partitionings(spark, vec_tables):
    _rows, df = vec_tables
    a = knn_shapley(
        df.filter("vec_id >= 5").repartition(1), df.filter("vec_id < 5"), k=4
    )
    b = knn_shapley(
        df.filter("vec_id >= 5").repartition(13), df.filter("vec_id < 5"), k=4
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
