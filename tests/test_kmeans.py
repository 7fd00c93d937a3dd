"""Portable k-means (ext/kmeans.py): convergence on separable data,
determinism across partitionings, empty-cluster survival."""

from pyspark.sql import functions as F

from assignment_etl_spark.ext.kmeans import kmeans


def _clusters(spark, reps=1):
    # three tight blobs around (0,0), (10,0), (0,10)
    rows = []
    pid = 0
    for _ in range(reps):
        for cx, cy in ((0.0, 0.0), (10.0, 0.0), (0.0, 10.0)):
            for dx, dy in ((0.1, 0.0), (-0.1, 0.1), (0.0, -0.1), (0.2, 0.1)):
                rows.append((pid, [cx + dx, cy + dy]))
                pid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_separable_blobs_recovered(spark):
    df = _clusters(spark)
    assign, cents = kmeans(df, k=3, iters=3)
    got = {r.pid: r.cidx for r in assign.collect()}
    # all members of a blob share a cluster; different blobs differ
    blobs = [set(range(0, 4)), set(range(4, 8)), set(range(8, 12))]
    labels = [{got[p] for p in b} for b in blobs]
    assert all(len(l) == 1 for l in labels)
    assert len({next(iter(l)) for l in labels}) == 3
    # centroids land near blob centers
    cs = {r.cidx: r.c for r in cents.collect()}
    mags = sorted(round(sum(v), 6) for v in cs.values())
    # exact offset means per blob: (0.05, 0.025) → sums 0.075 / 10.075
    assert mags == [0.075, 10.075, 10.075]


def test_deterministic_across_partitionings(spark):
    df = _clusters(spark, reps=8)
    a1, c1 = kmeans(df.repartition(1), k=3, iters=2)
    a2, c2 = kmeans(df.repartition(13), k=3, iters=2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))


def test_empty_cluster_keeps_centroid(spark):
    # k=3 over two distinct points: one init centroid never wins a point
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [100.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    assign, cents = kmeans(df, k=3, iters=2)
    assert cents.count() == 3  # survived with its previous position
    got = {r.pid: r.cidx for r in assign.collect()}
    assert got[1] == got[2] != got[3]


def test_assignment_distances_are_squared_l2(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    assign, _ = kmeans(df, k=2, iters=1)
    d = {r.pid: r.dist for r in assign.collect()}
    assert d[1] == 0.0 and d[2] == 0.0  # both are their own centroids
