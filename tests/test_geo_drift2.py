"""Grid radius join (ext/geo.py) and chi-square independence
(ext/drift.py)."""

import math

from pyspark.sql import functions as F

from assignment_etl_spark.ext.drift import chi_square_independence
from assignment_etl_spark.ext.geo import (
    haversine_km,
    radius_join,
    self_radius_pairs,
)


def _points(spark, rows):
    return spark.createDataFrame(rows, "id long, lat double, lon double")


def test_haversine_known_distance(spark):
    # 1 degree of latitude ≈ 111.19 km on the 6371 km sphere
    df = spark.createDataFrame([(1,)], "x int")
    d = df.select(
        haversine_km(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)).alias("d")
    ).first().d
    assert abs(d - 111.19) < 0.01


def test_radius_join_finds_cross_cell_neighbors(spark):
    # two points 0.1° apart straddling the 1° cell boundary at lat 1.0
    a = _points(spark, [(1, 0.95, 0.5)])
    b = _points(spark, [(2, 1.05, 0.5)])
    got = radius_join(a, b, radius_km=20, cell_deg=1.0).collect()
    assert len(got) == 1 and got[0].left_id == 1 and got[0].right_id == 2
    assert abs(got[0].dist_km - 11.12) < 0.05


def test_radius_join_excludes_far_points(spark):
    a = _points(spark, [(1, 0.0, 0.0)])
    b = _points(spark, [(2, 0.5, 0.5), (3, 0.05, 0.05)])
    got = {r.right_id for r in radius_join(a, b, radius_km=20, cell_deg=1.0).collect()}
    assert got == {3}  # point 2 is ~78 km away


def test_self_pairs_dedup_and_order(spark):
    pts = _points(spark, [(1, 0.0, 0.0), (2, 0.01, 0.01), (3, 5.0, 5.0)])
    got = self_radius_pairs(pts, radius_km=5, cell_deg=1.0).collect()
    assert len(got) == 1
    assert (got[0].id_a, got[0].id_b) == (1, 2)


def test_matches_brute_force(spark):
    import itertools
    import random

    rng = random.Random(7)
    rows = [
        (i, rng.uniform(0, 3), rng.uniform(0, 3)) for i in range(60)
    ]
    pts = _points(spark, rows)
    got = {(r.id_a, r.id_b) for r in self_radius_pairs(pts, radius_km=40, cell_deg=1.0).collect()}

    def hav(p, q):
        la1, lo1, la2, lo2 = map(math.radians, (p[1], p[2], q[1], q[2]))
        a = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(min(1.0, math.sqrt(a)))

    want = {
        (p[0], q[0])
        for p, q in itertools.combinations(rows, 2)
        if round(hav(p, q), 6) <= 40
    }
    assert got == want


def test_chi_square_independent_uniform(spark):
    # perfectly independent: every (a,b) cell equal → chi2 = 0
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi_square_independence(df, "a", "b").first()
    assert (got.chi2, got.dof, got.n) == (0.0, 1, 100)


def test_chi_square_perfect_dependence(spark):
    # a == b always: chi2 = n * (k-1) for a k×k identity table
    rows = [(c, c) for c in "pqr" for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi_square_independence(df, "a", "b").first()
    assert got.dof == 4
    assert abs(got.chi2 - 30 * 2) < 1e-6


def test_mutual_information_independent_is_zero(spark):
    from assignment_etl_spark.ext.drift import mutual_information

    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = mutual_information(df, "a", "b").first()
    assert got.mi_nats == 0.0 and got.n == 100


def test_mutual_information_identity_is_entropy(spark):
    from assignment_etl_spark.ext.drift import mutual_information

    # a == b uniform over 4 symbols: I = H = ln(4)
    rows = [(c, c) for c in "pqrs" for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    got = mutual_information(df, "a", "b").first()
    assert abs(got.mi_nats - math.log(4)) < 1e-6


def test_column_entropy(spark):
    from assignment_etl_spark.ext.drift import column_entropy

    df = spark.createDataFrame(
        [("a", "x", None), ("a", "y", None), ("b", "x", None), ("b", "y", None)],
        "u string, v string, w string",
    )
    got = {r.column: r for r in column_entropy(df, ["u", "v", "w"]).collect()}
    assert abs(got["u"].entropy_nats - math.log(2)) < 1e-6
    assert abs(got["v"].entropy_nats - math.log(2)) < 1e-6
    assert got["w"].entropy_nats == 0.0  # constant (all NULL) column
    assert got["w"].n_distinct == 1  # NULL is a category
