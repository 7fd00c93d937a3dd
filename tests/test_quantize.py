"""Scalar quantization (ext/quantize.py): code range, reconstruction
error bound, degenerate dimensions, endpoints exact."""

from pyspark.sql import functions as F

from assignment_etl_spark.ext.quantize import (
    LEVELS,
    dequantize,
    dim_stats,
    quantize,
)


def _vecs(spark):
    rows = [
        (1, [0.0, -1.0, 5.0]),
        (2, [1.0, 1.0, 5.0]),
        (3, [0.5, 0.0, 5.0]),
        (4, [0.25, -0.5, 5.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_codes_in_range_endpoints_exact(spark):
    df = _vecs(spark)
    stats = dim_stats(df)
    q = quantize(df, stats)
    codes = {r.vec_id: r.codes for r in q.collect()}
    assert all(0 <= c <= LEVELS for cs in codes.values() for c in cs)
    assert codes[1][0] == 0 and codes[2][0] == LEVELS  # min/max endpoints
    back = {r.vec_id: r.approx for r in dequantize(q, stats).collect()}
    assert back[1][0] == 0.0 and back[2][0] == 1.0  # endpoints reconstruct exactly


def test_reconstruction_error_bounded(spark):
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-2, 2) for _ in range(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    stats = dim_stats(df)
    back = dequantize(quantize(df, stats), stats)
    err = back.select(
        F.max(
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.col("approx"),
                    lambda a, b: F.abs(a - b),
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            )
        ).alias("max_err")
    ).first().max_err
    # half a step per dimension: (hi-lo)/255/2 ≤ 4/255/2 ≈ 0.00784
    assert err <= 4.0 / LEVELS / 2 + 1e-12


def test_degenerate_dimension(spark):
    df = _vecs(spark)
    stats = dim_stats(df)
    q = quantize(df, stats)
    assert all(r.codes[2] == 0 for r in q.collect())  # constant dim 5.0
    back = dequantize(q, stats)
    assert all(r.approx[2] == 5.0 for r in back.collect())  # exact
