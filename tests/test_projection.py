"""JL sign projection (ext/projection.py): matrix determinism, distance
preservation on real-ish vectors, NULL handling, and validation."""

import math
import random

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.projection import (
    jl_sign_matrix,
    project_embeddings,
)


def test_sign_matrix_deterministic_and_salted():
    a = jl_sign_matrix(16, 4, salt=0)
    assert a == jl_sign_matrix(16, 4, salt=0)
    assert a != jl_sign_matrix(16, 4, salt=1)
    assert all(s in (-1, 1) for row in a for s in row)
    assert len(a) == 4 and len(a[0]) == 16


def test_projection_matches_numpy_reference(spark):
    # the Spark fold (rounded terms, decimal sum, /sqrt(d)) must agree
    # with a plain python dot product to rounding precision
    rng = random.Random(11)
    vec = [rng.uniform(-1, 1) for _ in range(32)]
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
    out = project_embeddings(df, d_in=32, d_out=4, salt=5).collect()[0].projected
    signs = jl_sign_matrix(32, 4, salt=5)
    for j in range(4):
        ref = sum(round(v * s, 9) for v, s in zip(vec, signs[j])) / math.sqrt(4)
        assert out[j] == pytest.approx(ref, abs=2e-6)


def test_distance_preservation(spark):
    # JL with d_out=16 of 64 preserves pairwise distances within ~50%
    # for a handful of random vectors (loose sanity, not a proof)
    rng = random.Random(3)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    proj = {
        r.vec_id: r.projected
        for r in project_embeddings(df, d_in=64, d_out=16).collect()
    }
    orig = dict(rows)
    for a in range(6):
        for b in range(a + 1, 6):
            d0 = math.dist(orig[a], orig[b])
            d1 = math.dist(proj[a], proj[b])
            assert 0.5 < d1 / d0 < 2.0, (a, b, d0, d1)


def test_null_vector_and_validation(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, None)], "vec_id long, embedding array<double>"
    )
    got = {r.vec_id: r.projected for r in project_embeddings(df, d_in=8, d_out=2).collect()}
    assert got[2] is None and got[1] is not None
    with pytest.raises(ValueError, match="reduction"):
        project_embeddings(df, d_in=8, d_out=9)
    with pytest.raises(ValueError, match=">= 1"):
        project_embeddings(df, d_in=8, d_out=0)


def test_length_mismatch_raises(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 16)], "vec_id long, embedding array<double>"
    )
    out = project_embeddings(df, d_in=32, d_out=4)
    with pytest.raises(Exception, match="d_in=32"):
        out.collect()


def test_unroll_exactly_equals_fold(spark):
    """r11 Lloyd-unroll applied to the JL fold (sf10 A/B win): the
    term chain replicates the fold's decimal cast sequence, so
    projected coordinates are EXACTLY equal — forced both ways on the
    same rows."""
    from pyspark.sql import functions as F

    from assignment_etl_spark.ext.projection import project_embeddings

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) / 3.0 for j in range(16)]) for i in range(80)]
        + [(99, None)],
        "vec_id long, embedding array<double>",
    )
    a = project_embeddings(emb, d_in=16, d_out=4, salt=3, unroll=False)
    b = project_embeddings(emb, d_in=16, d_out=4, salt=3, unroll=True)
    ra = {r.vec_id: r.projected for r in a.collect()}
    rb = {r.vec_id: r.projected for r in b.collect()}
    assert ra == rb
    assert ra[99] is None
