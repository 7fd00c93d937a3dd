"""Deterministic Laplace noisy counts (ext/privacy.dp_noisy_counts):
reproducibility, salt sensitivity, noise-scale behavior, zero-mean-ish
magnitude bounds, and validation."""

import math

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.privacy import dp_noisy_counts


@pytest.fixture(scope="module")
def groups(spark):
    rows = [(f"g{i % 10}", i) for i in range(500)]
    return spark.createDataFrame(rows, "g string, v long")


def test_deterministic_and_salt_sensitive(spark, groups):
    a = {r.g: r.noisy_count for r in dp_noisy_counts(groups, ["g"], epsilon=1.0, salt=1).collect()}
    b = {r.g: r.noisy_count for r in dp_noisy_counts(groups, ["g"], epsilon=1.0, salt=1).collect()}
    c = {r.g: r.noisy_count for r in dp_noisy_counts(groups, ["g"], epsilon=1.0, salt=2).collect()}
    assert a == b, "same salt → identical release"
    assert a != c, "a fresh salt must redraw every group's noise"


def test_noise_scale_tracks_epsilon(spark, groups):
    # true count is 50 per group; lower epsilon → larger noise magnitude
    tight = dp_noisy_counts(groups, ["g"], epsilon=10.0, salt=3).collect()
    loose = dp_noisy_counts(groups, ["g"], epsilon=0.1, salt=3).collect()
    mean_abs_tight = sum(abs(r.noisy_count - 50) for r in tight) / len(tight)
    mean_abs_loose = sum(abs(r.noisy_count - 50) for r in loose) / len(loose)
    # same u per group (same salt): loose is exactly 100x tight
    assert mean_abs_loose == pytest.approx(100 * mean_abs_tight, rel=1e-3)
    # Laplace(b=0.1) noise keeps counts near-exact at eps=10
    assert mean_abs_tight < 1.0


def test_true_count_not_emitted(spark, groups):
    out = dp_noisy_counts(groups, ["g"], epsilon=1.0, salt=5)
    assert set(out.columns) == {"g", "noisy_count", "epsilon"}


def test_validation(spark, groups):
    with pytest.raises(ValueError, match="epsilon"):
        dp_noisy_counts(groups, ["g"], epsilon=0.0, salt=1)
    # salt is REQUIRED (ADVICE r5): a defaulted/public salt makes the
    # release invertible while still carrying an epsilon column
    with pytest.raises(TypeError):
        dp_noisy_counts(groups, ["g"], epsilon=1.0)


def test_sensitivity_validation_and_null_group(spark):
    rows = [("a", 1), ("a", 2), (None, 3), ("", 4)]
    df = spark.createDataFrame(rows, "g string, v long")
    with pytest.raises(ValueError, match="sensitivity"):
        dp_noisy_counts(df, ["g"], epsilon=1.0, salt=1, sensitivity=0.0)
    out = {r.g: r.noisy_count for r in dp_noisy_counts(df, ["g"], epsilon=1.0, salt=0).collect()}
    # NULL group survives with its own (sentinel-hashed) noise, distinct
    # from the empty-string group's noise
    assert set(out) == {"a", None, ""}
    assert out[None] is not None
    assert abs(out[None] - 1) != abs(out[""] - 1), "NULL and '' must not collide"
