"""Interval-overlap join (ops/intervals.py): hand-enumerable pairs, the
later-start-cell dedup guarantee across cell widths, empty/inverted
interval handling, and the brute-force equivalence property."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ops.intervals import (
    explode_profile,
    interval_overlap_join,
)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, 0, 100),      # overlaps r1, r2
            (2, 100, 200),    # overlaps r2 only ([100,200) vs [50,150))
            (3, 500, 510),    # overlaps nothing
            (4, 700, 700),    # empty interval: never matches
        ],
        "l_id long, start long, end long",
    )
    right = spark.createDataFrame(
        [
            (10, 50, 150),    # r2
            (11, -20, 5),     # r1: clips the left edge of l1
            (12, 200, 300),   # touches l2 at 200: half-open → NO match
        ],
        "r_id long, start long, end long",
    )
    return left, right


def expected_pairs():
    return {(1, 10), (1, 11), (2, 10)}


@pytest.mark.parametrize("cell_width", [1, 7, 50, 1000])
def test_pairs_exact_and_deduped(spark, sides, cell_width):
    left, right = sides
    got = interval_overlap_join(left, right, cell_width=cell_width).collect()
    pairs = [(r.l_id, r.r_id) for r in got]
    assert len(pairs) == len(set(pairs)), "a pair must survive exactly once"
    assert set(pairs) == expected_pairs()


def test_overlap_arithmetic(spark, sides):
    left, right = sides
    got = {
        (r.l_id, r.r_id): (
            max(r.start, r.start_r),
            min(r.end, r.end_r),
        )
        for r in interval_overlap_join(left, right, cell_width=30).collect()
    }
    assert got[(1, 11)] == (0, 5)
    assert got[(1, 10)] == (50, 100)
    assert got[(2, 10)] == (100, 150)


def test_matches_brute_force(spark):
    # property: grid join == brute-force theta join on hashed intervals
    import random

    rng = random.Random(7)
    rows_l = [(i, rng.randrange(0, 1000), 0) for i in range(60)]
    rows_l = [(i, s, s + rng.randrange(1, 120)) for i, s, _ in rows_l]
    rows_r = [(i, rng.randrange(0, 1000), 0) for i in range(60)]
    rows_r = [(i, s, s + rng.randrange(1, 80)) for i, s, _ in rows_r]
    left = spark.createDataFrame(rows_l, "l_id long, start long, end long")
    right = spark.createDataFrame(rows_r, "r_id long, start long, end long")
    brute = {
        (a, b)
        for a, sa, ea in rows_l
        for b, sb, eb in rows_r
        if sa < eb and sb < ea
    }
    got = {
        (r.l_id, r.r_id)
        for r in interval_overlap_join(left, right, cell_width=64).collect()
    }
    assert got == brute


def test_validation_and_profile(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="cell_width"):
        interval_overlap_join(left, right, cell_width=0)
    with pytest.raises(ValueError, match="inner"):
        interval_overlap_join(left, right, cell_width=10, how="left")
    prof = explode_profile(left, start="start", end="end", cell_width=50).collect()[0]
    # l1: cells 0,1; l2: cells 2,3; l3: cell 10; l4 empty: 0 cells
    assert (prof.n_intervals, prof.n_cells, prof.max_cells) == (4, 5, 2)


def test_reserved_and_suffix_collisions(spark, sides):
    left, right = sides
    bad = left.withColumnRenamed("l_id", "_cell")
    with pytest.raises(ValueError, match="_cell"):
        interval_overlap_join(bad, right, cell_width=10)
    # right 'start' collides with left 'start', and left already has a
    # 'start_r' column: the rename would duplicate it
    clashing = left.withColumn("start_r", left.start)
    with pytest.raises(ValueError, match="suffix collision"):
        interval_overlap_join(clashing, right, cell_width=10)
