"""Interval-overlap join (ops/intervals.py): hand-enumerable pairs, the
later-start-cell dedup guarantee across cell widths, empty/inverted
interval handling, and the brute-force equivalence property."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ops.intervals import (
    explode_profile,
    interval_overlap_join,
    split_long_intervals,
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


def test_exact_cells_above_double_precision(spark):
    # bounds above 2^53: double division would mis-bucket (ADVICE r5);
    # the exact integer floor-division must keep pairs identical to the
    # brute-force theta join
    base = 1 << 60
    rows_l = [(i, base + 13 * i, base + 13 * i + 40) for i in range(40)]
    rows_r = [(i, base + 17 * i + 5, base + 17 * i + 30) for i in range(40)]
    left = spark.createDataFrame(rows_l, "l_id long, start long, end long")
    right = spark.createDataFrame(rows_r, "r_id long, start long, end long")
    brute = {
        (a, b)
        for a, sa, ea in rows_l
        for b, sb, eb in rows_r
        if sa < eb and sb < ea
    }
    assert brute, "fixture must actually overlap"
    got = {
        (r.l_id, r.r_id)
        for r in interval_overlap_join(left, right, cell_width=7).collect()
    }
    assert got == brute


def _split_brute_property(spark, rng, *, cell_width, max_cells_l, max_cells_r):
    # long-tailed lengths: most short, a few spanning many cells
    rows_l = []
    for i in range(50):
        s = rng.randrange(-500, 1000)
        length = rng.choice([1, 5, 40, 350, 900])
        rows_l.append((i, s, s + length))
    rows_r = []
    for i in range(50):
        s = rng.randrange(-500, 1000)
        length = rng.choice([2, 10, 60, 500])
        rows_r.append((i, s, s + length))
    left = split_long_intervals(
        spark.createDataFrame(rows_l, "l_id long, start long, end long"),
        cell_width=cell_width,
        max_cells=max_cells_l,
    )
    right = split_long_intervals(
        spark.createDataFrame(rows_r, "r_id long, start long, end long"),
        cell_width=cell_width,
        max_cells=max_cells_r,
    )
    got = interval_overlap_join(
        left,
        right,
        cell_width=cell_width,
        left_span=("_span_start", "_span_end"),
        right_span=("_span_start", "_span_end"),
    ).collect()
    pairs = [(r.l_id, r.r_id) for r in got]
    brute = {
        (a, b)
        for a, sa, ea in rows_l
        for b, sb, eb in rows_r
        if sa < eb and sb < ea
    }
    assert len(pairs) == len(set(pairs)), "split must not duplicate pairs"
    assert set(pairs) == brute
    # span columns must not leak into the output
    assert "_span_start" not in got[0].asDict() if got else True


@pytest.mark.parametrize(
    "cell_width,max_cells_l,max_cells_r",
    [(16, 1, 1), (16, 2, 3), (64, 2, 1), (7, 4, 4)],
)
def test_split_matches_brute_force(spark, cell_width, max_cells_l, max_cells_r):
    # property (VERDICT r6 ask #6): splitting long intervals into
    # cell-aligned chunks is INVISIBLE in the join output — each
    # overlapping original pair survives exactly once — across cell
    # widths and asymmetric max_cells, negative starts included
    import random

    _split_brute_property(
        spark,
        random.Random(1234 + cell_width),
        cell_width=cell_width,
        max_cells_l=max_cells_l,
        max_cells_r=max_cells_r,
    )


def test_split_bounds_span_fanout(spark):
    # the skew guarantee: every split row spans ≤ max_cells cells, so the
    # per-row sequence() array a mega-interval would materialize is capped
    rows = [(1, 0, 100_000), (2, 50, 60), (3, 70, 70)]  # 3: empty
    df = spark.createDataFrame(rows, "id long, start long, end long")
    out = split_long_intervals(df, cell_width=10, max_cells=4)
    prof = explode_profile(
        out, start="_span_start", end="_span_end", cell_width=10
    ).collect()[0]
    assert prof.max_cells == 4
    # chunk count: 10_000 cells / 4 per chunk = 2500 rows for id 1
    counts = {r.id: r.n for r in out.groupBy("id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {1: 2500, 2: 1, 3: 1}
    # empty interval keeps one row with span = original (no cells)
    empty = out.filter(F.col("id") == 3).collect()[0]
    assert (empty._span_start, empty._span_end) == (70, 70)
    with pytest.raises(ValueError, match="max_cells"):
        split_long_intervals(df, cell_width=10, max_cells=0)
    with pytest.raises(ValueError, match="already exists"):
        split_long_intervals(
            df.withColumn("_span_start", F.lit(0)), cell_width=10, max_cells=4
        )


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
