"""FD repair (ops/repair.py): majority voting, fill vs enforce, audit
flags, no-winner groups."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ops.repair import fd_repair, fd_winners


def _df(spark):
    rows = [
        (1, "east"), (1, "east"), (1, "west"), (1, None),   # majority east
        (2, None), (2, None),                                # no winner
        (3, "north"),
    ]
    return spark.createDataFrame(rows, "k long, region string")


def test_winners_majority_and_tiebreak(spark):
    got = {r.k: r.winner for r in fd_winners(_df(spark), ["k"], "region").collect()}
    assert got == {1: "east", 3: "north"}  # k=2 has no votes at all
    tie = spark.createDataFrame(
        [(9, "b"), (9, "a")], "k long, region string"
    )
    assert fd_winners(tie, ["k"], "region").first().winner == "a"  # value asc


def test_enforce_rewrites_dissenters(spark):
    got = fd_repair(_df(spark), det_cols=["k"], dep_col="region").collect()
    k1 = [r for r in got if r.k == 1]
    assert all(r.region == "east" for r in k1)
    assert sum(r.was_changed for r in k1) == 1  # the 'west' row
    assert sum(r.was_filled for r in k1) == 1   # the NULL row


def test_fill_mode_keeps_dissenters(spark):
    got = fd_repair(
        _df(spark), det_cols=["k"], dep_col="region", mode="fill"
    ).collect()
    k1 = {(r.region, r.was_filled, r.was_changed) for r in got if r.k == 1}
    assert ("west", False, False) in k1   # dissenter untouched
    assert ("east", True, False) in k1    # NULL filled


def test_no_winner_group_keeps_nulls(spark):
    got = [r for r in fd_repair(_df(spark), det_cols=["k"], dep_col="region").collect() if r.k == 2]
    assert all(r.region is None and not r.was_filled for r in got)


def test_bad_mode_raises(spark):
    with pytest.raises(ValueError):
        fd_repair(_df(spark), det_cols=["k"], dep_col="region", mode="zap")
