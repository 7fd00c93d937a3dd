"""Scalable global row_number (ops/ids.py) and targeted parquet delete
(io/store.delete_by_keys)."""

import glob
import os

from pyspark.sql import functions as F

from assignment_etl_spark.ops.ids import global_row_number


def test_matches_single_partition_row_number(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k"), F.col("id").alias("payload")
    )
    got = global_row_number(df, ["k"], num_partitions=7)
    rows = {r.k: r.row_num for r in got.collect()}
    expect = {k: i + 1 for i, k in enumerate(sorted(rows))}
    assert rows == expect


def test_sequence_is_dense_and_complete(spark):
    df = spark.range(0, 500).select(F.col("id").alias("k"))
    got = global_row_number(df, ["k"], num_partitions=5)
    agg = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("row_num").alias("s"),
        F.min("row_num").alias("lo"),
        F.max("row_num").alias("hi"),
    ).first()
    assert (agg.n, agg.lo, agg.hi) == (500, 1, 500)
    assert agg.s == 500 * 501 // 2  # dense, no gaps or dupes


def test_desc_column_order_matches_window(spark):
    # Column sort expressions (F.desc) must drive the range exchange and
    # local numbering identically to a desc single-partition window
    df = spark.range(0, 300).select(
        (F.col("id") * 13 % 100).alias("score"), F.col("id").alias("k")
    )
    got = {
        r.k: r.row_num
        for r in global_row_number(
            df, [F.desc("score"), F.asc("k")], num_partitions=6
        ).collect()
    }
    rows = sorted(
        ((r.score, r.k) for r in df.collect()),
        key=lambda t: (-t[0], t[1]),
    )
    expect = {k: i + 1 for i, (_, k) in enumerate(rows)}
    assert got == expect


def test_global_ntile_matches_f_ntile(spark):
    from pyspark.sql.window import Window

    from assignment_etl_spark.ops.ids import global_ntile

    # 23 % 5 = 3: uneven split — the first 3 tiles hold one extra row
    df = spark.range(0, 23).select(
        (F.col("id") * 7 % 23).alias("score"), F.col("id").alias("k")
    )
    got = {
        r.k: r.tile
        for r in global_ntile(
            df, [F.desc("score"), F.asc("k")], 5, num_partitions=4
        ).collect()
    }
    ref = {
        r.k: r.t
        for r in df.select(
            "k",
            F.ntile(5)
            .over(Window.orderBy(F.desc("score"), F.asc("k")))
            .alias("t"),
        ).collect()
    }
    assert got == ref
    # N < n_tiles: ntile degenerates to the row number
    small = spark.range(0, 3).select(F.col("id").alias("k"))
    got_small = {
        r.k: r.tile for r in global_ntile(small, ["k"], 10).collect()
    }
    assert got_small == {0: 1, 1: 2, 2: 3}
    import pytest

    with pytest.raises(ValueError, match="n_tiles"):
        global_ntile(small, ["k"], 0)


def test_global_cumsum_matches_window(spark):
    from decimal import Decimal

    from assignment_etl_spark.ops.ids import global_cumsum

    df = spark.range(0, 400).select(
        (F.col("id") * 29 % 150).alias("k"),
        (F.col("id") % 7).cast("decimal(18,2)").alias("v"),
    )
    got = global_cumsum(
        df, ["k", "v"], "v", num_partitions=6, out_col="cum", row_num_col="rn"
    ).collect()
    rows = sorted(((r.k, r.v) for r in df.collect()))
    running, expect = Decimal(0), {}
    for i, (k, v) in enumerate(rows):
        running += v
        expect[i + 1] = (k, running)
    for r in got:
        k, cum = expect[r.rn]
        assert (r.k, Decimal(r.cum)) == (k, cum), r
    assert len(got) == 400


def test_start_offset_and_columns_preserved(spark):
    df = spark.createDataFrame([("b", 2), ("a", 1)], "k string, v int")
    got = global_row_number(df, ["k"], num_partitions=2, start=100)
    rows = sorted((r.k, r.v, r.row_num) for r in got.collect())
    assert rows == [("a", 1, 100), ("b", 2, 101)]


def _write_clustered(spark, d, n=2000, files=8):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 17).alias("v")
    )
    df.repartitionByRange(files, "k").sortWithinPartitions("k").write.parquet(d)
    return df


def test_delete_by_keys_targets_files(spark, tmp_path):
    from assignment_etl_spark.io.store import delete_by_keys

    d = str(tmp_path / "tbl")
    _write_clustered(spark, d)
    stats = delete_by_keys(spark, d, "k", [5, 6, 7])
    # clustered on k: the three keys live in ONE range file
    assert stats["n_files"] >= 8
    assert stats["n_files_rewritten"] == 1
    assert stats["n_rows_deleted"] == 3
    back = spark.read.parquet(d)
    assert back.count() == 1997
    assert back.filter(F.col("k").isin([5, 6, 7])).count() == 0
    # untouched rows intact
    assert back.agg(F.sum("k")).first()[0] == sum(range(2000)) - 18


def test_delete_by_keys_no_match_rewrites_nothing(spark, tmp_path):
    from assignment_etl_spark.io.store import delete_by_keys

    d = str(tmp_path / "tbl2")
    _write_clustered(spark, d, n=300, files=3)
    before = sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
    mtimes = {f: os.path.getmtime(f) for f in before}
    stats = delete_by_keys(spark, d, "k", [99999])
    assert stats["n_files_rewritten"] == 0 and stats["n_rows_deleted"] == 0
    after = sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
    assert after == before
    assert all(os.path.getmtime(f) == mtimes[f] for f in after)


def test_delete_by_keys_partitioned_layout(spark, tmp_path):
    from assignment_etl_spark.io.store import delete_by_keys

    d = str(tmp_path / "ptbl")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    df.write.partitionBy("p").parquet(d)
    stats = delete_by_keys(spark, d, "k", [10, 11])
    assert stats["n_rows_deleted"] == 2
    back = spark.read.parquet(d)
    assert back.count() == 98
    # partition column survives the per-directory rewrite
    assert back.filter(F.col("p") == 0).count() == 49


def test_skyline_2d(spark):
    from assignment_etl_spark.ops.skyline import skyline_2d

    rows = [
        # (x, y): front is (5,1), (4,2), (3,4), (1,9); (3,4) duplicated
        (1, 9.0), (1, 2.0), (2, 3.0), (3, 4.0), (3, 4.0), (3, 1.0),
        (4, 2.0), (5, 1.0), (5, 0.5), (None, 99.0), (9, None),
    ]
    df = spark.createDataFrame(rows, "x int, y double")
    front = {
        (r.x, r.y)
        for r in skyline_2d(df, x_col="x", y_col="y", num_partitions=3).collect()
    }
    assert front == {(5, 1.0), (4, 2.0), (3, 4.0), (1, 9.0)}

    # single partition must agree with the multi-partition decomposition
    front1 = {
        (r.x, r.y)
        for r in skyline_2d(df, x_col="x", y_col="y", num_partitions=1).collect()
    }
    assert front1 == front
