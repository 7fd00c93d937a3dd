"""Copy-on-write upsert into the parquet store (plain + partition-pruned)."""

import os

from pyspark.sql import functions as F

from assignment_etl_spark.io.store import upsert_parquet


def test_upsert_plain(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id int, name string, v double"
    )
    upsert_parquet(spark, path, base, "id")
    updates = spark.createDataFrame(
        [(2, "B", 20.0), (4, "d", 4.0)], "id int, name string, v double"
    )
    upsert_parquet(spark, path, updates, "id")
    got = {r.id: (r.name, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("c", 3.0), 4: ("d", 4.0)}


def test_upsert_partition_pruned(spark, tmp_path):
    path = str(tmp_path / "tp")
    base = spark.createDataFrame(
        [(1, "p0", 1.0), (2, "p0", 2.0), (3, "p1", 3.0), (4, "p2", 4.0)],
        "id int, part string, v double",
    )
    upsert_parquet(spark, path, base, "id", partition_by=["part"])
    p1_files = set(os.listdir(f"{path}/part=p1"))

    updates = spark.createDataFrame([(2, "p0", 20.0), (5, "p0", 5.0)], "id int, part string, v double")
    upsert_parquet(spark, path, updates, "id", partition_by=["part"])

    got = {r.id: (r.part, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: ("p0", 1.0), 2: ("p0", 20.0), 3: ("p1", 3.0), 4: ("p2", 4.0), 5: ("p0", 5.0)
    }
    # untouched partition's files were not rewritten (partition-pruned CoW)
    assert set(os.listdir(f"{path}/part=p1")) == p1_files


def test_upsert_creates_store(spark, tmp_path):
    path = str(tmp_path / "fresh")
    df = spark.range(5).select(F.col("id").cast("int").alias("id"))
    upsert_parquet(spark, path, df, "id")
    assert spark.read.parquet(path).count() == 5


def test_upsert_emptied_partition_is_rewritten(spark, tmp_path):
    """When an update moves a partition's ONLY key elsewhere, the emptied
    partition must not keep a stale copy (dynamic overwrite alone never
    rewrites a partition with zero merged rows)."""
    from assignment_etl_spark.io.store import upsert_parquet

    path = str(tmp_path / "store")
    base = spark.createDataFrame(
        [(1, "p1", "old"), (2, "p2", "two")], "k int, part string, v string"
    )
    upsert_parquet(spark, path, base, "k", partition_by=["part"])
    moved = spark.createDataFrame([(1, "p2", "moved")], "k int, part string, v string")
    upsert_parquet(spark, path, moved, "k", partition_by=["part"])
    got = {(r.k, r.part, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "p2", "moved"), (2, "p2", "two")}
