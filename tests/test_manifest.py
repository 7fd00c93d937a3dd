"""Snapshot-manifest store (io/manifest.py): atomic commits, time
travel, append-by-reference, vacuum."""

import glob
import os

from pyspark.sql import functions as F

from assignment_etl_spark.io.manifest import (
    latest_version,
    read_snapshot,
    snapshots,
    vacuum,
    write_snapshot,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def test_commit_and_read_latest(spark, tmp_path):
    p = str(tmp_path / "t")
    m = write_snapshot(_df(spark, 0, 100), p)
    assert (m["version"], m["parent"]) == (0, None)
    assert read_snapshot(spark, p).count() == 100
    assert latest_version(p) == 0


def test_append_reuses_parent_files(spark, tmp_path):
    p = str(tmp_path / "t")
    m0 = write_snapshot(_df(spark, 0, 100), p)
    m1 = write_snapshot(_df(spark, 100, 150), p, mode="append")
    assert set(m0["files"]) <= set(m1["files"])  # carried by reference
    assert read_snapshot(spark, p).count() == 150


def test_time_travel(spark, tmp_path):
    p = str(tmp_path / "t")
    write_snapshot(_df(spark, 0, 100), p)
    write_snapshot(_df(spark, 100, 150), p, mode="append")
    write_snapshot(_df(spark, 0, 7), p, mode="overwrite")
    assert read_snapshot(spark, p, version=0).count() == 100
    assert read_snapshot(spark, p, version=1).count() == 150
    assert read_snapshot(spark, p).count() == 7
    # overwrite keeps history on disk until vacuum
    assert [m["version"] for m in snapshots(p)] == [0, 1, 2]


def test_overwrite_preserves_old_reads_exactly(spark, tmp_path):
    p = str(tmp_path / "t")
    write_snapshot(_df(spark, 0, 50), p)
    before = sorted(r.k for r in read_snapshot(spark, p, version=0).collect())
    write_snapshot(_df(spark, 1000, 1010), p, mode="overwrite")
    after = sorted(r.k for r in read_snapshot(spark, p, version=0).collect())
    assert before == after == list(range(50))


def test_vacuum_removes_only_unreferenced(spark, tmp_path):
    p = str(tmp_path / "t")
    write_snapshot(_df(spark, 0, 50), p)
    write_snapshot(_df(spark, 50, 60), p, mode="append")
    write_snapshot(_df(spark, 0, 5), p, mode="overwrite")   # v2 fresh files
    stats = vacuum(p, keep_versions=1)
    assert stats["n_manifests_dropped"] == 2
    assert stats["n_files_deleted"] > 0
    # latest still reads fine; history is gone
    assert read_snapshot(spark, p).count() == 5
    assert [m["version"] for m in snapshots(p)] == [2]
    # every remaining data file is referenced
    m = snapshots(p)[0]
    on_disk = {
        os.path.relpath(f, p)
        for f in glob.glob(os.path.join(p, "data", "*.parquet"))
    }
    assert on_disk == set(m["files"])


def test_vacuum_keeps_shared_files_of_retained_versions(spark, tmp_path):
    p = str(tmp_path / "t")
    write_snapshot(_df(spark, 0, 50), p)                    # v0
    write_snapshot(_df(spark, 50, 60), p, mode="append")    # v1 refs v0 files
    vacuum(p, keep_versions=1)                              # drops v0 manifest
    # v1 still reads 60 rows: its referenced v0-era files survived
    assert read_snapshot(spark, p).count() == 60
