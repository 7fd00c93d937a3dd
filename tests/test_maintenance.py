"""optimize_table (ops/maintenance.py): one-pass compaction + z-order,
row-set invariance, footer-stats improvement, atomic swap hygiene."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from assignment_etl_spark.ops.maintenance import optimize_table


def _frag_events(spark, path, n_files=40):
    events = spark.range(0, 20000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 97 * 131 % 1000).cast("double").alias("user_id"),
        (F.col("id") * 7919 % 1000).cast("double").alias("value"),
    )
    events.repartition(n_files).write.parquet(path)
    return events


def _mean_span(path, col_name, scale=1000.0):
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == col_name and col.statistics is not None:
                    spans.append((col.statistics.max - col.statistics.min) / scale)
    assert spans
    return sum(spans) / len(spans)


def test_optimize_compacts_and_clusters(spark, tmp_path):
    path = str(tmp_path / "t")
    events = _frag_events(spark, path, n_files=40)
    before = events.agg(
        F.count(F.lit(1)), F.sum("event_id"), F.sum("user_id"), F.sum("value")
    ).first()
    span_before = _mean_span(path, "user_id")

    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(f"{path}/*.parquet")
    )
    m = optimize_table(
        spark,
        path,
        zorder_by=["user_id", "value"],
        bits=8,
        target_file_bytes=max(1, total // 16),
    )
    assert m["files_before"] == 40
    assert m["files_after"] == m["n_target"] < 20

    back = spark.read.parquet(path)
    assert (
        back.agg(
            F.count(F.lit(1)), F.sum("event_id"), F.sum("user_id"), F.sum("value")
        ).first()
        == before
    )
    # clustering restored: per-file user_id spans shrink substantially
    assert _mean_span(path, "user_id") < 0.5 * span_before
    # atomic swap leaves no temp/old siblings behind
    assert [p for p in tmp_path.iterdir() if "__compact" in p.name] == []


def test_optimize_empty_dir_is_noop(spark, tmp_path):
    path = str(tmp_path / "empty")
    assert optimize_table(spark, path)["files_after"] == 0
