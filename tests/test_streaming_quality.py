"""Streaming dual-sink quality pipeline: a batch (clean, log) operator
applied per micro-batch via foreachBatch, both sinks written exactly-once."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.streaming import (
    read_events_stream,
    stream_clean_with_quality,
)
from assignment_etl_spark.ops.quality import log_frame


def clean_events(df):
    """Toy cleaning operator: negative values are nulled + logged."""
    bad = F.col("value") < 0
    logs = log_frame(
        df.filter(bad),
        patient_id=F.col("event_id"),
        column_name=F.lit("value"),
        original_value=F.col("value"),
        reason=F.lit("negative_value"),
    )
    clean = df.withColumn("value", F.when(bad, F.lit(None)).otherwise(F.col("value")))
    return clean, logs


@pytest.fixture()
def dirty_events(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), i % 3, "view", float(i if i % 5 else -i))
        for i in range(1, 41)
    ]
    path = str(tmp_path / "dirty")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.parquet(path)
    return path


def test_dual_sink_streaming(spark, dirty_events, tmp_path):
    stream = read_events_stream(spark, dirty_events)
    q = stream_clean_with_quality(
        stream,
        clean_events,
        clean_path=str(tmp_path / "clean"),
        logs_path=str(tmp_path / "logs"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    clean = spark.read.parquet(str(tmp_path / "clean"))
    logs = spark.read.parquet(str(tmp_path / "logs"))
    assert clean.count() == 40
    assert logs.count() == 8  # events 5,10,...,40 had negative values
    assert clean.filter(F.col("value").isNull()).count() == 8
    assert {r.reason for r in logs.collect()} == {"negative_value"}
    # log schema is the engine-wide superset
    assert logs.columns[-1] == "reason" and "mapped_code" in logs.columns
