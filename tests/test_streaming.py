"""Structured Streaming surface: batch-equivalence of windowed aggs,
streaming dedup, session windows, multimodal plumbing."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.multimodal import extract_features, fake_decode
from assignment_etl_spark.ext.streaming import (
    read_events_stream,
    run_streaming_query_once,
    sessionized_counts,
    stream_dedup,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events") / "events_parquet")
    base = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=7 * i), i % 3, ["view", "click"][i % 2], float(i))
        for i in range(60)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(d)
    return d


def test_stream_matches_batch(spark, events_path):
    batch = spark.read.parquet(events_path)
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(batch).collect()
    }
    stream = read_events_stream(spark, events_path)
    agg = windowed_event_counts(stream)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in run_streaming_query_once(
            agg, output_mode="complete", table_name="t_stream_eq"
        ).collect()
    }
    assert got == expected


def test_stream_dedup(spark, events_path):
    batch = spark.read.parquet(events_path)
    dup = batch.unionByName(batch.limit(10))  # re-inject 10 duplicates
    stream = read_events_stream(spark, events_path)
    # watermark must cover the full event span here: the source splits into
    # several unordered micro-batches, and rows behind the watermark are
    # dropped as late (that's the operator's contract, not a bug)
    deduped = run_streaming_query_once(
        stream_dedup(stream, ["event_id"], watermark="1 day"), table_name="t_dedup"
    )
    assert deduped.count() == 60
    assert dup.count() == 70 and dup.dropDuplicates(["event_id"]).count() == 60


def test_session_windows_batch(spark):
    base = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        (1, base), (1, base + dt.timedelta(minutes=10)),  # session 1
        (1, base + dt.timedelta(minutes=60)),  # session 2 (50-min gap)
        (2, base),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionized_counts(df, gap="30 minutes")
    per_user = {r.user_id: r for r in out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions")).collect()}
    assert per_user[1].n_sessions == 2
    assert per_user[2].n_sessions == 1


def test_multimodal_feature_extraction(spark):
    payloads = [(i, "image", "img/fake", bytes([i] * (10 + i)), {"k": "v"}) for i in range(5)]
    df = spark.createDataFrame(
        payloads, "media_id long, kind string, mime string, payload binary, meta map<string,string>"
    )
    feats = {r.media_id: r for r in extract_features(df).collect()}
    assert len(feats) == 5
    for i in range(5):
        w, h, vec = fake_decode(bytes([i] * (10 + i)))
        assert feats[i].width == w and feats[i].height == h
        assert feats[i].n_bytes == 10 + i
        assert len(feats[i].feature) == 8
        assert feats[i].feature == pytest.approx(vec.tolist(), abs=1e-6)


def test_stream_stream_join_matches_batch(spark, events_path):
    """Watermarked stream-stream join (views → clicks within 15 min per
    user) must equal the same join computed in batch."""
    from assignment_etl_spark.ext.streaming import stream_stream_join

    def split(df):
        views = df.filter(F.col("event_type") == "view").select(
            "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("view_id")
        )
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("click_id")
        )
        return views, clicks

    batch = spark.read.parquet(events_path)
    bv, bc = split(batch)
    expected = {
        (r.view_id, r.click_id)
        for r in stream_stream_join(bv, bc, on="user_id", within="45 minutes", watermark="1 day").collect()
    }
    assert expected  # non-vacuous

    sv, sc = split(read_events_stream(spark, events_path))
    joined = stream_stream_join(sv, sc, on="user_id", within="45 minutes", watermark="1 day")
    got = {
        (r.view_id, r.click_id)
        for r in run_streaming_query_once(joined, table_name="t_ssj").collect()
    }
    assert got == expected


def test_bin_count_sink_replay_idempotent(spark, tmp_path):
    """A replayed epoch overwrites its own partition instead of
    double-counting — the exactly-once convergence contract."""
    from pyspark.sql import functions as F

    from assignment_etl_spark.ext.drift import bin_counts
    from assignment_etl_spark.ext.streaming import (
        read_events_stream,
        stream_bin_count_sink,
    )

    events = spark.range(1000).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        (F.col("id") % 37).alias("user_id"),
        F.lit("view").alias("event_type"),
    )
    d = str(tmp_path)
    events.repartitionByRange(4, "event_id").write.parquet(f"{d}/src")
    stream = read_events_stream(spark, f"{d}/src", schema=events.schema)
    q = stream_bin_count_sink(
        stream, bin_col=(F.col("user_id") % 8),
        path=f"{d}/bins", checkpoint=f"{d}/ckpt",
    )
    q.awaitTermination()

    def totals():
        return {
            r.bin: r.n
            for r in spark.read.parquet(f"{d}/bins")
            .groupBy("bin").agg(F.sum("n").alias("n")).collect()
        }

    # accumulated totals equal the one-shot batch histogram
    batch = {r.bin: r.n for r in bin_counts(events, F.col("user_id") % 8).collect()}
    assert totals() == batch

    # replay an epoch with identical data: the second write must replace
    # the first, not add to it
    def write_epoch(epoch):
        counts = bin_counts(
            events.filter(F.col("event_id") < 250), F.col("user_id") % 8
        ).withColumn("epoch", F.lit(epoch))
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            counts.write.mode("overwrite").partitionBy("epoch").parquet(
                f"{d}/bins"
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    write_epoch(99)
    after_first = totals()
    write_epoch(99)  # the at-least-once replay
    assert totals() == after_first
