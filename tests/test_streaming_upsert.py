"""Streaming CDC upsert sink (ext/streaming.stream_upsert_sink):
convergence to the batch recompute, exactly-once restarts, and
out-of-order batch absorption."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.streaming import read_events_stream, stream_upsert_sink


def _events(spark, rows):
    return spark.createDataFrame(
        [(e, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t, v) for (e, m, u, t, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def _latest(df):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        df.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )


def _run(spark, src, state, ckpt):
    schema = spark.read.parquet(src).schema
    q = stream_upsert_sink(
        read_events_stream(spark, src, schema=schema),
        path=state,
        key=["user_id"],
        order_cols=["ts", "event_id"],
        checkpoint=ckpt,
    )
    q.awaitTermination()


@pytest.fixture()
def paths(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "state"), str(tmp_path / "ckpt")


def test_converges_to_batch_latest(spark, paths):
    src, state, ckpt = paths
    rows = [(e, e * 3 % 17, e % 5, f"t{e % 3}", float(e)) for e in range(40)]
    df = _events(spark, rows)
    df.repartitionByRange(4, "ts", "event_id").write.parquet(src)
    _run(spark, src, state, ckpt)
    got = {r.user_id: (r.ts, r.event_id) for r in spark.read.parquet(state).collect()}
    exp = {r.user_id: (r.ts, r.event_id) for r in _latest(df).collect()}
    assert got == exp


def test_restart_is_noop(spark, paths):
    src, state, ckpt = paths
    df = _events(spark, [(e, e, e % 3, "t", float(e)) for e in range(12)])
    df.repartitionByRange(3, "ts", "event_id").write.parquet(src)
    _run(spark, src, state, ckpt)
    before = sorted(map(tuple, spark.read.parquet(state).collect()))
    # same checkpoint, no new files: the restarted query re-processes nothing
    _run(spark, src, state, ckpt)
    after = sorted(map(tuple, spark.read.parquet(state).collect()))
    assert after == before


def test_late_and_new_data_absorbed(spark, paths):
    """An appended file carrying BOTH a stale event (older than the state
    row for its key) and a fresh one must only advance the fresh key."""
    src, state, ckpt = paths
    base = _events(spark, [(1, 10, 1, "a", 1.0), (2, 20, 2, "b", 2.0)])
    base.coalesce(1).write.parquet(src)
    _run(spark, src, state, ckpt)
    late = _events(spark, [(3, 5, 1, "stale", 9.0), (4, 30, 2, "fresh", 4.0)])
    late.coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, state, ckpt)
    got = {r.user_id: r.event_type for r in spark.read.parquet(state).collect()}
    assert got == {1: "a", 2: "fresh"}


def test_crash_mid_batch_then_restart_converges(spark, paths):
    """Kill the query INSIDE the at-least-once window — after the state
    merge, before the checkpoint commit — then restart from the same
    checkpoint. The killed batch replays; the keep-latest filter must
    absorb the replay so the final state still equals the batch
    keep-latest recompute (the exactly-once-convergence claim in
    SCALE.md, proven under restart instead of argued)."""
    src, state, ckpt = paths
    rows = [(e, e * 7 % 23, e % 6, f"t{e % 4}", float(e)) for e in range(60)]
    df = _events(spark, rows)
    # 4 files -> 4 micro-batches at maxFilesPerTrigger=1
    df.repartitionByRange(4, "ts", "event_id").write.parquet(src)
    schema = spark.read.parquet(src).schema

    crashed = {"n": 0}

    def crash_after_second_batch(epoch_id):
        crashed["n"] += 1
        if crashed["n"] == 2:
            raise RuntimeError("injected crash after state write")

    q = stream_upsert_sink(
        read_events_stream(spark, src, schema=schema),
        path=state,
        key=["user_id"],
        order_cols=["ts", "event_id"],
        checkpoint=ckpt,
        post_batch_hook=crash_after_second_batch,
    )
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()
    assert crashed["n"] == 2  # died mid-stream: batch 2 written, uncommitted

    # restart from the SAME checkpoint: batch 2 replays (its offsets were
    # never committed) plus the remaining files
    _run(spark, src, state, ckpt)
    got = {r.user_id: (r.ts, r.event_id) for r in spark.read.parquet(state).collect()}
    exp = {r.user_id: (r.ts, r.event_id) for r in _latest(df).collect()}
    assert got == exp
    # row-level equality with the batch oracle, not just keys (columns
    # sorted by name: upsert_parquet may reorder them in the state table)
    cols = sorted(df.columns)
    got_rows = sorted(map(tuple, spark.read.parquet(state).select(*cols).collect()))
    exp_rows = sorted(map(tuple, _latest(df).select(*cols).collect()))
    assert got_rows == exp_rows


def test_streaming_hll_matches_batch_and_restarts(spark, tmp_path):
    """Register state after the streamed drain equals the one-shot batch
    sketch; a checkpointed re-run changes nothing (max-merge idempotent)."""
    from assignment_etl_spark.ext.sketch import hll_sketch
    from assignment_etl_spark.ext.streaming import stream_hll_sink

    df = _events(spark, [(e, e, e % 37, "t", 1.0) for e in range(200)])
    src = str(tmp_path / "src")
    df.repartitionByRange(4, "ts", "event_id").write.parquet(src)
    regs_path, ckpt = str(tmp_path / "regs"), str(tmp_path / "ckpt")

    def run():
        schema = spark.read.parquet(src).schema
        q = stream_hll_sink(
            read_events_stream(spark, src, schema=schema),
            col="user_id", p=8, path=regs_path, checkpoint=ckpt,
        )
        q.awaitTermination()

    run()
    got = sorted(map(tuple, spark.read.parquet(regs_path).collect()))
    batch = sorted(map(tuple, hll_sketch(df, "user_id", p=8).collect()))
    assert got == batch
    run()  # restart with same checkpoint: no new files → state unchanged
    assert sorted(map(tuple, spark.read.parquet(regs_path).collect())) == batch


def test_stream_jdbc_upsert_sink(spark, tmp_path):
    """Events stream into a Derby table through keyed MERGE; final table
    equals the batch keep-latest recompute."""
    from pyspark.sql import functions as F

    from assignment_etl_spark.ext.streaming import (
        read_events_stream,
        stream_jdbc_upsert_sink,
    )
    from assignment_etl_spark.io.jdbc import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/sdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    events = spark.range(600).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        (F.col("id") % 40).alias("user_id"),
        (F.col("id") * 3 % 97).cast("double").alias("value"),
    )
    # seed the target table (MERGE needs it to exist) with an empty slice
    write_jdbc(
        events.filter("event_id < 0"), url, "user_state",
        properties=props, num_partitions=1,
    )
    events.repartitionByRange(4, "event_id").write.parquet(f"{tmp_path}/src")
    stream = read_events_stream(spark, f"{tmp_path}/src", schema=events.schema)
    q = stream_jdbc_upsert_sink(
        stream,
        url=url,
        table="user_state",
        keys=["user_id"],
        order_cols=["ts", "event_id"],
        checkpoint=f"{tmp_path}/ckpt",
        properties=props,
    )
    q.awaitTermination()
    back = read_jdbc(spark, url, "user_state", properties=props)
    assert back.count() == 40  # one row per user
    # equals the batch keep-latest
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc(F.struct("ts", "event_id"))
    )
    expect = (
        events.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn")
    )
    got = {(r.user_id, r.event_id) for r in back.collect()}
    want = {(r.user_id, r.event_id) for r in expect.collect()}
    assert got == want
