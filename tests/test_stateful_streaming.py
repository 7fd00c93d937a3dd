"""Custom stateful streaming operator (applyInPandasWithState): per-user
running totals must converge to the batch ground truth."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.streaming import (
    read_events_stream,
    run_streaming_query_once,
    stateful_user_totals,
)


@pytest.fixture(scope="module")
def events_pq(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_events") / "ev")
    # events.parquet is TIMESTAMP(NANOS); rewrite through the engine's read
    import __spark_entry__ as e

    e._prep(spark)
    e._t(spark, "/root/testdata/sf0.001", "events").write.parquet(d)
    return d


def test_stateful_totals_match_batch(spark, events_pq):
    batch = spark.read.parquet(events_pq)
    expected = {
        r.user_id: (r.n, r.total)
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .collect()
    }
    stream = read_events_stream(spark, events_pq)
    out = run_streaming_query_once(
        stateful_user_totals(stream), output_mode="update", table_name="t_stateful"
    )
    # update mode: keep the LAST emitted row per user (monotone n_events)
    latest = (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n"),
            F.round(F.max("total_value"), 4).alias("total"),
        )
        .collect()
    )
    got = {r.user_id: (r.n, r.total) for r in latest}
    assert got == expected
