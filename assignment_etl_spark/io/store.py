"""Native table store: partitioned parquet + bucketed tables.

Bucketing is the co-located-join primitive at 100 TB: two fact tables
bucketed by the same key into the same bucket count join WITHOUT a shuffle
(both sides' partitioning already satisfies the join distribution), and
aggregations on the bucket key skip the exchange too. Pre-shuffle once at
write, amortized over every downstream join — the classic trade for a fact
table joined daily.

Bucketed tables require the session catalog (`saveAsTable`) — Spark's
bucketing metadata lives in the metastore, not in parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], *, mode: str = "overwrite"
) -> None:
    """Hive-style directory partitioning → partition pruning on read
    (a filter on a partition column never touches pruned directories)."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    *,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
