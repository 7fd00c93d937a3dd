"""S4/S5: JDBC sink + scan, and the parquet native store.

Reference loads four tables into Postgres via SQLAlchemy ``to_sql(...,
if_exists='replace')`` (/root/reference/etl.py:711-719) and the dashboard
pulls whole tables back (interactive_dashboard.py:23-27). The engine keeps
JDBC as a *connector* and parquet as the native store.

Scale policy (SURVEY §4.3.4): cap writer parallelism (``numPartitions``) so
a 1000-executor job doesn't open 1000 connections; batched inserts;
``truncate=true`` on overwrite preserves DDL. Reads push a partitioned
predicate when a numeric partition column is supplied.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    properties: dict[str, str] | None = None,
    mode: str = "overwrite",
    num_partitions: int = 8,
    batchsize: int = 10_000,
) -> None:
    props = dict(properties or {})
    props.setdefault("batchsize", str(batchsize))
    props.setdefault("truncate", "true")
    df.coalesce(num_partitions).write.mode(mode).options(**props).jdbc(
        url, table, properties=props
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    reader = spark.read
    if partition_column is not None:
        return reader.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=properties or {},
        )
    return reader.jdbc(url, table, properties=properties or {})


def write_parquet(df: DataFrame, path: str, *, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
