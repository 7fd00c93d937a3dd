"""SQL surface: register engine tables as temp views and run ANSI SQL.

The reference has no query language (SURVEY §3 — its "plan" is Python
program order); the engine inherits Spark SQL for free. This module is the
thin registration layer so users can query the ETL outputs and the lakehouse
tables with plain SQL — same Catalyst plans as the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_tables(
    spark: SparkSession, tables: dict[str, DataFrame], *, prefix: str = ""
) -> list[str]:
    """Register each DataFrame as a (replaceable) temp view; returns names."""
    names = []
    for name, df in tables.items():
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        names.append(view)
    return names


def register_parquet_dir(
    spark: SparkSession, sf_dir: str, names: list[str], *, prefix: str = ""
) -> list[str]:
    return register_tables(
        spark,
        {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names},
        prefix=prefix,
    )


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
