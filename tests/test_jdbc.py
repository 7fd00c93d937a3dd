"""S4/S5 JDBC sink + scan, executed end to end against embedded Derby.

The reference's actual load path is JDBC (to_sql at
/root/reference/etl.py:711-719; the dashboard reads tables back at
interactive_dashboard.py:23-27). Derby ships on Spark's classpath, so the
round-trip — write_jdbc → read_jdbc (plain + partitioned) → value compare —
runs for real in-container; only the URL changes for Postgres/MySQL.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.io.jdbc import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url():
    d = tempfile.mkdtemp(prefix="derby_")
    return f"jdbc:derby:{d}/testdb;create=true"


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .filter(F.col("o_orderkey") < 2000)
    )


def _key_sum(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("k"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).alias("p"),
    ).first()
    return (row.n, row.k, float(row.p))


def test_jdbc_roundtrip(spark, derby_url, sample):
    props = {"driver": DRIVER}
    write_jdbc(sample, derby_url, "orders_jdbc", properties=props, num_partitions=4)
    back = read_jdbc(spark, derby_url, "orders_jdbc", properties=props)
    assert _key_sum(back) == _key_sum(sample)
    assert set(c.lower() for c in back.columns) == set(sample.columns)


def test_jdbc_partitioned_read(spark, derby_url, sample):
    """S5: partitioned scan splits the table into numPartitions range
    predicates on the partition column — same rows, parallel fetch."""
    props = {"driver": DRIVER}
    bounds = sample.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).first()
    back = read_jdbc(
        spark,
        derby_url,
        "orders_jdbc",
        properties=props,
        partition_column="o_orderkey",
        lower_bound=int(bounds.lo),
        upper_bound=int(bounds.hi) + 1,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert _key_sum(back) == _key_sum(sample)


def test_jdbc_overwrite_truncates(spark, derby_url, sample):
    """Overwrite with truncate=true reuses the DDL and replaces the rows —
    the reference's if_exists='replace' contract (etl.py:715)."""
    props = {"driver": DRIVER}
    half = sample.filter(F.col("o_orderkey") < 1000)
    write_jdbc(half, derby_url, "orders_trunc", properties=props, num_partitions=2)
    write_jdbc(sample, derby_url, "orders_trunc", properties=props, num_partitions=2)
    back = read_jdbc(spark, derby_url, "orders_trunc", properties=props)
    assert _key_sum(back) == _key_sum(sample)


def test_jdbc_upsert_merge(spark, derby_url, sample):
    from assignment_etl_spark.io.jdbc import upsert_jdbc

    props = {"driver": DRIVER}
    base = sample.filter(F.col("o_orderkey") < 1000)
    write_jdbc(base, derby_url, "orders_merge", properties=props, num_partitions=2)

    # delta: updates for half the existing keys + brand-new keys
    delta = sample.filter(
        (F.col("o_orderkey") < 500) | (F.col("o_orderkey") >= 1000)
    ).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") < 500, F.lit(1.0)).otherwise(
            F.col("o_totalprice")
        ),
    )
    upsert_jdbc(
        delta, derby_url, "orders_merge", ["o_orderkey"],
        properties=props, num_partitions=2,
    )
    back = read_jdbc(spark, derby_url, "orders_merge", properties=props)
    # expected: base rows >=500 untouched, <500 updated to 1.0, new rows added
    expect = (
        base.filter(F.col("o_orderkey") >= 500)
        .unionByName(delta)
    )
    assert _key_sum(back) == _key_sum(expect)
    assert back.filter("o_orderkey < 500").agg(
        F.max("o_totalprice")
    ).first()[0] == 1.0


def test_jdbc_upsert_idempotent_retry(spark, derby_url, sample):
    from assignment_etl_spark.io.jdbc import upsert_jdbc

    props = {"driver": DRIVER}
    base = sample.filter(F.col("o_orderkey") < 300)
    write_jdbc(base, derby_url, "orders_retry", properties=props, num_partitions=2)
    delta = sample.filter(F.col("o_orderkey").between(200, 600))
    for _ in range(2):  # the retry: same call twice must converge
        upsert_jdbc(
            delta, derby_url, "orders_retry", ["o_orderkey"],
            properties=props, num_partitions=2,
        )
    back = read_jdbc(spark, derby_url, "orders_retry", properties=props)
    expect = base.filter(F.col("o_orderkey") < 200).unionByName(delta)
    assert _key_sum(back) == _key_sum(expect)
