"""S4/S5 JDBC sink/scan round-trip against embedded Derby (the JDBC driver
that ships with Spark; Postgres in production differs only by URL/driver —
reference loads Postgres via to_sql at /root/reference/etl.py:711-719)."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.io.jdbc import read_jdbc, write_jdbc

DERBY_PROPS = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "etldb"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        [(1, "ana", 170.0), (2, "ben", None), (3, "李", 180.5)],
        "id int, name string, height double",
    )
    write_jdbc(df, derby_url, "patients_t", properties=DERBY_PROPS, num_partitions=2)
    back = read_jdbc(spark, derby_url, "patients_t", properties=DERBY_PROPS)
    assert back.count() == 3
    rows = {r.id: r for r in back.collect()}
    assert rows[1].name == "ana" and rows[1].height == 170.0
    assert rows[2].height is None
    assert rows[3].name == "李"


def test_jdbc_overwrite_mode(spark, derby_url):
    df1 = spark.range(5).select(F.col("id").cast("int").alias("id"))
    df2 = spark.range(2).select(F.col("id").cast("int").alias("id"))
    write_jdbc(df1, derby_url, "ow_t", properties=DERBY_PROPS)
    write_jdbc(df2, derby_url, "ow_t", properties=DERBY_PROPS)
    assert read_jdbc(spark, derby_url, "ow_t", properties=DERBY_PROPS).count() == 2


def test_jdbc_partitioned_read(spark, derby_url):
    df = spark.range(100).select(F.col("id").cast("int").alias("id"))
    write_jdbc(df, derby_url, "part_t", properties=DERBY_PROPS)
    back = read_jdbc(
        spark,
        derby_url,
        "part_t",
        properties=DERBY_PROPS,
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
