"""JSONL source: schema-explicit read, corrupt-record channel, roundtrip."""

import os

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.io.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    split_corrupt,
    write_jsonl,
)

SCHEMA = "a bigint, b string, c double"


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"a": 1, "b": "x", "c": 1.5}\n'
        '{"a": 2, "b": "y"}\n'  # c absent -> NULL, still clean
        '{"a": 3, "b": "z", "c":\n'  # truncated -> corrupt
        "not json at all\n"  # corrupt
        '{"a": 4, "b": "w", "c": -0.25}\n'
    )
    return str(p)


def test_read_clean_and_corrupt_channels(spark, jsonl_file):
    df = read_jsonl(spark, jsonl_file, SCHEMA)
    clean, bad = split_corrupt(df)
    assert clean.count() == 3
    assert bad.count() == 2
    # corrupt rows carry the raw offending line for the audit sink
    raws = {r.raw_line for r in bad.collect()}
    assert "not json at all" in raws
    # clean rows parse typed values exactly
    got = {r.a: (r.b, r.c) for r in clean.collect()}
    assert got == {1: ("x", 1.5), 2: ("y", None), 4: ("w", -0.25)}


def test_explicit_schema_appends_contract_column(spark, jsonl_file):
    df = read_jsonl(spark, jsonl_file, SCHEMA)
    assert CORRUPT_COL in df.columns
    assert "_row_id" in df.columns


def test_inference_path_keeps_contract_column(spark, tmp_path):
    p = tmp_path / "clean.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    df = read_jsonl(spark, str(p))
    assert CORRUPT_COL in df.columns
    assert df.filter(F.col(CORRUPT_COL).isNotNull()).count() == 0


def test_write_read_roundtrip(spark, tmp_path):
    src = spark.range(100).select(
        F.col("id").alias("a"),
        F.concat(F.lit("s"), F.col("id")).alias("b"),
        (F.col("id") * 0.5).alias("c"),
    )
    out = str(tmp_path / "out_jsonl")
    write_jsonl(src, out)
    assert any(f.endswith(".gz") for f in os.listdir(out))
    back = read_jsonl(spark, out, SCHEMA, row_id=False)
    clean, bad = split_corrupt(back)
    assert bad.count() == 0
    assert clean.count() == 100
    assert clean.agg(F.sum("a")).first()[0] == src.agg(F.sum("a")).first()[0]


def test_inference_path_handles_corrupt_rows(spark, jsonl_file):
    df = read_jsonl(spark, jsonl_file)  # no schema: inferred by sampling
    clean, bad = split_corrupt(df)
    assert bad.count() == 2  # queryable without caching: ordinary column
    assert clean.count() == 3


def test_caller_schema_not_mutated(spark, jsonl_file):
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("a", T.LongType())])
    read_jsonl(spark, jsonl_file, schema)
    assert schema.fieldNames() == ["a"]
