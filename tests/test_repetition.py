"""repetition_signals vs hand-computed values and the DuckDB replica."""

import duckdb
import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.repetition import (
    repetition_signals,
    sql_repetition_signals,
)

ROWS = [
    (1, "the cat sat on the mat the cat sat again"),
    (2, "a b a b a b a b a b a b a b a b"),
    (3, "all unique words here nothing repeats at this length"),
    (4, ""),
    (5, "short"),
    (6, "x y z " * 40),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_hand_checked_values(spark, docs):
    out = {
        r.doc_id: r
        for r in repetition_signals(docs, top_ns=(2,), dup_ns=(5,)).collect()
    }
    # doc 2: "a b" x8 -> top 2-gram "a b" count 8, 3 chars each = 24 of 31
    assert out[2].top_2gram_char_frac == round(24 / 31, 6)
    assert out[2].repetitive
    # doc 2: every 5-gram repeats; the span union covers the WHOLE doc —
    # exactly 1.0, never more (occurrence-length summing would give ~5x)
    assert out[2].dup_5gram_char_frac == 1.0
    # doc 6: "x y z" x40 -> same, full coverage
    assert out[6].dup_5gram_char_frac == 1.0
    # doc 4/5: shorter than n -> 0.0, not NULL
    assert out[4].top_2gram_char_frac == 0.0 and not out[4].repetitive
    assert out[5].dup_5gram_char_frac == 0.0
    # doc 3: nothing repeats at n=5 -> dup frac 0
    assert out[3].dup_5gram_char_frac == 0.0


def test_matches_duckdb_replica(spark, docs, tmp_path):
    p = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    exp = con.execute(
        sql_repetition_signals() + " ORDER BY 1"
    ).df()
    got = repetition_signals(docs).orderBy("doc_id").toPandas()
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        assert got[c].tolist() == exp[c].tolist(), c


def test_partitioning_invariance(spark, docs):
    a = repetition_signals(docs).orderBy("doc_id").collect()
    b = repetition_signals(docs.repartition(7)).orderBy("doc_id").collect()
    assert a == b


def test_unknown_n_raises(spark, docs):
    with pytest.raises(ValueError):
        repetition_signals(docs, top_ns=(11,))
