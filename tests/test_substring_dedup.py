"""Cross-document substring dedup: hand-checked semantics + DuckDB
replica equality + partitioning invariance."""

import duckdb
import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.substring_dedup import (
    dedup_substrings,
    sql_dedup_substrings,
)

BOILER = "this license text is identical across many documents in the corpus"  # 11 words


ROWS = [
    (1, "alpha beta " + BOILER + " gamma delta"),
    (2, "epsilon " + BOILER + " zeta"),          # boilerplate duplicated
    (3, BOILER),                                  # exactly the duplicated span
    (4, "totally unique words that appear nowhere else at all today ok"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_first_copy_kept_rest_cut(spark, docs):
    out = {r.doc_id: r for r in dedup_substrings(docs, window=11).collect()}
    # doc 1 holds the first occurrence -> untouched
    assert out[1].text == "alpha beta " + BOILER + " gamma delta"
    assert out[1].n_words_removed == 0
    # docs 2 and 3: the boilerplate span is cut, their own words survive
    assert out[2].text == "epsilon zeta"
    assert out[2].n_words_removed == 11
    assert out[3].text == "" and out[3].n_words_kept == 0
    assert out[3].removed_char_frac == 1.0
    # doc 4 unique, doc 5 empty
    assert out[4].n_words_removed == 0
    assert out[5].text == "" and out[5].removed_char_frac == 0.0


def test_longer_run_fully_covered(spark):
    # a 14-word duplicated run with window=10: overlapping windows chain
    run = " ".join(f"w{i}" for i in range(14))
    df = spark.createDataFrame(
        [(1, "x " + run), (2, run + " y")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in dedup_substrings(df, window=10).collect()}
    assert out[1].n_words_removed == 0
    assert out[2].text == "y"  # entire duplicated run removed


def test_matches_duckdb_replica(spark, docs, tmp_path):
    p = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    exp = con.execute(
        sql_dedup_substrings(window=11) + " ORDER BY 1"
    ).df()
    got = dedup_substrings(docs, window=11).orderBy("doc_id").toPandas()
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        assert got[c].tolist() == exp[c].tolist(), c


def test_partitioning_invariance(spark, docs):
    a = dedup_substrings(docs, window=11).orderBy("doc_id").collect()
    b = (
        dedup_substrings(docs.repartition(7), window=11)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_small_window_rejected(spark, docs):
    with pytest.raises(ValueError):
        dedup_substrings(docs, window=1)
