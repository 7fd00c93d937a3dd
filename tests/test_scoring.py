"""Model-scoring hook: default path vs DuckDB replica; custom scorer."""

import duckdb
import numpy as np
import pytest

from assignment_etl_spark.ext.scoring import (
    score_documents,
    sql_default_score,
)

ROWS = [
    (1, "the cat sat on the mat, and it is that simple!"),
    (2, "x" * 600),
    (3, ""),
    (4, "numbers 12345 and symbols @@@ ### everywhere..."),
    (5, "Une phrase en français, avec des accents: été, à, ça."),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_default_matches_duckdb(spark, docs, tmp_path):
    p = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    exp = con.execute(
        f"SELECT doc_id, {sql_default_score('text')} AS s "
        "FROM documents ORDER BY doc_id"
    ).df()
    got = (
        score_documents(docs)
        .select("doc_id", "quality_model_score")
        .orderBy("doc_id")
        .toPandas()
    )
    # bit-identical: same feature formulas, same left-associated float ops
    assert got["quality_model_score"].tolist() == exp["s"].tolist()


def test_scores_bounded(spark, docs):
    scores = [
        r.quality_model_score for r in score_documents(docs).collect()
    ]
    assert all(0.0 < s < 1.0 for s in scores)


def test_custom_scorer_swaps_in(spark, docs):
    def constant(feats: np.ndarray) -> np.ndarray:
        return np.full(feats.shape[0], 0.5)

    out = score_documents(docs, scorer=constant)
    assert {r.quality_model_score for r in out.collect()} == {0.5}
    # features still surface alongside the score for downstream filters
    assert "punct_ratio" in out.columns
