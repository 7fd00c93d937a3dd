"""Line-level dedup: policies, reassembly order, empty-doc handling."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.dedup import dedup_lines


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "unique one\ncommon footer\nunique two"),
            (2, "common footer\nanother line"),
            (3, "common footer"),
            (4, "solo document line"),
        ],
        "doc_id long, text string",
    )


def test_drop_frequent(spark, corpus):
    out = {r.doc_id: r for r in dedup_lines(corpus, max_docs=2).collect()}
    # "common footer" is in 3 docs > max_docs=2 -> removed everywhere
    assert out[1].text == "unique one\nunique two"
    assert (out[1].n_lines, out[1].n_kept) == (3, 2)
    assert out[2].text == "another line"
    assert out[3].text == "" and out[3].n_kept == 0  # doc fully emptied
    assert out[4].text == "solo document line"


def test_drop_frequent_threshold_keeps_at_max(spark, corpus):
    out = {r.doc_id: r.text for r in dedup_lines(corpus, max_docs=3).collect()}
    # exactly at the threshold (3 docs, max_docs=3) -> kept
    assert out[3] == "common footer"


def test_keep_first_global_order(spark, corpus):
    out = {r.doc_id: r.text for r in dedup_lines(corpus, mode="keep_first").collect()}
    # first occurrence of "common footer" is (doc 1, pos 1) -> survives there only
    assert out[1] == "unique one\ncommon footer\nunique two"
    assert out[2] == "another line"
    assert out[3] == ""


def test_keep_first_within_doc_duplicate(spark):
    df = spark.createDataFrame([(1, "a\nb\na"), (2, "a")], "doc_id long, text string")
    out = {r.doc_id: r.text for r in dedup_lines(df, mode="keep_first").collect()}
    assert out[1] == "a\nb"  # second in-doc "a" dropped too
    assert out[2] == ""


def test_reassembly_preserves_order(spark):
    text = "\n".join(f"line {i}" for i in range(20))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = dedup_lines(df, max_docs=5).first()
    assert out.text == text and out.n_kept == 20


def test_partitioning_invariance(spark, corpus):
    a = dedup_lines(corpus, max_docs=2).orderBy("doc_id").collect()
    b = dedup_lines(corpus.repartition(7), max_docs=2).orderBy("doc_id").collect()
    assert a == b


def test_bad_mode_raises(spark, corpus):
    with pytest.raises(ValueError):
        dedup_lines(corpus, mode="nope")


def test_metachar_separator_is_literal(spark):
    df = spark.createDataFrame(
        [(1, "alpha.common.beta"), (2, "common.gamma")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_lines(df, mode="keep_first", sep=".").collect()}
    assert out[1].text == "alpha.common.beta" and out[1].n_lines == 3
    assert out[2].text == "gamma"  # "common" survived only in doc 1
