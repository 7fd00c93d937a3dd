"""Inverted index (ext/invindex.py): postings correctness, df pruning,
and index-vs-scan search agreement."""

from pyspark.sql import functions as F

from assignment_etl_spark.ext.invindex import (
    build_inverted_index,
    conjunctive_search,
    scan_search,
)


def _docs(spark):
    rows = [
        (1, "spark window merge"),
        (2, "spark spark table"),
        (3, "window  merge\tspark"),
        (4, "table scan only"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_sorted_and_distinct(spark):
    idx = {r.term: (r.postings, r.df) for r in build_inverted_index(_docs(spark)).collect()}
    assert idx["spark"] == ([1, 2, 3], 3)  # doc 2 repeats 'spark' → once
    assert idx["merge"] == ([1, 3], 2)
    assert idx["only"] == ([4], 1)
    assert "" not in idx  # empty doc contributes nothing


def test_df_pruning(spark):
    idx = build_inverted_index(_docs(spark), min_df=2)
    assert {r.term for r in idx.collect()} == {"spark", "window", "merge", "table"}
    capped = build_inverted_index(_docs(spark), max_df=2)
    assert "spark" not in {r.term for r in capped.collect()}


def test_conjunctive_search(spark):
    idx = build_inverted_index(_docs(spark))
    got = sorted(r.doc_id for r in conjunctive_search(idx, ["spark", "merge"]).collect())
    assert got == [1, 3]
    # duplicate query terms must not double-count
    got = sorted(r.doc_id for r in conjunctive_search(idx, ["spark", "spark"]).collect())
    assert got == [1, 2, 3]
    assert conjunctive_search(idx, ["spark", "nosuchterm"]).count() == 0


def test_scan_matches_index(spark):
    docs = _docs(spark)
    idx = build_inverted_index(docs)
    for terms in (["spark"], ["spark", "window"], ["table"], ["spark", "merge", "window"]):
        via_idx = sorted(r.doc_id for r in conjunctive_search(idx, terms).collect())
        via_scan = sorted(r.doc_id for r in scan_search(docs, terms).collect())
        assert via_idx == via_scan, terms
