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


def test_bm25_ranking(spark):
    from assignment_etl_spark.ext.invindex import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "cat cat cat dog"),          # high tf for cat
            (2, "cat dog bird fish mouse"),  # one cat, longer
            (3, "dog dog dog"),              # no cat
            (4, "cat"),                      # short doc, one cat
        ],
        "doc_id long, text string",
    )
    out = bm25_search(docs, ["cat"], topk=10).collect()
    ids = [r.doc_id for r in out]
    assert 3 not in ids and len(ids) == 3
    # shortest doc with the term outranks the long one; tf helps doc 1
    assert ids[0] in (1, 4) and ids[-1] == 2
    assert [r.rank for r in out] == [1, 2, 3]
    assert all(r.score > 0 for r in out)

    # multi-term query: doc containing both terms wins
    # the DEFAULT path must be bounded: topk defaults to 1000, so the
    # plan carries a limit (TakeOrderedAndProject / GlobalLimit), never
    # the rank-all-matches single-partition fallback (VERDICT r5 #3)
    default_df = bm25_search(docs, ["cat", "bird"])
    plan = default_df._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit" in plan or "Limit" in plan
    unbounded = bm25_search(docs, ["cat", "bird"], topk=None)
    uplan = unbounded._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit" not in uplan  # opt-in rank-everything path
    out2 = default_df.collect()
    assert out2[0].doc_id == 2

    # topk=0 must be rejected, not silently treated as "no limit"
    import pytest

    with pytest.raises(ValueError, match="topk"):
        bm25_search(docs, ["cat"], topk=0)
    with pytest.raises(ValueError, match="topk"):
        bm25_search(docs, ["cat"], topk=-3)


def test_phrase_search(spark):
    from assignment_etl_spark.ext.invindex import (
        build_positional_index,
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "big data big data pipeline"),   # "big data" twice
            (2, "data big is reversed here"),    # reversed -> no match
            (3, "Big Data works"),               # case-insensitive match
            (4, "buffalo buffalo buffalo"),      # repeated-word phrase
        ],
        "doc_id long, text string",
    )
    idx = build_positional_index(docs)
    out = {r.doc_id: r.n_matches for r in phrase_search(idx, ["big", "data"]).collect()}
    assert out == {1: 2, 3: 1}
    # duplicate-word phrase: positions 0-1 and 1-2 both match
    rep = {r.doc_id: r.n_matches for r in phrase_search(idx, ["buffalo", "buffalo"]).collect()}
    assert rep == {4: 2}
    # three-token phrase
    tri = {r.doc_id: r.n_matches for r in phrase_search(idx, ["big", "data", "pipeline"]).collect()}
    assert tri == {1: 1}


def test_bm25_default_topk_warns_once_explicit_silent(spark):
    """Implicit reliance on the round-5 default flip (None → 1000) emits
    a UserWarning; any explicit topk (1000, None, other) is silent."""
    import warnings as _w

    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat bird"), (3, "fish")],
        "doc_id long, text string",
    )
    from assignment_etl_spark.ext.invindex import bm25_search

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        bm25_search(docs, ["cat"])
        assert any("topk now defaults to 1000" in str(x.message) for x in rec)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        bm25_search(docs, ["cat"], topk=1000)
        bm25_search(docs, ["cat"], topk=None)
        assert not rec
