"""TF-IDF keyword extraction (ext/tfidf.py): hand-computed scores on a
tiny corpus and top-k ranking semantics."""

import math

import pytest

from assignment_etl_spark.ext.tfidf import tfidf_scores, top_terms


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple cherry"),
            (3, "durian durian durian durian"),
        ],
        "doc_id long, text string",
    )


def _idf(n_docs, df):
    return math.log((n_docs + 1.0) / (df + 1.0)) + 1.0


def test_scores_hand_computed(corpus):
    got = {(r.doc_id, r.token): r for r in tfidf_scores(corpus).collect()}
    # apple: df=2 across 3 docs; doc1 tf = 2/3
    assert got[(1, "apple")].tfidf == pytest.approx(
        round((2 / 3) * _idf(3, 2), 6), abs=1e-6
    )
    # durian: df=1, tf=1.0 -> highest possible weight
    assert got[(3, "durian")].tfidf == pytest.approx(
        round(1.0 * _idf(3, 1), 6), abs=1e-6
    )
    assert got[(1, "apple")].n_term == 2 and got[(1, "apple")].df == 2


def test_ranking_semantics(corpus):
    top = {r.doc_id: r for r in top_terms(corpus, k=1).collect()}
    # doc 1: apple's tf (2/3) outweighs banana's rarity bonus
    assert top[1].token == "apple"
    # doc 2: equal tf (1/2 each) -> rarer cherry (df=1) beats apple (df=2)
    assert top[2].token == "cherry"
    assert top[3].token == "durian"


def test_topk_rank_and_tiebreak(spark):
    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    rows = top_terms(df, k=5).collect()
    # equal tf and df -> equal score; lexical tie-break gives x rank 1
    assert [(r.rank, r.token) for r in sorted(rows, key=lambda r: r.rank)] == [
        (1, "x"),
        (2, "y"),
    ]
