"""Lexical-diversity diagnostics (ext/lexdiv.py): per-doc TTR contract
(empty docs survive), group profile values against hand counts, and the
Zipf slope on a constructed power-law corpus."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.lexdiv import (
    corpus_lexical_profile,
    lexical_diversity,
    token_frequencies,
    zipf_slope,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a a b c", "en"),        # 4 tokens, 3 types, ttr 0.75
        (2, "a b", "en"),            # 2 tokens, 2 types, ttr 1.0
        (3, "x x x", "de"),          # 3 tokens, 1 type, ttr 1/3
        (4, "", "de"),               # empty: 0 tokens, NULL ttr
        (5, None, "de"),             # NULL text: same contract
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_token_frequencies(spark, docs):
    got = {
        (r.lang, r.token): r.freq
        for r in token_frequencies(docs, group_cols=["lang"]).collect()
    }
    assert got == {
        ("en", "a"): 3,
        ("en", "b"): 2,
        ("en", "c"): 1,
        ("de", "x"): 3,
    }


def test_lexical_diversity_per_doc(spark, docs):
    got = {r.doc_id: r for r in lexical_diversity(docs).collect()}
    assert set(got) == {1, 2, 3, 4, 5}, "no document may vanish"
    assert (got[1].n_tokens, got[1].n_types, got[1].ttr) == (4, 3, 0.75)
    assert got[2].ttr == 1.0
    assert got[3].ttr == round(1 / 3, 6)
    for empty in (4, 5):
        assert got[empty].n_tokens == 0
        assert got[empty].ttr is None


def test_corpus_profile_by_lang(spark, docs):
    got = {r.lang: r for r in corpus_lexical_profile(docs, group_col="lang").collect()}
    en, de = got["en"], got["de"]
    assert (en.n_docs, en.vocab, en.hapax) == (2, 3, 1)      # hapax: 'c'
    assert en.hapax_ratio == round(1 / 3, 6)
    assert en.avg_ttr == round((0.75 + 1.0) / 2, 6)
    assert (de.n_docs, de.vocab, de.hapax) == (3, 1, 0)
    assert de.hapax_ratio == 0.0
    # only doc 3 has tokens: mean TTR over scored docs, not all docs
    assert de.avg_ttr == round(1 / 3, 6)


def test_zipf_slope_on_power_law(spark):
    # freq(rank r) = 64 >> (r-1): ln f = ln 64 − (r−1) ln 2, so the slope
    # of ln f on ln RANK is negative and the fit uses exactly 4 points
    words = []
    for rank, (tok, freq) in enumerate(
        [("w1", 64), ("w2", 32), ("w3", 16), ("w4", 8)], start=1
    ):
        words.extend([tok] * freq)
    doc = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    row = zipf_slope(doc, top_n=4).collect()[0]
    assert row.n == 4
    assert row.slope is not None and row.slope < -1.0  # steeper than zipf


def test_zipf_slope_degenerate(spark):
    # a single vocabulary item → one point → slope NULL (n < 2 guard)
    doc = spark.createDataFrame([(1, "a a a")], "doc_id long, text string")
    row = zipf_slope(doc).collect()[0]
    assert row.n == 1 and row.slope is None


def test_heaps_law_hand_computed(spark):
    import math
    from assignment_etl_spark.ext.lexdiv import heaps_law

    corpus = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d d"), (3, "e a"), (4, "")],
        "doc_id long, text string",
    )
    row = heaps_law(corpus).collect()[0]
    # cumulative (N, V): doc1 (3,3) doc2 (7,4) doc3 (9,5); doc4 empty
    assert row.n_docs == 3
    assert row.total_tokens == 9 and row.total_types == 5
    pts = [(3, 3), (7, 4), (9, 5)]
    xs = [round(math.log10(n), 6) for n, _ in pts]
    ys = [round(math.log10(v), 6) for _, v in pts]
    n = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row.beta == pytest.approx(beta, abs=1e-6)
    assert row.log10_k == pytest.approx((sy - beta * sx) / n, abs=1e-6)
    # natural-language-ish growth: 0 < beta < 1
    assert 0.0 < row.beta < 1.0


def test_heaps_law_degenerate_single_point(spark):
    from assignment_etl_spark.ext.lexdiv import heaps_law

    corpus = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    row = heaps_law(corpus).collect()[0]
    assert row.n_docs == 1 and row.beta is None and row.log10_k is None
