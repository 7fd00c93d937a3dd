"""Text-analysis operators (ext.text)."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.text import (
    bpe_ish_token_count,
    detect_language,
    fingerprint,
    punct_ratio,
    quality_score,
    text_profile,
    whitespace_token_count,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world  foo"), (2, ""), (3, "   "), (4, None), (5, "one")],
        "i int, text string",
    )
    rows = {
        r.i: (r.ws, r.bpe)
        for r in df.select(
            "i",
            whitespace_token_count(F.col("text")).alias("ws"),
            bpe_ish_token_count(F.col("text")).alias("bpe"),
        ).collect()
    }
    assert rows[1] == (3, 3)
    assert rows[2] == (0, 0)
    assert rows[3] == (0, 0)
    assert rows[4] == (0, 0)
    assert rows[5] == (1, 1)


def test_punct_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "a,b.c!"), (2, "clean text with the and of to is in words")],
        "i int, text string",
    )
    rows = {r.i: r for r in df.select(
        "i",
        punct_ratio(F.col("text")).alias("p"),
        quality_score(F.col("text")).alias("q"),
    ).collect()}
    assert rows[1].p == pytest.approx(3 / 6)
    assert rows[2].p == 0.0
    assert 0.0 < rows[2].q <= 1.0


def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in that house"),
            (2, "der hund und die katze ist nicht ein vogel zu"),
            (3, "le chat est dans la maison et les arbres"),
            (4, "xyzzy qwerty plugh"),
        ],
        "i int, text string",
    )
    got = {r.i: r.lang for r in df.select("i", detect_language(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "  HELLO\tWORLD  "), (4, "different")],
        "i int, text string",
    )
    fps = {r.i: r.fp for r in df.select("i", fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[1]


def test_text_profile_columns(spark):
    df = spark.createDataFrame([(1, "the quick brown fox")], "doc_id int, text string")
    out = text_profile(df)
    for c in [
        "n_tokens_ws",
        "n_tokens_bpe",
        "punct_ratio",
        "quality_score",
        "lang_detected",
        "fingerprint",
    ]:
        assert c in out.columns
    assert out.first().n_tokens_ws == 4
