"""Hashed NB text classifier (ext/textclf.py): sign separation on a
two-language corpus, held-out generalization, empty-doc survival,
partition determinism, and a golden weight check against direct counts."""

import math

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.textclf import (
    feature_bucket,
    score_documents_nb,
    train_nb_classifier,
)

EN = "the quick brown fox jumps over the lazy dog and runs to the river"
ES = "el zorro marron salta sobre el perro perezoso y corre hacia el rio"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, EN, True),
        (2, "the cat and the dog sat in the warm sun all day", True),
        (3, ES, False),
        (4, "el gato y el perro estan en el sol calido todo el dia", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, y boolean")


def test_sign_separation_and_heldout(spark, corpus):
    w = train_nb_classifier(corpus, label_col="y", n_buckets=256)
    held = spark.createDataFrame(
        [
            (10, "the dog runs to the river"),   # english-ish
            (11, "el perro corre hacia el rio"), # spanish-ish
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.score for r in score_documents_nb(held, w, n_buckets=256).collect()}
    assert got[10] > 0 > got[11]


def test_empty_and_null_docs_survive(spark, corpus):
    w = train_nb_classifier(corpus, label_col="y", n_buckets=256)
    docs = spark.createDataFrame(
        [(1, "the dog"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in score_documents_nb(docs, w, n_buckets=256).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].n_tokens == 0 and rows[2].score is None
    assert rows[3].n_tokens == 0 and rows[3].score is None


def test_weights_match_direct_counts(spark, corpus):
    """NB weight of a bucket = ln((n_pos+1)/(tot_pos+B)) - ln((n_neg+1)/(tot_neg+B))."""
    B = 64
    w = {r.bucket: r.w for r in train_nb_classifier(corpus, label_col="y", n_buckets=B).collect()}
    toks = corpus.select(
        "y", F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
    ).filter(F.length("t") > 0)
    bucketed = toks.select("y", feature_bucket(F.col("t"), B).alias("b")).collect()
    n_pos = {}
    n_neg = {}
    for r in bucketed:
        d = n_pos if r.y else n_neg
        d[r.b] = d.get(r.b, 0) + 1
    tot_pos, tot_neg = sum(n_pos.values()), sum(n_neg.values())
    for b, wv in w.items():
        want = math.log((n_pos.get(b, 0) + 1.0) / (tot_pos + B)) - math.log(
            (n_neg.get(b, 0) + 1.0) / (tot_neg + B)
        )
        assert wv == pytest.approx(want, abs=1e-8), b


def test_deterministic_across_partitionings(spark, corpus):
    a = train_nb_classifier(corpus.repartition(1), label_col="y", n_buckets=128)
    b = train_nb_classifier(corpus.repartition(7), label_col="y", n_buckets=128)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --- label-noise triage (ext/textclf.label_noise_suspects) ------------------


def test_label_noise_flags_the_flipped_label(spark):
    # four clean docs per class + one doc with obviously-English text
    # labeled False: it must surface as the TOP suspect, with a negative
    # margin (scored positive-class, labeled negative)
    from assignment_etl_spark.ext.textclf import label_noise_suspects

    rows = [
        (1, EN, True),
        (2, "the cat and the dog sat in the warm sun all day", True),
        (3, "the river runs over the brown rocks and the dog swims", True),
        (4, ES, False),
        (5, "el gato y el perro estan en el sol calido todo el dia", False),
        (6, "el rio corre sobre el campo y el perro nada", False),
        (99, "the quick dog and the lazy fox run to the warm river", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    out = label_noise_suspects(docs, label_col="y", n_buckets=256, topk=5).collect()
    assert out, "the flipped label must be detected"
    top = out[0]
    assert top.doc_id == 99
    assert top.y is False and top.margin > 0  # scored EN, labeled not-EN
    # ranking is by |margin| desc
    margins = [abs(r.margin) for r in out]
    assert margins == sorted(margins, reverse=True)


def test_label_noise_topk_validation(spark, corpus):
    from assignment_etl_spark.ext.textclf import label_noise_suspects

    with pytest.raises(ValueError, match="topk"):
        label_noise_suspects(corpus, label_col="y", topk=0)


# --- score calibration (ext/textclf.score_calibration) ----------------------


def test_score_calibration_bins_and_rates(spark):
    from assignment_etl_spark.ext.textclf import score_calibration

    rows = [
        (1, -12.5, False),  # floor(-6.25) = -7 clamps to lo_bin -5
        (2, -2.0, False),  # bin -1
        (3, -1.0, True),   # bin -1
        (4, 3.0, True),    # bin 1
        (5, 30.0, True),   # clamps to hi_bin 5
        (6, None, True),   # unscored: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, y boolean")
    got = {r.bin: r for r in score_calibration(df, label_col="y").collect()}
    assert set(got) == {-5, -1, 1, 5}
    assert (got[-5].n, got[-5].n_pos, got[-5].pos_rate) == (1, 0, 0.0)
    assert (got[-1].n, got[-1].n_pos, got[-1].pos_rate) == (2, 1, 0.5)
    assert got[-1].avg_score == -1.5
    assert (got[1].n, got[5].n) == (1, 1)
    assert got[5].avg_score == 30.0


def test_score_calibration_monotone_on_separable_corpus(spark):
    # NB on a separable two-language corpus: every bin at or above zero
    # must have pos_rate 1.0, every bin below zero 0.0
    from assignment_etl_spark.ext.textclf import (
        score_calibration,
        score_documents_nb,
        train_nb_classifier,
    )

    rows = [
        (1, EN, True),
        (2, "the cat and the dog sat in the warm sun all day", True),
        (3, ES, False),
        (4, "el gato y el perro estan en el sol calido todo el dia", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    w = train_nb_classifier(docs, label_col="y", n_buckets=256)
    scored = score_documents_nb(docs, w, n_buckets=256).join(
        docs.select("doc_id", "y"), on="doc_id"
    )
    for r in score_calibration(scored, label_col="y").collect():
        assert r.pos_rate == (1.0 if r.bin >= 0 else 0.0), r
