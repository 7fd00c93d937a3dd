"""Hashed Naive-Bayes text classifier — the fasttext-style linear filter
that production corpus pipelines train for quality/domain classification
(CCNet's wiki-vs-crawl filter, GPT-3's WebText classifier, LLaMA's
quality scoring are all this shape: hashed bag-of-words features × a
linear weight vector).

Train and apply are both single dataflows:

- ``train_nb_classifier``: tokenize → hash every token into one of
  ``n_buckets`` feature buckets (portable string hash, so a second
  engine replays the bucketing exactly) → ONE conditional aggregate per
  bucket (positive/negative token counts) → per-bucket log-likelihood
  ratio with add-alpha smoothing. The weight table is ≤ n_buckets rows
  REGARDLESS of corpus size — it broadcasts forever after.
- ``score_documents_nb``: tokenize → explode → broadcast-join the weight
  table on the bucket id → per-document decimal sum of (rounded) bucket
  weights + the class prior. Cost is one tokenizing pass over the
  corpus, the same as any token-counting operator; the join side is the
  tiny weight table, never document data.

Determinism contract: bucket counts are exact integers; each weight is
ONE closed-form ``ln`` expression of integer counts, rounded to
``round_to`` decimals before use (absorbing libm ulps); document scores
are decimal sums of those rounded weights — so DuckDB replays training
AND scoring bit-for-bit (gate ``nb_quality_classifier``).

Reference parity note: the reference repo has no ML surface; this is
training-data-pipeline scope alongside ext/dsir.py (importance
sampling) and ext/lm.py (perplexity filtering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.ext.sketch import portable_hash_int, portable_str_hash

TOKEN_SPLIT = r"\s+"


def _tokens(text_col: Column) -> Column:
    return F.filter(
        F.split(F.lower(text_col), TOKEN_SPLIT), lambda t: F.length(t) > 0
    )


def feature_bucket(token_col: Column, n_buckets: int, salt: int = 0) -> Column:
    """Portable token → feature bucket: polynomial string hash, one
    integer mix round, mod n_buckets."""
    return F.pmod(
        portable_hash_int(portable_str_hash(token_col), salt=salt),
        F.lit(n_buckets),
    )


def train_nb_classifier(
    docs: DataFrame,
    *,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    salt: int = 0,
    round_to: int = 9,
) -> DataFrame:
    """Multinomial Naive Bayes over hashed token buckets. ``label_col``
    must be boolean (True = positive class). Returns the weight table
    (bucket, w) where w = ln P(bucket|pos) − ln P(bucket|neg) with
    add-``alpha`` smoothing, rounded to ``round_to``; buckets never seen
    in training are absent (their smoothed weight is a constant the
    scorer treats as 0 — identical additive shift for all docs of equal
    length, irrelevant to ranking and replayed identically by the
    oracle)."""
    lab = F.col(label_col)
    tok = docs.select(
        lab.alias("_y"),
        F.explode(_tokens(F.col(text_col))).alias("_t"),
    ).select("_y", feature_bucket(F.col("_t"), n_buckets, salt).alias("bucket"))
    counts = tok.groupBy("bucket").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(~F.col("_y"), 1).otherwise(0)).alias("n_neg"),
    )
    totals = tok.agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("tot_pos"),
        F.sum(F.when(~F.col("_y"), 1).otherwise(0)).alias("tot_neg"),
    )
    a = float(alpha)
    denom_shift = a * n_buckets
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.col("n_pos") + F.lit(a))
                    / (F.col("tot_pos") + F.lit(denom_shift))
                )
                - F.log(
                    (F.col("n_neg") + F.lit(a))
                    / (F.col("tot_neg") + F.lit(denom_shift))
                ),
                round_to,
            ).alias("w"),
        )
    )


def score_documents_nb(
    docs: DataFrame,
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: int = 0,
    decimal_scale: int = 9,
    round_to: int = 6,
) -> DataFrame:
    """Per-document NB score: decimal sum of the (rounded) weights of
    the document's token buckets (token multiplicity counts, as in
    multinomial NB). Docs with zero tokens (empty/NULL text) survive
    with n_tokens=0 and a NULL score — a document must never silently
    vanish from a scoring pass. Output: (id, n_tokens, score)."""
    dec = f"decimal(28,{decimal_scale})"
    tok = docs.select(
        F.col(id_col),
        F.explode(_tokens(F.col(text_col))).alias("_t"),
    ).select(
        id_col, feature_bucket(F.col("_t"), n_buckets, salt).alias("bucket")
    )
    joined = tok.join(F.broadcast(weights), on="bucket", how="left")
    scored = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum(F.coalesce(F.col("w"), F.lit(0.0)).cast(dec)).cast("double"),
            round_to,
        ).alias("score"),
    )
    return (
        docs.select(id_col)
        .join(scored, on=id_col, how="left")
        .withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
    )
