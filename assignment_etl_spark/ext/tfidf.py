"""TF-IDF term weighting and per-document keyword extraction.

The IR classic as pure DataFrame algebra: term frequencies are one hash
aggregation over the exploded token stream, document frequencies a second
on the token key, and the corpus size rides along as a 1-row broadcast
(never a driver scalar). Scoring joins the small per-token IDF table back
onto the TF table — broadcast when the vocabulary is bounded, shuffle
otherwise — and per-document top-k is a row_number window partitioned by
document (distributed; no global sort).

Smoothing follows the common sklearn formulation
idf = ln((N + 1) / (df + 1)) + 1, which keeps every idf positive and
defined for unseen terms. Determinism: scores are rounded to 6 decimals
and ties rank lexically, so two engines produce identical top-k sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from assignment_etl_spark.ext.lm import _tokens


def tfidf_scores(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token, tf, df, tfidf): tf is relative in-doc frequency, score
    rounded to 6 decimals.

    Shuffle shape: the corpus is exploded ONCE into the TF table; doc
    lengths and document frequencies are windows over that (vocab×docs
    sized) table rather than joins back through fresh explodes — a
    join-based formulation re-derives the corpus scan per branch (audited
    on the gate query: 13 exchanges → 7). The corpus size comes from a
    scan-only count (no explode) broadcast as one row.
    """
    words = F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    n_docs = docs.agg(
        F.sum((F.size(words) > 0).cast("long")).alias("n_docs")
    )
    toks = _tokens(docs, id_col=id_col, text_col=text_col)
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("n_term"))
    scored = (
        tf.withColumn("doc_len", F.sum("n_term").over(Window.partitionBy(id_col)))
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("token")))
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("token"),
            F.col("n_term"),
            F.col("df"),
            F.round(
                (F.col("n_term") / F.col("doc_len"))
                * (
                    F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    return scored


def top_terms(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k highest-tfidf terms per document; deterministic tie-break on
    the term itself."""
    scored = tfidf_scores(docs, id_col=id_col, text_col=text_col)
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "token", "tfidf")
    )
