"""Collocation mining: pointwise mutual information over adjacent
token bigrams.

PMI(x, y) = ln( p(x,y) / (p(x)·p(y)) ) with p(x,y) = c_xy / N_bigrams
and p(x) = c_x / N_tokens — the classic measure of "these two words
co-occur far more than chance" (Church & Hanks 1990). A ``min_count``
floor removes hapax pairs, whose PMI is maximal by construction and
pure noise.

Scale shape: one explode for unigram counts and one for bigram counts
(both shuffle well-distributed token keys with map-side combine), the
two corpus totals ride along as a 1-row broadcast, and the bigram table
joins unigram counts twice on the token key. No cross product anywhere;
the final top-k is TakeOrderedAndProject. The bigram table is the big
intermediate (≈ corpus token count) — exactly the footprint of the LM
trainer in ext/lm.py, which shares this dataflow.

Reference parity note: the reference has no corpus statistics; this
extends the text-analysis layer (ext/text.py, ext/lm.py, ext/tfidf.py)
with the collocation statistic used for tokenizer-vocabulary seeding
and quality auditing of n-gram distributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from assignment_etl_spark.ext.invindex import tokenize


def pmi_collocations(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    topk: int = 50,
    round_to: int = 6,
) -> DataFrame:
    """Top-``topk`` adjacent-bigram collocations by PMI (ties: lexical
    (x, y) order). Returns (x, y, n_xy, pmi, rank)."""
    toks = docs.select(tokenize(text_col).alias("_l")).withColumn(
        "_n", F.size("_l")
    )
    # uni feeds three consumers (the _nu total, cx, cy) and bi two (the
    # _nb total and the scored flow); unpersisted, every consumer
    # re-tokenizes the corpus from scratch. Persist both count tables —
    # vocab-sized, far smaller than the corpus — so the two tokenize
    # passes run once each (query-scoped, CacheManager-managed).
    from assignment_etl_spark.caching import scoped_persist

    uni = scoped_persist(
        toks.select(F.explode("_l").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bigrams = toks.filter(F.col("_n") >= 2).select(
        F.explode(
            F.zip_with(
                F.slice("_l", 1, F.col("_n") - 1),
                F.slice("_l", 2, F.col("_n") - 1),
                lambda a, b: F.struct(a.alias("x"), b.alias("y")),
            )
        ).alias("p")
    )
    bi = scoped_persist(bigrams.groupBy(
        F.col("p.x").alias("x"), F.col("p.y").alias("y")
    ).agg(F.count(F.lit(1)).alias("n_xy")))
    totals = uni.agg(F.sum("c").alias("_nu")).crossJoin(
        bi.agg(F.sum("n_xy").alias("_nb"))
    )
    cx = uni.select(F.col("w").alias("x"), F.col("c").alias("_cx"))
    cy = uni.select(F.col("w").alias("y"), F.col("c").alias("_cy"))
    scored = (
        bi.filter(F.col("n_xy") >= min_count)
        .join(cx, "x")
        .join(cy, "y")
        .crossJoin(F.broadcast(totals))
        .select(
            "x",
            "y",
            "n_xy",
            F.round(
                F.log(
                    (F.col("n_xy") / F.col("_nb"))
                    / (
                        (F.col("_cx") / F.col("_nu"))
                        * (F.col("_cy") / F.col("_nu"))
                    )
                ),
                round_to,
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(
        F.col("pmi").desc(), F.col("x"), F.col("y")
    ).limit(topk)
    return top.withColumn(
        "rank",
        # ≤ topk rows after the TakeOrderedAndProject limit above
        F.row_number().over(
            Window.orderBy(F.col("pmi").desc(), F.col("x"), F.col("y"))
        ),
    )
