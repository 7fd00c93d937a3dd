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

from pyspark.sql import Column, DataFrame, Window
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
    return _train_from_tok(
        tok, n_buckets=n_buckets, alpha=alpha, round_to=round_to
    )


def _train_from_tok(
    tok: DataFrame, *, n_buckets: int, alpha: float, round_to: int
) -> DataFrame:
    """Weight table from a pre-built (_y, bucket) token-bucket stream —
    the shared tail of :func:`train_nb_classifier` and
    :func:`train_and_score_nb`."""
    counts = tok.groupBy("bucket").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(~F.col("_y"), 1).otherwise(0)).alias("n_neg"),
    )
    # Class totals are the exact column sums of the per-bucket counts
    # (every token lands in exactly one bucket), so they ride a window
    # over the ≤ n_buckets-row aggregate instead of a second full pass
    # over the exploded token table: one corpus scan per train, not two.
    # The window's input is the pmod-bounded bucket aggregate, never
    # sf-proportional rows.
    wall = Window.partitionBy()
    totaled = counts.withColumn("tot_pos", F.sum("n_pos").over(wall)).withColumn(
        "tot_neg", F.sum("n_neg").over(wall)
    )
    a = float(alpha)
    denom_shift = a * n_buckets
    return (
        totaled
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


def train_and_score_nb(
    docs: DataFrame,
    *,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    salt: int = 0,
    round_to: int = 6,
    weight_round_to: int = 9,
) -> DataFrame:
    """Train the NB classifier on ``docs`` and score the SAME docs with
    one shared tokenize pass: the exploded (id, _y, bucket) stream is
    persisted and feeds both the training aggregate and the scoring
    aggregate, so the corpus is tokenized once instead of once per
    phase. Values are bit-identical to
    ``score_documents_nb(docs, train_nb_classifier(docs, ...), ...)``
    (same expressions over the same rows). Output: (id, n_tokens,
    score) with the zero-token NULL-score contract of
    :func:`score_documents_nb`."""
    from assignment_etl_spark.caching import scoped_persist

    tok = scoped_persist(docs.select(
        F.col(id_col),
        F.col(label_col).alias("_y"),
        F.explode(_tokens(F.col(text_col))).alias("_t"),
    ).select(
        id_col,
        "_y",
        feature_bucket(F.col("_t"), n_buckets, salt).alias("bucket"),
    ))
    weights = _train_from_tok(
        tok.select("_y", "bucket"),
        n_buckets=n_buckets,
        alpha=alpha,
        round_to=weight_round_to,
    )
    return _score_from_tok(
        docs.select(id_col),
        tok.select(id_col, "bucket"),
        weights,
        id_col=id_col,
        round_to=round_to,
    )


def score_calibration(
    scored: DataFrame,
    *,
    label_col: str,
    score_col: str = "score",
    bin_width: float = 2.0,
    lo_bin: int = -5,
    hi_bin: int = 5,
    round_to: int = 6,
    decimal_scale: int = 6,
) -> DataFrame:
    """Reliability diagram over fixed-width score bins: (bin, n, n_pos,
    pos_rate, avg_score) per bin, where bin = clamp(floor(score /
    bin_width), lo_bin, hi_bin) — fixed boundaries, not quantiles, so
    binning needs no global sort and replays identically in any engine
    (a well-calibrated scorer shows pos_rate rising monotonically with
    the bin). Rows with a NULL score (unscored docs) are excluded.
    ``avg_score`` decimal-sums the (already-rounded) scores so the mean
    is accumulation-order-independent. One hash aggregate over at most
    hi_bin − lo_bin + 1 output rows."""
    dec = f"decimal(28,{decimal_scale})"
    s = F.col(score_col)
    binned = scored.filter(s.isNotNull()).withColumn(
        "bin",
        F.least(
            F.greatest(
                F.floor(s / F.lit(float(bin_width))), F.lit(lo_bin)
            ),
            F.lit(hi_bin),
        ).cast("int"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(label_col).cast("long")).alias("n_pos"),
            F.sum(s.cast(dec)).alias("_s"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.round(F.col("n_pos") / F.col("n"), round_to).alias("pos_rate"),
            F.round(
                F.col("_s").cast("double") / F.col("n"), round_to
            ).alias("avg_score"),
        )
    )


def label_noise_suspects(
    docs: DataFrame,
    *,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    salt: int = 0,
    topk: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Confident-learning-lite label-noise detection: train the NB
    classifier ON the (possibly noisy) labels, score every document,
    and surface the ``topk`` docs whose label most confidently
    disagrees with the model — the cross-validation-free core of the
    Cleanlab recipe, which production labeling pipelines run to triage
    annotation errors before training.

    ``margin`` = score / n_tokens (mean per-token log-odds) — the
    length-normalized confidence, so a long document can't dominate the
    suspect list just by having more tokens. A suspect is a doc with
    n_tokens > 0 whose score sign contradicts its label; ranking is
    by |margin| desc, then id (engine-replayable tie-break). Output:
    (id, label, n_tokens, margin), strongest suspects first.

    Cost: one training pass + one scoring pass (both single dataflows,
    weight table broadcast) + a TakeOrderedAndProject of the suspect
    subset — nothing here is heavier than scoring itself."""
    if topk < 1:
        raise ValueError(f"need topk >= 1, got {topk}")
    # train-on-self + score-self: the shared-tokenize path (one corpus
    # explode persisted, consumed by both phases) — bit-identical to
    # the separate train + score calls it replaces
    scored = train_and_score_nb(
        docs,
        label_col=label_col,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        alpha=alpha,
        salt=salt,
        round_to=round_to,
    )
    lab = scored.join(docs.select(id_col, label_col), on=id_col)
    suspects = lab.filter(
        (F.col("n_tokens") > 0)
        & ((F.col("score") > 0) != F.col(label_col))
    ).select(
        id_col,
        label_col,
        "n_tokens",
        F.round(F.col("score") / F.col("n_tokens"), round_to).alias("margin"),
    )
    return suspects.orderBy(
        F.abs(F.col("margin")).desc(), F.col(id_col)
    ).limit(topk)


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
    tok = docs.select(
        F.col(id_col),
        F.explode(_tokens(F.col(text_col))).alias("_t"),
    ).select(
        id_col, feature_bucket(F.col("_t"), n_buckets, salt).alias("bucket")
    )
    return _score_from_tok(
        docs.select(id_col),
        tok,
        weights,
        id_col=id_col,
        decimal_scale=decimal_scale,
        round_to=round_to,
    )


def _score_from_tok(
    ids: DataFrame,
    tok: DataFrame,
    weights: DataFrame,
    *,
    id_col: str,
    decimal_scale: int = 9,
    round_to: int = 6,
) -> DataFrame:
    """Per-document score from a pre-built (id, bucket) stream — the
    shared tail of :func:`score_documents_nb` and
    :func:`train_and_score_nb`. ``ids`` is the full document spine so
    zero-token docs survive with n_tokens=0 and a NULL score."""
    dec = f"decimal(28,{decimal_scale})"
    joined = tok.join(F.broadcast(weights), on="bucket", how="left")
    scored = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum(F.coalesce(F.col("w"), F.lit(0.0)).cast(dec)).cast("double"),
            round_to,
        ).alias("score"),
    )
    return (
        ids
        .join(scored, on=id_col, how="left")
        .withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
    )
