"""DSIR: Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) — select raw-corpus documents that look like a target
domain by likelihood ratio under cheap n-gram feature models.

The original uses hashed-n-gram bag models; this implementation uses the
repo's in-engine add-alpha bigram LM (ext/lm.py) as the feature model:

    logw(d) = log2 p_target(d) − log2 p_raw(d)

with both LMs trained inside the engine (two count aggregations each, no
external artifact). A per-token normalized ratio is also emitted —
length-invariant ranking, so long documents don't dominate selection.
Resampling composes with ext/sampling.priority_sample (weight = the
exponentiated ratio): deterministic weighted sampling without
replacement, the engine-portable stand-in for DSIR's Gumbel top-k.

Determinism: both sum_lp totals are DECIMAL-exact sums of round-6
per-bigram log-probs (ext/lm.py policy), so their difference is exact
decimal arithmetic and an independent engine replays every weight
bit-for-bit.

Scale shape: two LM trainings (hash aggregations on token keys — the
target one typically tiny), two scoring passes over the raw corpus that
share its bigram stream, one id-key join. LM count tables broadcast in
the common case; nothing iterates, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.ext.lm import score_loglik, train_bigram_lm


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """(id, n_tokens, log2_ratio, log2_ratio_per_token) for every raw
    document: positive → more target-like than raw-like. ``target`` is
    any DataFrame with the same id/text columns (typically a filtered
    slice of ``raw`` or a separate curated corpus)."""
    lm_t = train_bigram_lm(target, id_col=id_col, text_col=text_col)
    lm_r = train_bigram_lm(raw, id_col=id_col, text_col=text_col)
    st = score_loglik(raw, lm_t, id_col=id_col, text_col=text_col, alpha=alpha)
    sr = score_loglik(raw, lm_r, id_col=id_col, text_col=text_col, alpha=alpha)
    ratio = F.col("_lp_t") - F.col("_lp_r")  # exact decimal subtraction
    return (
        st.select(
            F.col(id_col), F.col("n_tokens"), F.col("sum_lp").alias("_lp_t")
        )
        .join(
            sr.select(F.col(id_col), F.col("sum_lp").alias("_lp_r")),
            on=id_col,
        )
        .select(
            F.col(id_col),
            "n_tokens",
            F.round(ratio.cast("double"), round_to).alias("log2_ratio"),
            F.round(
                ratio.cast("double") / F.col("n_tokens"), round_to
            ).alias("log2_ratio_per_token"),
        )
    )
