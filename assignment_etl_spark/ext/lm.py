"""In-engine n-gram language model for perplexity-based quality filtering.

CCNet (Wenzek et al., 2020) ranks Common Crawl documents by the perplexity
of a KenLM model and keeps the low-perplexity tier; this module implements
the same pipeline shape with the LM itself trained inside the engine — a
bigram model with add-alpha smoothing — so the whole train+score loop is
native DataFrame ops (explode → window lag → two count aggregations →
joins), no external model artifact, no Python in the hot path.

Cross-engine determinism policy (matches the repo-wide gate rules): the
per-bigram log-probability is a single float op on an exactly-representable
rational (counts + alpha), rounded to 6 decimals and cast to
decimal(18,6) before the per-document sum — the sum is exact and
associative, so partial-aggregation order cannot shift the result and a
DuckDB oracle replays it bit-for-bit.

Scale notes (100 TB corpus): tokenization is one explode (no shuffle); the
lag window shuffles once on doc_id; training is two hash aggregations on
token keys; scoring joins the token stream to the bigram/context tables on
those keys. The count tables grow with the corpus vocabulary, so the join
strategy is ADAPTIVE by default (``broadcast_lm=None``): no hint is
planted and AQE converts to broadcast at runtime iff the table's ACTUAL
shuffle size is under the broadcast threshold — small corpora get the
broadcast plan, big ones a sort-merge join that spills instead of OOMing.
The r12 memory-pressure sweep measured the forced-broadcast failure this
replaces: at sf10 under a 2g heap, score_backoff's five broadcast count
tables OOM'd the executor, while the adaptive plan completes (heap-bounded
spill). ``broadcast_lm=True`` remains for callers that KNOW the vocabulary
is bounded. Head words are skewed, but the joined side is counts (tiny
rows), so AQE's skew-join handles it; nothing is per-document state.
When train and score read the same corpus, persist (or write out) the
count tables returned by train_bigram_lm before scoring — they are lazy
plans, and scoring without a barrier re-derives the token stream once per
count table. At 100 TB the LM tables are the artifact you checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START_TOKEN = "<s>"


def _tokens(docs: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, token) stream; single-space split, empties dropped —
    identical to the top_words tokenization so oracles share one model."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    return docs.select(F.col(id_col), F.posexplode(words).alias("pos", "token"))


def _bigrams(docs: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    w = Window.partitionBy(id_col).orderBy("pos")
    return _tokens(docs, id_col=id_col, text_col=text_col).withColumn(
        "prev", F.lag("token", 1, START_TOKEN).over(w)
    )


def train_bigram_lm(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> dict[str, DataFrame]:
    """Count tables for an add-alpha bigram LM.

    Returns {"bigrams": (prev, token, n_bigram), "contexts": (prev, n_ctx),
    "vocab": 1-row (vocab_size)} — all lazy DataFrames; vocab_size stays a
    plan-side cross join at score time, never a driver scalar.
    """
    big = _bigrams(docs, id_col=id_col, text_col=text_col)
    # one corpus pass (same marginals trick as train_backoff_lm): context
    # counts and vocab size re-aggregate the bigram-count table, so the
    # scoring DAG scans the corpus once and reuses the n_bigram exchange
    n2 = big.groupBy("prev", "token").agg(F.count(F.lit(1)).alias("n_bigram"))
    return {
        "bigrams": n2,
        "contexts": n2.groupBy("prev").agg(F.sum("n_bigram").alias("n_ctx")),
        "vocab": n2.select("token").distinct().agg(
            F.count(F.lit(1)).alias("vocab_size")
        ),
    }


def score_loglik(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    broadcast_lm: bool | None = None,
) -> DataFrame:
    """Per-document total log2-likelihood under the bigram LM:
    (id, n_tokens, sum_lp) with sum_lp the DECIMAL-exact sum of
    round-6 per-bigram log-probs — the reusable core of
    :func:`score_perplexity`, exposed for likelihood-RATIO operators
    (ext/dsir.py) where the exact sums must subtract cleanly."""
    bigrams, contexts, vocab = lm["bigrams"], lm["contexts"], lm["vocab"]
    if broadcast_lm:  # None (adaptive) and False both leave AQE to pick
        bigrams, contexts = F.broadcast(bigrams), F.broadcast(contexts)
    big = _bigrams(docs, id_col=id_col, text_col=text_col)
    scored = (
        big.join(bigrams, on=["prev", "token"], how="left")
        .join(contexts, on="prev", how="left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.round(
                F.log2(
                    (F.coalesce(F.col("n_bigram"), F.lit(0)) + F.lit(alpha))
                    / (
                        F.coalesce(F.col("n_ctx"), F.lit(0))
                        + F.lit(alpha) * F.col("vocab_size")
                    )
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("lp").alias("sum_lp")
    )


def score_perplexity(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    broadcast_lm: bool | None = None,
) -> DataFrame:
    """Per-document bigram perplexity: (id, n_tokens, ppl).

    p(w|prev) = (c(prev,w) + alpha) / (c(prev) + alpha * V); unseen
    contexts/bigrams degrade to the uniform alpha floor. ppl = 2^H with
    H = -mean(log2 p). Documents with no tokens produce no row.
    """
    agg = score_loglik(
        docs,
        lm,
        id_col=id_col,
        text_col=text_col,
        alpha=alpha,
        broadcast_lm=broadcast_lm,
    )
    h = -(F.col("sum_lp").cast("double") / F.col("n_tokens"))
    return agg.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(F.pow(F.lit(2.0), h), 4).alias("ppl"),
    )


def _trigram_stream(docs: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        _tokens(docs, id_col=id_col, text_col=text_col)
        .withColumn("prev1", F.lag("token", 1, START_TOKEN).over(w))
        .withColumn("prev2", F.lag("token", 2, START_TOKEN).over(w))
    )


def train_backoff_lm(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> dict[str, DataFrame]:
    """Count tables for a trigram stupid-backoff model (Brants et al.,
    2007 — "Large Language Models in Machine Translation"): the web-scale
    recipe that replaces smoothing with a fixed backoff multiplier, which
    is exactly what keeps it engine-portable (every score is a single
    count ratio times a constant; no discounting arithmetic to replicate).
    One corpus pass builds the stream; each table is a hash aggregation.
    """
    tri = _trigram_stream(docs, id_col=id_col, text_col=text_col)
    # ONE corpus pass: only the trigram-count aggregation touches the raw
    # stream; every lower-order table is a re-aggregation of n3 (a trigram
    # (prev2,prev1,token) occurs n3 times, so its marginals are sums of
    # n3). The six derived plans share an identical n3 subtree, which
    # Catalyst dedupes inside the scoring DAG — audited executed plan:
    # ONE FileScan + ReusedExchange×6, vs one corpus scan+window pass per
    # count table in the naive per-table-groupBy formulation. The
    # remaining shuffles are over the aggregated (vocab-bounded) tables.
    n3 = tri.groupBy("prev2", "prev1", "token").agg(F.count(F.lit(1)).alias("n3"))
    return {
        "trigrams": n3,
        "tri_contexts": n3.groupBy("prev2", "prev1").agg(
            F.sum("n3").alias("ctx3")
        ),
        "bigrams": n3.groupBy("prev1", "token").agg(F.sum("n3").alias("n2")),
        "contexts": n3.groupBy("prev1").agg(F.sum("n3").alias("ctx2")),
        "unigrams": n3.groupBy("token").agg(F.sum("n3").alias("n1")),
        "totals": n3.agg(
            F.sum("n3").alias("n_tokens"),
            F.countDistinct("token").alias("vocab_size"),
        ),
    }


BACKOFF = 0.4


def score_backoff(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool | None = None,
) -> DataFrame:
    """Per-document stupid-backoff pseudo-perplexity (id, n_tokens, sppl).

    S(w|w₋₂w₋₁) = n3/ctx3 if the trigram was seen, else 0.4·n2/ctx2 if
    the bigram was, else 0.4²·(n1+1)/(N+V) (add-one floor so unseen
    words stay finite). Scores are not normalized probabilities — the
    point of stupid backoff — so the aggregate is a *pseudo*-perplexity,
    monotone in fluency, computed with the repo's decimal-sum policy.
    """
    maybe_b = F.broadcast if broadcast_lm else (lambda d: d)
    tri = _trigram_stream(docs, id_col=id_col, text_col=text_col)
    joined = (
        tri.join(maybe_b(lm["trigrams"]), on=["prev2", "prev1", "token"], how="left")
        .join(maybe_b(lm["tri_contexts"]), on=["prev2", "prev1"], how="left")
        .join(maybe_b(lm["bigrams"]), on=["prev1", "token"], how="left")
        .join(maybe_b(lm["contexts"]), on="prev1", how="left")
        .join(maybe_b(lm["unigrams"]), on="token", how="left")
        .crossJoin(F.broadcast(lm["totals"]))
    )
    score = (
        F.when(F.col("n3").isNotNull(), F.col("n3") / F.col("ctx3"))
        .when(
            F.col("n2").isNotNull(),
            F.lit(BACKOFF) * F.col("n2") / F.col("ctx2"),
        )
        .otherwise(
            F.lit(BACKOFF * BACKOFF)
            * (F.coalesce(F.col("n1"), F.lit(0)) + F.lit(1.0))
            / (F.col("n_tokens") + F.col("vocab_size"))
        )
    )
    agg = (
        joined.select(
            F.col(id_col),
            F.round(F.log2(score), 6).cast("decimal(18,6)").alias("lp"),
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lp").alias("sum_lp"))
    )
    h = -(F.col("sum_lp").cast("double") / F.col("n_tokens"))
    return agg.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(F.pow(F.lit(2.0), h), 4).alias("sppl"),
    )


def perplexity_filter(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    *,
    max_ppl: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """CCNet keep-rule: documents whose perplexity is at most max_ppl
    (low-ppl = fluent under the reference corpus LM)."""
    scores = score_perplexity(
        docs, lm, id_col=id_col, text_col=text_col, alpha=alpha
    )
    return docs.join(
        scores.filter(F.col("ppl") <= max_ppl).select(id_col, "ppl"),
        on=id_col,
        how="inner",
    )


def kneser_ney_bigram(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    round_to: int = 9,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram distribution (Kneser & Ney 1995 /
    Chen & Goodman 1999 — the smoothing KenLM ships by default, which
    the add-alpha and stupid-backoff operators above approximate):

        P(w|v) = max(c(v,w) − D, 0)/c(v)
               + D·N1+(v,·)/c(v) · N1+(·,w)/N1+(·,·)

    where N1+ counts DISTINCT continuations — the "how many contexts
    has w completed" estimator that makes KN beat raw-frequency backoff
    on collocation-bound tokens ("Francisco" is frequent but only ever
    follows "San").

    Returns one row per observed bigram:
    (prev, token, n_bigram, n_ctx, n1_fwd, n1_bwd, p_kn).

    Scale shape: ONE pass over the corpus builds the bigram count table
    (explode → lag window on doc id → hash aggregate); every other
    quantity derives from that vocab²-bounded table — c(v) and N1+(v,·)
    by re-aggregating on prev, N1+(·,w) on token, N1+(·,·) as a 1-row
    broadcast. The corpus is never rescanned and the joins key on count
    tables, not data. Determinism: counts are exact longs; p_kn is one
    closed-form double expression over them (D = 0.75 is exactly
    representable), rounded once — engine-replayable."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"need 0 < discount < 1, got {discount}")
    big = _bigrams(docs, id_col=id_col, text_col=text_col)
    bc = big.groupBy("prev", "token").agg(
        F.count(F.lit(1)).alias("n_bigram")
    )
    ctx = bc.groupBy("prev").agg(
        F.sum("n_bigram").alias("n_ctx"),
        F.count(F.lit(1)).alias("n1_fwd"),
    )
    cont = bc.groupBy("token").agg(F.count(F.lit(1)).alias("n1_bwd"))
    tot = bc.agg(F.count(F.lit(1)).alias("n1_tot"))
    d = F.lit(discount)
    p_kn = (
        F.greatest(F.col("n_bigram") - d, F.lit(0.0)) / F.col("n_ctx")
        + (d * F.col("n1_fwd") / F.col("n_ctx"))
        * (F.col("n1_bwd") / F.col("n1_tot"))
    )
    return (
        bc.join(ctx, on="prev")
        .join(cont, on="token")
        .crossJoin(F.broadcast(tot))
        .select(
            "prev", "token", "n_bigram", "n_ctx", "n1_fwd", "n1_bwd",
            F.round(p_kn, round_to).alias("p_kn"),
        )
    )


def good_turing_counts(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 9,
) -> DataFrame:
    """Good–Turing frequency re-estimation (Good 1953; the
    Katz-backoff ingredient beside Kneser–Ney above): from the
    frequency-of-frequencies table N_r = |{tokens seen exactly r
    times}|, the adjusted count is r* = (r+1)·N_{r+1}/N_r and the
    probability mass reserved for UNSEEN tokens is N_1/N. The
    leave-one-out estimator every count-based smoother starts from.

    Returns one row per observed frequency r:
    (r, n_r, r_star, r_star_sgt, p_mass) where p_mass = r·N_r/N is the
    observed mass at r (so the caller can see where the distribution
    lives); r_star (the raw Turing estimate) is NULL at the highest r
    (no N_{r+1}); r_star_sgt is the SIMPLE GOOD–TURING smoothed
    estimate (Gale & Sampson 1995 — public): gap-corrected
    Z_r = N_r / (½(t − q)) with q/t the neighboring observed
    frequencies (q = 0 before the first, t = 2r − q after the last),
    one log-log OLS ln Z = a + b·ln r (the ops/timeseries.trend_slope
    decimal-moment kernel — the zipf/heaps policy), then
    r*_SGT = (r+1)·((r+1)/r)^b — defined at EVERY r including the
    un-smoothable tail the raw estimate leaves NULL. NULL only when
    the fit itself degenerates (<2 distinct frequencies or zero
    log-variance). Pure LGT (no Turing/LGT switch): simplest variant,
    documented as such.

    Scale shape: token counts are one hash aggregate over the corpus;
    N_r is a second aggregate over the VOCABULARY (≤ distinct tokens);
    the r ↔ r+1 self-join, the neighbor ranking (a range-exchange
    global_row_number — never a single-partition window), and the
    1-row OLS all run on the counts-of-counts table, whose size is
    O(√N distinct frequencies) — tiny. Nothing rescans the corpus.
    Determinism: all counts exact longs; r*, p_mass, and each OLS
    moment are closed-form doubles rounded once (decimal products /
    decimal-moment sums — the rankstats overflow policy); b is rounded
    before the pow so both engines exponentiate the same double."""
    from assignment_etl_spark.ops.ids import global_row_number
    from assignment_etl_spark.ops.timeseries import trend_slope

    toks = _tokens(docs, id_col=id_col, text_col=text_col)
    tc = toks.groupBy("token").agg(F.count(F.lit(1)).alias("r"))
    nr = tc.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    tot = toks.agg(F.count(F.lit(1)).alias("n_total"))
    nxt = nr.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")
    )
    # SGT: neighbor gaps via integer-rank self-joins on the ranked
    # counts-of-counts table, then the shared decimal-moment OLS
    ranked = global_row_number(nr, [F.asc("r")], out_col="_rn")
    prev = ranked.select(
        (F.col("_rn") + 1).alias("_rn"), F.col("r").alias("_q")
    )
    after = ranked.select(
        (F.col("_rn") - 1).alias("_rn"), F.col("r").alias("_tn")
    )
    zt = (
        ranked.join(prev, on="_rn", how="left")
        .join(after, on="_rn", how="left")
        .withColumn("_q", F.coalesce(F.col("_q"), F.lit(0)))
        .withColumn(
            "_t",
            F.coalesce(F.col("_tn"), F.lit(2) * F.col("r") - F.col("_q")),
        )
        .select(
            F.lit("c").alias("_k"),
            F.log(F.col("r").cast("double")).alias("_x"),
            F.log(
                F.col("n_r")
                / (F.lit(0.5) * (F.col("_t") - F.col("_q")).cast("double"))
            ).alias("_y"),
        )
    )
    bfit = trend_slope(zt, key_col="_k", x_col="_x", y_col="_y").select(
        F.col("slope").alias("_b")
    )
    dec = "decimal(38,0)"
    r_star = (
        ((F.col("r") + 1).cast(dec) * F.col("n_r1")).cast("double")
        / F.col("n_r")
    )
    rd = F.col("r").cast("double")
    r_star_sgt = F.when(
        F.col("_b").isNotNull(),
        (rd + 1.0) * F.pow((rd + 1.0) / rd, F.col("_b")),
    )
    p_mass = (
        (F.col("r").cast(dec) * F.col("n_r")).cast("double")
        / F.col("n_total")
    )
    return (
        nr.join(nxt, on="r", how="left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(bfit))
        .select(
            F.col("r").cast("long").alias("r"),
            F.col("n_r").cast("long").alias("n_r"),
            F.round(r_star, round_to).alias("r_star"),
            F.round(r_star_sgt, round_to).alias("r_star_sgt"),
            F.round(p_mass, round_to).alias("p_mass"),
        )
    )
