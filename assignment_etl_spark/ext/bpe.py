"""Byte-pair-encoding tokenizer training and encoding, Spark-first.

The scale insight that makes BPE tractable on a 100 TB corpus: merge
statistics only ever need the WORD-FREQUENCY table — one corpus pass
builds (word, n), bounded by vocabulary size, and every merge iteration
runs on that small table, never on the corpus again. Encoding then maps
corpus tokens through the trained piece table with a broadcast join.

Symbol sequences are represented as delimited strings — ``spark`` →
``(s)(p)(a)(r)(k)`` — so one merge step is a LITERAL string replace of
``(l)(r)`` with ``(lr)``: left-to-right non-overlapping replacement IS
greedy BPE substitution (``(a)(a)(a)`` + merge a,a → ``(aa)(a)``), the
delimiters make token boundaries unambiguous, and the whole step stays
in JVM codegen (regexp_extract_all + replace — no UDFs). The same
representation replays in any SQL engine with literal replace, which is
what makes the trained merge table ORACLE-CHECKABLE despite the
algorithm being iterative.

Each iteration: adjacent-pair counts (explode zipped slices, weighted by
word frequency) → argmax with total tie-break (count desc, pair asc) →
substitute. The argmax is a 1-row driver collect per merge — bounded by
n_merges, the sanctioned iterative-driver pattern (same as the IVF
k-means loop in ext/similarity.py). The symbol table is
localCheckpointed per step so plan depth stays constant.

Reference parity note: the reference repo tokenizes nothing; this is
training-data-pipeline surface (token counting in ext/text.py is the
heuristic cousin; this is the real trainable tokenizer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAIR_RE = r"\(([^)]*)\)"

# Merge rounds between symbol-table checkpoints in the trainers: the
# per-round update is a pure projection (nested literal replace), so
# lineage between checkpoints is a bounded replace chain — no stats
# compounding (projections don't multiply sizeInBytes), recompute per
# pair-count scan ≤ this many rounds of replaces over the vocab-bounded
# word table, and each skipped checkpoint saves one eager job.
_CHECKPOINT_EVERY_ROUNDS = 8


def word_freq(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(word, n) corpus word-frequency table — the one corpus pass that
    everything else (training, weighted piece counts) runs from."""
    return _word_freq(docs, text_col=text_col)


def _word_freq(docs: DataFrame, *, text_col: str) -> DataFrame:
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
    )
    return (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _to_symbols(word_col: F.Column) -> F.Column:
    return F.regexp_replace(word_col, "(.)", r"($1)")


def _pair_counts(sym: DataFrame) -> DataFrame:
    toks = F.regexp_extract_all(F.col("s"), F.lit(PAIR_RE), 1)
    pairs = F.arrays_zip(
        F.slice(toks, F.lit(1), F.size(toks) - 1),
        F.slice(toks, F.lit(2), F.size(toks) - 1),
    )
    return (
        sym.select(F.explode(pairs).alias("z"), "n")
        .select(F.col("z.0").alias("lft"), F.col("z.1").alias("rgt"), "n")
        .groupBy("lft", "rgt")
        .agg(F.sum("n").alias("cnt"))
    )


def _safe_batch(rows, k: int, truncated: bool):
    """Pick the longest PREFIX of the count-sorted candidate list (≤ k)
    that provably yields the SAME merge sequence as one-at-a-time
    selection. Candidate i is accepted only if, for every already
    accepted merge a=(l,r):

    1. it shares no symbol with {l, r, l+r} (so its own count — and its
       existence — is untouched by applying a, including the case where
       the concatenated symbol string collides with an existing symbol);
    2. cnt_i > U_a + M_a, where U_a bounds the count of any pair
       NEWLY CREATED by a ((x,lr) ≤ old cnt(x,l); (lr,y) ≤ old
       cnt(r,y)) and M_a bounds the old count of any pair already
       containing a symbol spelled "lr" that the merge could increment;
       both maxima fall back to the smallest collected count when the
       candidate window was truncated (an uncollected pair can be no
       larger). Strict > keeps the count-desc/pair-asc tie-break safe.

    The dominance bound is CUMULATIVE across the whole accepted set AND
    channel-aware: one merge (l,r) can feed a SINGLE post-merge pair
    through up to three distinct adjacency channels at once — (x,l)
    left-extensions, (r,y) right-extensions, and the (r,l) self-chain —
    when the concatenation's spelling collides with a pre-existing
    symbol (all three conflate into one count). Each channel is bounded
    by U_a, so candidate i must beat max_a(M_a) + 3·Σ_a U_a: the worst
    pre-existing concat-containing count plus three creation channels
    per accepted merge. Accepted concatenation strings also join the
    forbidden set, so two merges spelling the same new symbol can never
    co-batch.

    After applying the accepted prefix in order, every pair not touching
    an accepted symbol keeps its count (so the original ranking and
    tie-break order stand), and every pair that an accepted merge could
    create or grow is < the next accepted candidate's count by the
    cumulative bound — the sequential argmax at each intermediate state
    is exactly the next prefix element."""
    c_min = int(rows[-1].cnt) if truncated else 0
    accepted: list = []
    cum_u = 0  # Σ creation gains over accepted merges
    m_max = 0  # worst old count of any pair containing an accepted concat
    forbidden: set[str] = set()
    for r in rows:
        if len(accepted) == k:
            break
        if accepted:
            concat_r = r.lft + r.rgt
            if {r.lft, r.rgt, concat_r} & forbidden:
                break
            if not int(r.cnt) > m_max + 3 * cum_u:
                break
        accepted.append(r)
        concat = r.lft + r.rgt
        u = c_min
        m = c_min
        for q in rows:
            if q.rgt == r.lft or q.lft == r.rgt:
                u = max(u, int(q.cnt))
            if concat in (q.lft, q.rgt):
                m = max(m, int(q.cnt))
        cum_u += u
        m_max = max(m_max, m)
        forbidden |= {r.lft, r.rgt, concat}
    return accepted


def train_bpe(
    docs: DataFrame,
    *,
    n_merges: int,
    text_col: str = "text",
    batch_k: int = 1,
    stats: dict | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` merges from the corpus; returns
    [(step, left, right, pair_count), ...] in training order. Stops early
    if no adjacent pair remains.

    ``batch_k`` > 1 batches merge selection: each round collects a
    window of top pairs in ONE job and applies the longest provably
    order-equivalent prefix (see ``_safe_batch``) as a single chained
    substitution — cutting driver round-trips up to ``batch_k``× for a
    production 32k-merge vocabulary while returning bit-identical
    merges to the sequential path (the gated config is oracle-certified
    with batch_k=4 against a sequential SQL replay). Zipfian pair
    counts decay steeply, so real batches stay near ``batch_k``.
    ``stats``, when passed, records {"rounds": <jobs run>} so callers
    can assert the round-trip saving."""
    sym = (
        _word_freq(docs, text_col=text_col)
        .select(_to_symbols(F.col("word")).alias("s"), "n")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    # r12 (guide §2.4/§5): a merge round's symbol update is a PURE
    # PROJECTION (nested literal replace — the encode_words shape), so
    # it does not need a materialization barrier every round: chain the
    # replaces lazily and re-checkpoint only every
    # _CHECKPOINT_EVERY_ROUNDS rounds. Projection-only lineage cannot
    # compound join stats (the viterbi pathology), plan depth stays
    # bounded by the chain cap, and each skipped checkpoint removes one
    # eager job + one persisted-RDD write per round (measured: the
    # 10-merge gate ran 35-55 jobs, about half of them per-round
    # checkpoints; the recompute cost is ≤ cap·batch_k replaces over
    # the vocab-bounded word table per pair-count scan).
    chained = 0
    while len(merges) < n_merges:
        k = min(batch_k, n_merges - len(merges))
        window = 1 if k == 1 else max(4 * k, 16)
        rows = (
            _pair_counts(sym)
            .orderBy(F.desc("cnt"), F.asc("lft"), F.asc("rgt"))
            .limit(window)
            .collect()
        )
        rounds += 1
        if not rows:
            break
        batch = (
            rows
            if k == 1
            else _safe_batch(rows, k, truncated=len(rows) == window)
        )
        col = F.col("s")
        for r in batch:
            merges.append((len(merges) + 1, r.lft, r.rgt, int(r.cnt)))
            # chained in acceptance order: one fused projection per round
            col = F.replace(
                col, F.lit(f"({r.lft})({r.rgt})"), F.lit(f"({r.lft}{r.rgt})")
            )
        sym = sym.select(col.alias("s"), "n")
        chained += 1
        if chained >= _CHECKPOINT_EVERY_ROUNDS:
            sym = sym.localCheckpoint(eager=True)
            chained = 0
    if stats is not None:
        stats["rounds"] = rounds
    return merges


def merges_df(spark: SparkSession, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(
        merges, "step int, lft string, rgt string, cnt long"
    )


def encode_words(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    *,
    word_col: str = "word",
    out_col: str = "pieces",
) -> DataFrame:
    """Append ``out_col``: the word's BPE pieces after applying the
    merge list in training order. The whole merge chain is ONE nested
    codegen projection (n_merges literal replaces) — apply it to a
    distinct-word table and broadcast-join pieces back to the corpus
    rather than re-encoding every occurrence."""
    s = _to_symbols(F.lower(F.col(word_col)))
    for _step, lft, rgt, _cnt in merges:
        s = F.replace(s, F.lit(f"({lft})({rgt})"), F.lit(f"({lft}{rgt})"))
    return df.withColumn(out_col, F.regexp_extract_all(s, F.lit(PAIR_RE), 1))


def byte_pieces(col: F.Column) -> F.Column:
    """SentencePiece-style byte tokens for a string: the UTF-8 bytes of
    the value as ``<0xXX>`` pieces, in order — ``é`` → ``[<0xC3>,
    <0xA9>]``. Pure native exprs (encode → hex → 2-char chunks), so the
    fallback path replays in any SQL engine with hex()."""
    hx = F.upper(F.hex(F.encode(col, "UTF-8")))
    return F.transform(
        F.regexp_extract_all(hx, F.lit("(..)"), 1),
        lambda h: F.concat(F.lit("<0x"), h, F.lit(">")),
    )


def apply_byte_fallback(
    df: DataFrame,
    vocab: DataFrame,
    *,
    pieces_col: str = "pieces",
    piece_col: str = "piece",
    key_cols: tuple[str, ...] = ("word",),
) -> DataFrame:
    """Decompose every piece NOT present in ``vocab`` into ``<0xXX>``
    byte tokens (SentencePiece byte fallback), preserving piece order —
    unseen characters degrade to bytes instead of becoming downstream
    UNK drops. Runs on the distinct-word table: posexplode → left join
    the vocab (equi-join on the piece string, vocab-bounded) → regroup
    by position. Rows whose ``pieces_col`` is NULL (e.g. a
    viterbi_encode exclusion) stay NULL — use viterbi_encode's own
    ``byte_fallback`` flag for whole-word fallback. Rows whose
    ``pieces_col`` is EMPTY stay empty: posexplode emits no rows for
    [], so the regrouped frame misses those keys and an unguarded left
    join would rewrite [] to NULL — conflating "empty segmentation"
    with the NULL exclusion sentinel."""
    keys = list(key_cols)
    ex = df.select(
        *keys, F.posexplode(pieces_col).alias("_pos", "_piece")
    )
    known = vocab.select(
        F.col(piece_col).alias("_piece"), F.lit(True).alias("_known")
    ).distinct()
    frag = F.when(
        F.col("_known"), F.array(F.col("_piece"))
    ).otherwise(byte_pieces(F.col("_piece")))
    out = (
        ex.join(known, on="_piece", how="left")
        .withColumn("_frag", frag)
        .groupBy(*keys)
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_pos", "_frag"))),
                    lambda s: s["_frag"],
                )
            ).alias(pieces_col)
        )
    )
    had = df.withColumn("_had", F.col(pieces_col).isNotNull())
    return (
        had.drop(pieces_col)
        .join(out, on=keys, how="left")
        .withColumn(
            pieces_col,
            F.coalesce(
                F.col(pieces_col),
                F.when(F.col("_had"), F.array().cast("array<string>")),
            ),
        )
        .drop("_had")
    )


def _symbol_counts(sym: DataFrame) -> DataFrame:
    """(t, cnt): corpus-weighted count of each CURRENT symbol in the
    delimited symbol table — the unigram marginals WordPiece's
    likelihood score needs (one explode + hash aggregate, vocab-bounded
    output)."""
    toks = F.regexp_extract_all(F.col("s"), F.lit(PAIR_RE), 1)
    return (
        sym.select(F.explode(toks).alias("t"), "n")
        .groupBy("t")
        .agg(F.sum("n").alias("cnt"))
    )


def train_wordpiece(
    docs: DataFrame,
    *,
    n_merges: int,
    text_col: str = "text",
    stats: dict | None = None,
) -> list[tuple[int, str, str, int, float]]:
    """WordPiece merge training (Schuster & Nakajima 2012; the BERT
    tokenizer — public): identical mechanics to BPE but each round
    merges the pair maximizing the LIKELIHOOD score
    count(l,r) / (count(l)·count(r)) instead of the raw pair count —
    preferring pairs that co-occur beyond what their unigram
    frequencies predict. Returns [(step, left, right, pair_count,
    score), ...]; encode by replaying the merges with
    :func:`encode_words` (drop the score element).

    Scale/determinism shape shared with :func:`train_bpe`: every round
    runs on the vocab-bounded symbol table (pair counts + symbol
    marginals, two hash aggregates), never the corpus. The score is ONE
    double division of exact longs — cnt/(cl·cr) with each operand cast
    to double — bit-identical in any IEEE engine, so the argmax
    (score desc, lft asc, rgt asc) replays in SQL with no rounding
    anywhere in the selection path. Sequential argmax only (the BPE
    dominance-batching proof does not transfer: a merge changes the
    unigram marginals of EVERY pair sharing a symbol, so there is no
    cheap cross-round bound — ``stats`` still records rounds for
    parity)."""
    sym = (
        _word_freq(docs, text_col=text_col)
        .select(_to_symbols(F.col("word")).alias("s"), "n")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int, float]] = []
    rounds = 0
    chained = 0  # see train_bpe: checkpoint every N projection rounds
    while len(merges) < n_merges:
        pc = _pair_counts(sym)
        sc = _symbol_counts(sym)
        scored = (
            pc.join(
                F.broadcast(sc.select(F.col("t").alias("lft"), F.col("cnt").alias("_cl"))),
                on="lft",
            )
            .join(
                F.broadcast(sc.select(F.col("t").alias("rgt"), F.col("cnt").alias("_cr"))),
                on="rgt",
            )
            .select(
                "lft", "rgt", "cnt",
                (
                    F.col("cnt").cast("double")
                    / (F.col("_cl").cast("double") * F.col("_cr").cast("double"))
                ).alias("score"),
            )
        )
        rows = (
            scored.orderBy(F.desc("score"), F.asc("lft"), F.asc("rgt"))
            .limit(1)
            .collect()
        )
        rounds += 1
        if not rows:
            break
        r = rows[0]
        merges.append(
            (len(merges) + 1, r.lft, r.rgt, int(r.cnt), float(r.score))
        )
        sym = sym.select(
            F.replace(
                F.col("s"),
                F.lit(f"({r.lft})({r.rgt})"),
                F.lit(f"({r.lft}{r.rgt})"),
            ).alias("s"),
            "n",
        )
        chained += 1
        if chained >= _CHECKPOINT_EVERY_ROUNDS:
            sym = sym.localCheckpoint(eager=True)
            chained = 0
    if stats is not None:
        stats["rounds"] = rounds
    return merges
