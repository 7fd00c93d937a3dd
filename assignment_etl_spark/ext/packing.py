"""Fixed-budget sequence packing: cut the corpus token stream into
training sequences.

The operator every LLM training pipeline runs last: concatenate the
corpus (documents in a deterministic order) into one virtual token
stream and cut it every ``budget`` tokens, producing the doc↔sequence
mapping the data loader needs. GPT-style chunking, not bin packing:
documents straddle sequence boundaries (they are split, not dropped or
shuffled), so every sequence except the last is EXACTLY ``budget``
tokens — zero padding waste by construction.

Spark shape: one projection counts tokens per document, one
range-exchange cumulative sum (ops/ids.global_cumsum — never a
single-partition window) places every document at its exclusive start
offset in the stream, and the per-sequence manifest is a bounded
explode (a document spanning k sequences emits k rows; total rows =
total_tokens/budget + n_docs) followed by a hash aggregate. All
arithmetic is exact integers — offsets, interval overlaps, sequence
ids — so a SQL oracle replays the whole layout bit-for-bit.

Reference parity note: the reference repo has no training-data surface;
this closes the curation pipeline (dedup → filter → tokenize → PACK).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.ops.ids import global_cumsum


def _token_count(text_col: str) -> F.Column:
    """Whitespace token count, identical to the ext/lm.py / ext/bpe.py
    tokenization (split on runs of whitespace, empties dropped)."""
    return F.size(
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0
        )
    )


def pack_sequences(
    docs: DataFrame,
    *,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-document layout in the packed stream: one row per document
    with (id, n_tokens, tok_start, seq_first, seq_last) — tok_start the
    document's exclusive offset in the corpus token stream (documents
    concatenated in ascending ``id_col`` order; ids must be unique),
    seq_first/seq_last the first/last ``budget``-token sequence the
    document touches (floor(start/budget) .. floor((end−1)/budget)).
    Zero-token documents are excluded (they occupy no stream position).
    Pass ``token_count_col`` to reuse precomputed counts (e.g. BPE piece
    counts) instead of the whitespace default."""
    if budget < 1:
        raise ValueError(f"need budget >= 1, got {budget}")
    n_tok = (
        F.col(token_count_col).cast("long")
        if token_count_col
        else _token_count(text_col).cast("long")
    )
    t = (
        docs.select(F.col(id_col).alias("id"), n_tok.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    cum = global_cumsum(
        t,
        [F.asc("id")],
        "n_tokens",
        out_col="_cum",
        num_partitions=num_partitions,
    )
    start = F.col("_cum") - F.col("n_tokens")
    return cum.select(
        F.col("id").alias(id_col),
        "n_tokens",
        start.alias("tok_start"),
        F.floor(start / F.lit(budget)).cast("long").alias("seq_first"),
        F.floor((F.col("_cum") - 1) / F.lit(budget))
        .cast("long")
        .alias("seq_last"),
    )


def sequence_manifest(packed: DataFrame, *, budget: int) -> DataFrame:
    """Per-sequence manifest from :func:`pack_sequences` output:
    (seq_id, n_docs, n_tokens) — how many documents contribute to each
    sequence and how many of its tokens are filled (= budget everywhere
    except the final sequence). n_tokens is the exact interval overlap
    Σ_docs [min(end, (s+1)·budget) − max(start, s·budget)], all integer
    arithmetic. The explode is bounded by total_tokens/budget + n_docs
    rows; the aggregate keys on seq_id."""
    if budget < 1:
        raise ValueError(f"need budget >= 1, got {budget}")
    spans = packed.select(
        "tok_start",
        "n_tokens",
        F.explode(F.sequence(F.col("seq_first"), F.col("seq_last"))).alias(
            "seq_id"
        ),
    )
    end = F.col("tok_start") + F.col("n_tokens")
    lo = F.greatest(F.col("tok_start"), F.col("seq_id") * F.lit(budget))
    hi = F.least(end, (F.col("seq_id") + 1) * F.lit(budget))
    return (
        spans.select("seq_id", (hi - lo).alias("_ov"))
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_ov").alias("n_tokens"),
        )
    )
