"""Sequence packing: group documents into token-budget bins for training.

A training pipeline turns a deduplicated corpus into fixed-length
sequences; the packing step decides which documents share a sequence.
Random packing wastes budget; greedy packing is inherently sequential.
This module gives the two scalable points on that trade-off:

- :func:`pack_next_fit` — deterministic next-fit over a portable-hash
  order, expressed as ONE cumulative-sum window: bin(d) = floor(
  exclusive-prefix-sum / budget). Bins can overshoot the budget by at
  most one document's tokens (the classic next-fit bound) — acceptable
  when the trainer truncates/pads — and the whole operator is a single
  sort-based window, no Python, oracle-replayable.
- :func:`pack_greedy` — strict-budget first-fit-style packing with NO
  overshoot, run independently inside hash-partitioned pack groups via
  ``applyInPandas``. Greedy packing of the WHOLE corpus is a sequential
  scan no engine can parallelize; bounding it to per-group state is what
  makes it distributable — the standard shard-then-pack design. Documents
  longer than the budget get a solo (marked) bin.

Both are deterministic functions of (id, tokens): same bins on every run,
any partitioning — reshuffle-stable like everything in ext/sampling.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from assignment_etl_spark.ext.sampling import portable_hash01, require_integral_id


def pack_next_fit(
    df: DataFrame,
    budget: int,
    *,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_groups: int = 1,
) -> DataFrame:
    """Assign (pack_group, bin, bin_pos) by exclusive-prefix-sum division.

    With ``n_groups`` > 1 the corpus is hash-split first and each group
    packs independently — at 100 TB a single global cumulative sum would
    serialize the window on one partition chain, so the group count is the
    parallelism knob (window state per group is one running sum). Bins are
    namespaced (pack_group, bin).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    require_integral_id(df, id_col, "pack_next_fit")
    grp = (
        (portable_hash01(F.col(id_col)) * n_groups).cast("int") % n_groups
        if n_groups > 1
        else F.lit(0)
    )
    base = df.withColumn("pack_group", grp)
    w = (
        Window.partitionBy("pack_group")
        .orderBy(portable_hash01(F.col(id_col), salt=1), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    excl = cum - F.col(token_col)
    out = base.withColumn("bin", F.floor(excl / F.lit(budget)).cast("long"))
    wp = Window.partitionBy("pack_group", "bin").orderBy(
        portable_hash01(F.col(id_col), salt=1), F.col(id_col)
    )
    return out.withColumn("bin_pos", F.row_number().over(wp) - 1)


def pack_greedy(
    df: DataFrame,
    budget: int,
    *,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_groups: int = 64,
) -> DataFrame:
    """Strict-budget greedy packing inside hash groups (no bin exceeds
    ``budget`` unless a single document does, flagged ``oversize``).

    Per group, documents are visited in portable-hash order and appended
    to the current bin while they fit (next-fit with a hard boundary).
    State is one integer per group — the ``applyInPandas`` crossing is
    Arrow-batched and the per-group work is linear. Output adds
    (pack_group, bin, bin_pos, oversize).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    require_integral_id(df, id_col, "pack_greedy")
    base = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias(token_col),
        ((portable_hash01(F.col(id_col)) * n_groups).cast("int") % n_groups).alias(
            "pack_group"
        ),
        portable_hash01(F.col(id_col), salt=1).alias("_ord"),
    )
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, {token_col} long, pack_group int, "
        "bin long, bin_pos int, oversize boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ord", id_col], kind="mergesort")
        bins, pos, oversize = [], [], []
        cur_bin, cur_fill, cur_pos = 0, 0, 0
        for t in pdf[token_col]:
            big = t > budget
            if cur_fill > 0 and (cur_fill + t > budget or big):
                cur_bin, cur_fill, cur_pos = cur_bin + 1, 0, 0
            bins.append(cur_bin)
            pos.append(cur_pos)
            oversize.append(bool(big))
            cur_fill += t
            cur_pos += 1
            if big:  # oversize doc occupies its bin alone
                cur_bin, cur_fill, cur_pos = cur_bin + 1, 0, 0
        out = pdf[[id_col, token_col, "pack_group"]].copy()
        out["bin"] = bins
        out["bin_pos"] = pos
        out["oversize"] = oversize
        return out

    return base.groupBy("pack_group").applyInPandas(pack, schema=schema)


def bin_stats(packed: DataFrame, *, token_col: str = "n_tokens") -> DataFrame:
    """(pack_group, bin) → n_docs, n_tokens: the fill-efficiency report
    (sum(n_tokens)/ (bins × budget) is the packing efficiency)."""
    return packed.groupBy("pack_group", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).alias("n_tokens"),
    )


# ------------------------------------------------- stream chunking (r7)
# The third packing mode: GPT-style STREAM CHUNKING — concatenate the
# corpus into one virtual token stream (ascending id) and cut every
# `budget` tokens. Documents split at boundaries, every sequence except
# the last is EXACTLY budget tokens (zero padding waste) — vs the bin
# modes above, which keep documents whole and trade waste for atomicity.
# Offsets ride ONE range-exchange cumsum (ops/ids.global_cumsum); the
# per-sequence manifest is a bounded explode + hash aggregate; all
# arithmetic exact integers, oracle-replayable.

from assignment_etl_spark.ops.ids import global_cumsum  # noqa: E402


def _token_count(text_col: str) -> F.Column:
    """Whitespace token count, identical to the ext/lm.py / ext/bpe.py
    tokenization (split on runs of whitespace, empties dropped)."""
    return F.size(
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0
        )
    )


def pack_stream(
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
    """Per-sequence manifest from :func:`pack_stream` output:
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
