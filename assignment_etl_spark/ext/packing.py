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
