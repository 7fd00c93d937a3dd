"""Vocabulary building and integer encoding — the tokenizer-adjacent step
of a training-data pipeline (build the word→id table from the corpus, then
encode every document as an id sequence for packing/sharding).

Spark-first shapes:
- ``build_vocab``: one hash aggregation over the exploded token stream,
  frequency filter, then a TWO-PHASE top-k rank assignment: first a
  per-partition ``row_number`` keeps at most ``max_size`` candidates per
  shuffle partition (the global top-``max_size`` is always a subset of
  the union of per-partition top-``max_size``), then the global
  ``row_number`` runs over the ≤ partitions×max_size survivors — never
  over the full distinct vocabulary, which at web scale can be hundreds
  of millions of tokens.
- ``encode_docs``: broadcast-join the bounded vocab onto the token
  stream, unknown→UNK_ID, and rebuild per-document order with
  ``array_sort(collect_list(struct(pos,id)))`` — no window over the
  corpus, one shuffle on doc_id.

Token id 0 is reserved for unknowns; real ids are dense from 1 in
(frequency desc, token asc) order, so two engines building the same vocab
agree exactly (ties broken lexically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from assignment_etl_spark.ext.lm import _tokens

UNK_ID = 0


def build_vocab(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
    max_size: int = 65536,
) -> DataFrame:
    """(token, token_id, n) with dense ids 1..max_size by (n desc, token)."""
    counts = (
        _tokens(docs, id_col=id_col, text_col=text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition
    # top-max_size heaps, merged once — the global window never sees
    # more than max_size rows (the invindex/lexdiv bounded-rank plan).
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(max_size)
    return top.withColumn(
        "token_id",
        # ≤ max_size rows after the limit above
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token"))),
    ).select("token", "token_id", "n")


def encode_docs(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, token_ids array<int>, n_tokens, n_unk) per document with ≥1
    token; order of ids follows token order in the text."""
    toks = _tokens(docs, id_col=id_col, text_col=text_col)
    tagged = toks.join(F.broadcast(vocab.select("token", "token_id")), on="token", how="left")
    tid = F.coalesce(F.col("token_id"), F.lit(UNK_ID))
    per_doc = tagged.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("pos"), tid.alias("tid")))),
            lambda s: s.tid,
        ).alias("token_ids"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((tid == UNK_ID).cast("long")).alias("n_unk"),
    )
    return per_doc
