"""Vocabulary building and integer encoding — the tokenizer-adjacent step
of a training-data pipeline (build the word→id table from the corpus, then
encode every document as an id sequence for packing/sharding).

Spark-first shapes:
- ``build_vocab``: one hash aggregation over the exploded token stream,
  frequency filter, then rank assignment. Ranking is a global
  ``row_number`` — deliberately run on the *aggregated* vocabulary, which
  is bounded by ``max_size`` (contract, like the top-k operators), never
  on the corpus; the single-partition window is over ≤max_size rows.
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
    ranked = counts.withColumn(
        "token_id",
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token"))),
    )
    return ranked.filter(F.col("token_id") <= max_size).select(
        "token", "token_id", "n"
    )


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
