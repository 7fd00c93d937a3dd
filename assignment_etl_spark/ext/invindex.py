"""Inverted index + conjunctive keyword search over a document corpus.

The index is a plain DataFrame — (term, postings[], df) — built with one
explode + one groupBy on the term: the shuffle moves (term, doc_id)
pairs, never document text. Posting lists are the classic IR skew
hazard: a stopword's list is O(corpus), so ``max_df`` pruning (drop
terms present in more than a fraction of documents — they carry no
selectivity anyway) bounds every list; ``min_df`` drops hapax noise.
Store the pruned index partitioned by term prefix and a 100 TB corpus
serves lookups from a broadcast-sized slice per query.

``conjunctive_search`` resolves an AND-of-terms query from the index
alone: filter to the |query| term rows, explode their postings, and keep
doc_ids hit by every term — cost is O(sum of the query's posting lists),
independent of corpus size. ``scan_search`` is the index-free
counterpart (one full-text pass) used to verify the index path.

Reference parity note: the reference repo's text search is a pandas
``str.contains`` filter (analytics layer); this module is the scalable
retrieval shape built beyond reference scope, feeding the same
training-data curation layer as ext/tfidf.py (shared tokenizer family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def tokenize(col: Column | str) -> Column:
    """Lowercase whitespace tokens, empties dropped — matches the
    corpus's whitespace-token format and DuckDB's
    string_split_regex(lower(text), '\\s+') exactly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT), lambda t: F.length(t) > 0)


def build_inverted_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """(term, postings: sorted doc_id array, df) — one row per distinct
    term. ``max_df`` prunes stopword-scale lists (the skew bound);
    ``min_df`` prunes hapax noise. df == size(postings) by construction."""
    pairs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokenize(text_col))).alias("term"),
    )
    idx = (
        pairs.groupBy("term")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("postings"))
        .withColumn("df", F.size("postings"))
    )
    if min_df > 1:
        idx = idx.filter(F.col("df") >= min_df)
    if max_df is not None:
        idx = idx.filter(F.col("df") <= max_df)
    return idx


def conjunctive_search(index: DataFrame, terms: list[str]) -> DataFrame:
    """doc_ids containing ALL query terms, from the index alone: |terms|
    index rows → explode postings → keep docs hit by every term. Terms
    pruned out of the index (or never indexed) match nothing — prune with
    ``max_df`` only above your query vocabulary. Returns (doc_id)."""
    if not terms:
        raise ValueError("conjunctive_search needs at least one term")
    uniq = sorted(set(terms))
    return (
        index.filter(F.col("term").isin(uniq))
        .select(F.explode("postings").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_nt"))
        .filter(F.col("_nt") == len(uniq))
        .select("doc_id")
    )


def scan_search(
    docs: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Index-free AND-of-terms scan (one pass over the text) — the
    verification twin of conjunctive_search; returns (doc_id)."""
    if not terms:
        raise ValueError("scan_search needs at least one term")
    toks = F.array_distinct(tokenize(text_col))
    cond = F.lit(True)
    for t in sorted(set(terms)):
        cond = cond & F.array_contains(toks, t.lower())
    return docs.filter(cond).select(F.col(id_col).alias("doc_id"))
