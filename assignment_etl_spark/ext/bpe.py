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


def train_bpe(
    docs: DataFrame,
    *,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` merges from the corpus; returns
    [(step, left, right, pair_count), ...] in training order. Stops early
    if no adjacent pair remains."""
    sym = (
        _word_freq(docs, text_col=text_col)
        .select(_to_symbols(F.col("word")).alias("s"), "n")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (
            _pair_counts(sym)
            .orderBy(F.desc("cnt"), F.asc("lft"), F.asc("rgt"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        lft, rgt, cnt = best[0].lft, best[0].rgt, int(best[0].cnt)
        merges.append((step, lft, rgt, cnt))
        sym = sym.select(
            F.replace(
                F.col("s"), F.lit(f"({lft})({rgt})"), F.lit(f"({lft}{rgt})")
            ).alias("s"),
            "n",
        ).localCheckpoint(eager=True)
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
