"""Cross-document exact-substring deduplication (rolling word windows).

The published recipe (Lee et al., "Deduplicating Training Data Makes
Language Models Better") removes every duplicated substring above a
length threshold, keeping one copy corpus-wide — it catches boilerplate,
licenses, and templated spans that document-level MinHash (ext/dedup)
misses because the containing documents are otherwise different. Their
implementation is a single-machine suffix array; the distributed
approximation here is fixed-width rolling word windows:

1. every ``window``-word span of every document becomes a (gram, doc,
   pos) row — ONE explode, linear in corpus tokens;
2. a row_number window partitioned by gram (ordered by (doc, pos) — a
   total order, so "first" is deterministic) marks the single kept
   occurrence; every rank>1 occurrence of any gram is a duplicate span;
3. duplicate spans expand to covered word indices, merged per document
   (distinct); surviving words rebuild the text in position order.

Windows overlap, so any duplicated run of >= ``window`` words is fully
covered in its non-first occurrences (consecutive duplicated windows
chain); runs shorter than ``window`` are invisible — that's the
precision/recall knob, exactly like the suffix-array length threshold.
The kept copy is the whole FIRST occurrence; its trailing overlap into
following text is preserved verbatim.

Scale: shuffles key on gram (step 2) and (doc, widx) (steps 3-4) — all
linear; no per-document state, no Python, no driver materialization.
The rebuild's per-document collect is bounded by document length, the
same bound every text operator here already carries.

Text is whitespace-normalized by the rebuild (single spaces), matching
ext/repetition's convention; fractions use the same denominators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_substrings(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
) -> DataFrame:
    """Remove non-first occurrences of every duplicated ``window``-word
    span. Returns one row per input document: id, ``text`` (rebuilt,
    whitespace-normalized), ``n_words_kept``, ``n_words_removed``,
    ``removed_char_frac`` (6 dp, chars measured on the normalized
    text)."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    words = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: F.length(w) > 0
    )
    staged = df.select(F.col(id_col), words.alias("_w"))
    word_rows = staged.select(
        F.col(id_col), F.posexplode(F.col("_w")).alias("_widx", "_word")
    )
    seq = F.sequence(F.lit(0), F.size(F.col("_w")) - window)
    gram_rows = staged.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(F.col("_w")) >= window,
                F.transform(
                    seq,
                    lambda i: F.struct(
                        i.cast("int").alias("pos"),
                        F.array_join(
                            F.slice(F.col("_w"), i + 1, window), " "
                        ).alias("gram"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,gram:string>>"))
        ).alias("_g"),
    ).select(id_col, "_g.pos", "_g.gram")

    w_gram = Window.partitionBy("gram").orderBy(F.col(id_col), F.col("pos"))
    dup_occ = (
        gram_rows.withColumn("_rn", F.row_number().over(w_gram))
        .filter(F.col("_rn") > 1)
        .select(id_col, "pos")
    )
    covered = dup_occ.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(window - 1))
        ).alias("_widx"),
    ).distinct()

    kept_rows = word_rows.join(covered, [id_col, "_widx"], "left_anti")
    rebuilt = kept_rows.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_widx"), F.col("_word")))
                ),
                lambda s: s["_word"],
            ),
            " ",
        ).alias("_text_kept"),
        F.count(F.lit(1)).alias("n_words_kept"),
        F.sum(F.length("_word")).alias("_kept_wchars"),
    )
    totals = staged.select(
        F.col(id_col),
        F.size(F.col("_w")).alias("_n_words"),
        F.length(F.array_join(F.col("_w"), " ")).alias("_total_chars"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("_text_kept"), F.lit("")).alias(text_col),
        F.coalesce(F.col("n_words_kept"), F.lit(0)).cast("int").alias(
            "n_words_kept"
        ),
        (F.col("_n_words") - F.coalesce(F.col("n_words_kept"), F.lit(0)))
        .cast("int")
        .alias("n_words_removed"),
        F.when(
            F.col("_total_chars") > 0,
            F.round(
                (
                    F.col("_total_chars")
                    - F.coalesce(
                        F.col("_kept_wchars")
                        + F.greatest(
                            F.col("n_words_kept") - 1, F.lit(0)
                        ),
                        F.lit(0),
                    )
                ).cast("double")
                / F.col("_total_chars"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("removed_char_frac"),
    )


def sql_dedup_substrings(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
) -> str:
    """DuckDB replica of :func:`dedup_substrings` — same stages, same
    deterministic first-occurrence rule, integer char math with one IEEE
    division for the fraction."""
    return f"""
WITH words AS (
  SELECT {id_col},
         list_filter(string_split_regex(trim({text_col}), '\\s+'),
                     x -> length(x) > 0) AS w
  FROM {table}),
word_rows AS (
  SELECT {id_col}, CAST(t.i - 1 AS INT) AS widx, w[t.i] AS word
  FROM words, unnest(range(1, len(w) + 1)) t(i)),
grams AS (
  SELECT {id_col}, CAST(i - 1 AS INT) AS pos,
         array_to_string(w[i : i + {window} - 1], ' ') AS gram
  FROM words, unnest(range(1, greatest(len(w) - {window} + 2, 1))) u(i)),
dup_occ AS (
  SELECT {id_col}, pos FROM (
    SELECT {id_col}, pos,
           row_number() OVER (PARTITION BY gram
                              ORDER BY {id_col}, pos) AS rn
    FROM grams)
  WHERE rn > 1),
covered AS (
  SELECT DISTINCT {id_col}, CAST(pos + t.k AS INT) AS widx
  FROM dup_occ, unnest(range(0, {window})) t(k)),
kept AS (
  SELECT wr.* FROM word_rows wr
  ANTI JOIN covered c ON wr.{id_col} = c.{id_col} AND wr.widx = c.widx),
rebuilt AS (
  SELECT {id_col},
         array_to_string(list(word ORDER BY widx), ' ') AS text_kept,
         count(*) AS n_words_kept,
         sum(length(word)) AS kept_wchars
  FROM kept GROUP BY 1),
tot AS (
  SELECT {id_col}, len(w) AS n_words,
         length(array_to_string(w, ' ')) AS total_chars
  FROM words)
SELECT tot.{id_col} AS {id_col},
       coalesce(text_kept, '') AS {text_col},
       CAST(coalesce(n_words_kept, 0) AS INT) AS n_words_kept,
       CAST(n_words - coalesce(n_words_kept, 0) AS INT) AS n_words_removed,
       CASE WHEN total_chars > 0 THEN
         round(CAST(total_chars
                    - coalesce(kept_wchars
                               + greatest(n_words_kept - 1, 0), 0)
                    AS DOUBLE) / total_chars, 6)
       ELSE 0.0 END AS removed_char_frac
FROM tot LEFT JOIN rebuilt USING ({id_col})
"""
