"""Gopher-style repetition signals: top-n-gram and duplicate-n-gram
character fractions.

Completes the published Gopher/Dolma repetition-filter family that
ext/text.gopher_flags starts (its dup_line_frac is the line-level signal;
these are the word-n-gram signals):

- ``top_{n}gram_char_frac`` (n in 2..4): fraction of the document's
  characters contained in occurrences of the heaviest n-gram, counted
  per occurrence (the published form — overlapping occurrences are NOT
  de-overlapped for the top gram). Gopher keys "heaviest" on occurrence
  count; ties between equally-frequent grams are broken here by total
  characters (count x gram length), which is deterministic under any
  partitioning — a count-keyed argmax with arbitrary tie-break is not.
- ``dup_{n}gram_char_frac`` (n in 5..10): fraction of characters covered
  by at least one occurrence of a repeated n-gram — each character
  counted ONCE (the published implementations compute the union of
  duplicated-gram character spans; summing occurrence lengths instead
  overshoots past 1.0 on heavily repetitive text because overlapping
  grams share characters).

Character positions are measured on the whitespace-normalized text
(words re-joined with single spaces), so runs of whitespace can't
deflate the fractions; a space between two covered words is covered
exactly when both fall inside one merged duplicated span.

Distribution strategy: ONE explode pass emits (doc, n, pos, gram) rows
for every requested n (an array-of-structs built per-row with native
HOFs, so the text is scanned once, not once per n), then a single
count-aggregate shuffled on (doc, n, gram). The span union is
gaps-and-islands: duplicated occurrences -> covered word indices
(distinct) -> island ids via a lag window per (doc, n) -> per-island
chars = word lengths + internal spaces. Every stage is keyed by doc (or
doc,n) — work and shuffle volume stay linear in corpus tokens x len(ns),
no per-document state, no Python. The alternative (frequency-counting
inside an aggregate HOF per row) would be O(words x grams) quadratic per
document and die on long documents.

Thresholds (``repetitive`` flag) are the published Gopher bounds: top
2/3/4-gram fractions <= 0.20/0.18/0.16, dup 5..10-gram fractions <=
0.15/0.14/0.13/0.12/0.11/0.10. The flag only tests the n's actually
computed, so a subset run never silently passes a threshold it didn't
measure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOP_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _words(col: Column) -> Column:
    return F.filter(F.split(F.trim(col), r"\s+"), lambda w: F.length(w) > 0)


def _grams(words: Column, n: int) -> Column:
    """array<struct<n,pos,gram>> of the word n-grams (space-joined).
    Guarded: sequence(0, size-n) would generate a DESCENDING sequence
    when size < n, silently emitting nonsense grams."""
    seq = F.sequence(F.lit(0), F.size(words) - n)
    grams = F.transform(
        seq,
        lambda i: F.struct(
            F.lit(n).alias("n"),
            i.cast("int").alias("pos"),
            F.array_join(F.slice(words, i + 1, n), " ").alias("gram"),
        ),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<struct<n:int,pos:int,gram:string>>")
    )


def repetition_signals(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Per-document repetition fractions + ``repetitive`` flag.

    Returns ``df``'s id column plus one ``top_{n}gram_char_frac`` per
    ``top_ns``, one ``dup_{n}gram_char_frac`` per ``dup_ns`` (all rounded
    to 6 places, 0.0 for documents shorter than n words), and
    ``repetitive``.
    """
    unknown = [n for n in top_ns if n not in TOP_THRESHOLDS] + [
        n for n in dup_ns if n not in DUP_THRESHOLDS
    ]
    if unknown:
        raise ValueError(f"no published Gopher threshold for n={unknown}")
    all_ns = sorted(set(top_ns) | set(dup_ns))

    staged = df.select(F.col(id_col), _words(F.col(text_col)).alias("_w"))
    totals = staged.select(
        F.col(id_col),
        F.length(F.array_join(F.col("_w"), " ")).alias("_total_chars"),
    )
    word_rows = staged.select(
        F.col(id_col), F.posexplode(F.col("_w")).alias("_widx", "_word")
    ).select(id_col, "_widx", F.length("_word").alias("_wlen"))

    gram_rows = staged.select(
        F.col(id_col),
        F.explode(
            F.flatten(F.array(*[_grams(F.col("_w"), n) for n in all_ns]))
        ).alias("_g"),
    ).select(id_col, "_g.n", "_g.pos", "_g.gram")

    counted = gram_rows.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    top_per_n = counted.groupBy(id_col, "n").agg(
        F.max((F.length("gram") * F.col("_cnt")).cast("long")).alias(
            "_top_chars"
        )
    )

    # ---- duplicated-span union (gaps and islands), for n in dup_ns ----
    dup_keys = counted.filter(
        (F.col("_cnt") > 1) & F.col("n").isin(*dup_ns)
    ).select(id_col, "n", "gram")
    dup_occ = gram_rows.join(dup_keys, [id_col, "n", "gram"], "left_semi")
    covered = (
        dup_occ.select(
            F.col(id_col),
            F.col("n"),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
            ).alias("_widx"),
        )
        .distinct()
    )
    w = Window.partitionBy(id_col, "n").orderBy("_widx")
    islands = covered.withColumn(
        "_island",
        F.sum(
            F.when(
                F.col("_widx") - F.lag("_widx", 1, -2).over(w) > 1, 1
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    dup_per_n = (
        islands.join(word_rows, [id_col, "_widx"])
        .groupBy(id_col, "n", "_island")
        .agg((F.sum("_wlen") + F.count(F.lit(1)) - 1).alias("_island_chars"))
        .groupBy(id_col, "n")
        .agg(F.sum("_island_chars").alias("_dup_chars"))
    )

    per_n = top_per_n.join(dup_per_n, [id_col, "n"], "left")
    # pivot on the small fixed n-set: values enumerated, so the pivot is a
    # single aggregation (no extra distinct pass to discover them)
    wide = (
        per_n.groupBy(id_col)
        .pivot("n", list(all_ns))
        .agg(
            F.first("_top_chars").alias("top"),
            F.first("_dup_chars").alias("dup"),
        )
    )

    out = totals.join(wide, id_col, "left")
    frac_cols, flag_terms = [], []

    def _frac(src: str) -> Column:
        return F.when(
            F.col("_total_chars") > 0,
            F.round(
                F.coalesce(F.col(src), F.lit(0)).cast("double")
                / F.col("_total_chars"),
                6,
            ),
        ).otherwise(F.lit(0.0))

    for n in top_ns:
        name = f"top_{n}gram_char_frac"
        frac_cols.append(_frac(f"{n}_top").alias(name))
        flag_terms.append((name, TOP_THRESHOLDS[n]))
    for n in dup_ns:
        name = f"dup_{n}gram_char_frac"
        frac_cols.append(_frac(f"{n}_dup").alias(name))
        flag_terms.append((name, DUP_THRESHOLDS[n]))

    out = out.select(id_col, *frac_cols)
    flag = F.lit(False)
    for col_name, bound in flag_terms:
        flag = flag | (F.col(col_name) > bound)
    return out.withColumn("repetitive", flag)


def sql_repetition_signals(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> str:
    """DuckDB replica of :func:`repetition_signals` for oracle checks.
    Same stages: one gram relation for all n, count, top aggregate,
    span-union islands for the dup branch, conditional-aggregate pivot.
    Integer char counts and one final IEEE division per fraction keep
    both engines bit-identical."""
    all_ns = sorted(set(top_ns) | set(dup_ns))
    ns_list = ", ".join(str(n) for n in all_ns)
    dup_list = ", ".join(str(n) for n in dup_ns)
    fracs, flags = [], []
    for n in top_ns:
        fracs.append(
            f"CASE WHEN total_chars > 0 THEN round(CAST(coalesce(max(CASE WHEN per_n.n = {n} THEN top_chars END), 0) AS DOUBLE) / total_chars, 6) ELSE 0.0 END AS top_{n}gram_char_frac"
        )
        flags.append(f"top_{n}gram_char_frac > {TOP_THRESHOLDS[n]}")
    for n in dup_ns:
        fracs.append(
            f"CASE WHEN total_chars > 0 THEN round(CAST(coalesce(max(CASE WHEN per_n.n = {n} THEN dup_chars END), 0) AS DOUBLE) / total_chars, 6) ELSE 0.0 END AS dup_{n}gram_char_frac"
        )
        flags.append(f"dup_{n}gram_char_frac > {DUP_THRESHOLDS[n]}")
    return f"""
WITH words AS (
  SELECT {id_col},
         list_filter(string_split_regex(trim({text_col}), '\\s+'),
                     x -> length(x) > 0) AS w
  FROM {table}),
word_rows AS (
  SELECT {id_col}, CAST(t.i - 1 AS INT) AS widx, length(w[t.i]) AS wlen
  FROM words, unnest(range(1, len(w) + 1)) t(i)),
grams AS (
  SELECT {id_col}, t.n, CAST(i - 1 AS INT) AS pos,
         array_to_string(w[i : i + t.n - 1], ' ') AS gram
  FROM words,
       (SELECT unnest([{ns_list}]) AS n) t,
       unnest(range(1, greatest(len(w) - t.n + 2, 1))) u(i)),
counted AS (
  SELECT {id_col}, n, gram, count(*) AS cnt FROM grams GROUP BY 1, 2, 3),
top_per_n AS (
  SELECT {id_col}, n, max(length(gram) * cnt) AS top_chars
  FROM counted GROUP BY 1, 2),
dup_occ AS (
  SELECT g.{id_col}, g.n, g.pos
  FROM grams g SEMI JOIN (SELECT {id_col}, n, gram FROM counted
                          WHERE cnt > 1 AND n IN ({dup_list})) d
    USING ({id_col}, n, gram)),
covered AS (
  SELECT DISTINCT {id_col}, n, CAST(pos + t.k AS INT) AS widx
  FROM dup_occ, unnest(range(0, 10)) t(k) WHERE t.k < n),
steps AS (
  SELECT {id_col}, n, widx,
         CASE WHEN widx - coalesce(lag(widx) OVER
                (PARTITION BY {id_col}, n ORDER BY widx), -2) > 1
              THEN 1 ELSE 0 END AS is_new
  FROM covered),
islands AS (
  SELECT {id_col}, n, widx,
         sum(is_new) OVER (PARTITION BY {id_col}, n ORDER BY widx
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM steps),
dup_per_n AS (
  SELECT {id_col}, n, CAST(sum(island_chars) AS BIGINT) AS dup_chars
  FROM (SELECT i.{id_col}, i.n, i.island,
               sum(wr.wlen) + count(*) - 1 AS island_chars
        FROM islands i JOIN word_rows wr USING ({id_col}, widx)
        GROUP BY 1, 2, 3)
  GROUP BY 1, 2),
per_n AS (
  SELECT t.{id_col}, t.n, t.top_chars, d.dup_chars
  FROM top_per_n t LEFT JOIN dup_per_n d USING ({id_col}, n)),
tot AS (
  SELECT {id_col}, length(array_to_string(w, ' ')) AS total_chars FROM words)
SELECT tot.{id_col} AS {id_col},
       {", ".join(fracs)},
       ({" OR ".join(flags)}) AS repetitive
FROM tot LEFT JOIN per_n ON tot.{id_col} = per_n.{id_col}
GROUP BY tot.{id_col}, total_chars
"""
