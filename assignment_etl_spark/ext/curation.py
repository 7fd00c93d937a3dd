"""End-to-end corpus curation pipeline: quality filter → language
filter → exact dedup → split assignment, in ONE composed dataflow with
full per-document drop accounting.

This is the "RefinedWeb-lite" composition of the repo's individually
certified kernels (ext/text.quality_score, ext/text.detect_language,
ext/dedup's fingerprint keep-first, ext/text.hash_split): a real
curation run chains them in exactly this order, and what production
needs beyond the stages themselves is the AUDIT — every document
tagged with why it left the corpus (or which split it landed in), so
yield loss is attributable per stage.

Scale shape: the quality/language stages and the split are pure
projections fused into the scan (no shuffle); the only exchange is the
dedup window keyed on the 64-bit text fingerprint — and it runs over
the quality+language SURVIVORS only, so upstream filters shrink the
shuffle, not just the output. One pass, one shuffle, statuses for all.

Reference parity note: the reference pipeline (etl.py) is the same
shape at table scale — clean, validate, dedup, load, with per-row audit
logging (SURVEY §2.9); this is that architecture re-expressed for
corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from assignment_etl_spark.ext.text import (
    detect_language,
    fingerprint,
    hash_split,
    quality_score,
)


def curate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    split_weights: dict[str, int] | None = None,
) -> DataFrame:
    """Tag every document with its pipeline outcome: ``status`` is
    'unscored' | 'low_quality' | 'wrong_lang' | 'duplicate' | a split
    label. Filters apply in that order (a low-quality wrong-language doc
    reports 'low_quality'); dedup is keep-first-by-id among the docs
    that survived both filters. A NULL quality (NULL text) routes to
    'unscored' — an unknown-quality doc must never classify as a
    survivor by falling through every NULL-propagating drop branch.
    Returns (id, quality, lang_detected, status) — survivors are the
    rows whose status is a split label."""
    weights = split_weights or {"train": 90, "val": 5, "test": 5}
    scored = docs.select(
        F.col(id_col),
        quality_score(F.col(text_col)).alias("quality"),
        detect_language(F.col(text_col)).alias("lang_detected"),
        fingerprint(F.col(text_col)).alias("_fp"),
    )
    survivor = (F.col("quality") >= min_quality) & F.col(
        "lang_detected"
    ).isin(list(langs))
    # keep-first rank among survivors only; non-survivors partition by
    # their own id (singleton groups — no NULL-key skew partition) and
    # never occupy a dedup slot
    w = Window.partitionBy(
        survivor, F.when(survivor, F.col("_fp")).otherwise(F.col(id_col))
    ).orderBy(F.col(id_col))
    ranked = scored.withColumn(
        "_rn", F.when(survivor, F.row_number().over(w))
    )
    with_split = hash_split(ranked, weights, id_col=id_col)
    return with_split.select(
        F.col(id_col),
        "quality",
        "lang_detected",
        F.when(F.col("quality").isNull(), F.lit("unscored"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(~F.col("lang_detected").isin(list(langs)), F.lit("wrong_lang"))
        .when(F.col("_rn") > 1, F.lit("duplicate"))
        .otherwise(F.col("split"))
        .alias("status"),
    )
