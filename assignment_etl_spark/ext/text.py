"""Text-analysis operators for an LLM-data pipeline, all JVM-side.

Every operator here is pure ``pyspark.sql.functions`` — regex + arithmetic
inside whole-stage codegen, no Python in the hot path — so a 100 TB
documents table is one scan with these as narrow projections.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length/punctuation/stopword ratios), language-ID (stopword-hit n-gram
heuristic), document fingerprinting (rolling hash over normalized text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish pre-tokenizer: words-with-leading-space, numbers, punctuation
# runs — the GPT-2 pre-tokenizer shape, expressed as one regex for
# regexp_count (JVM, vectorized).
BPE_ISH = r"[A-Za-zÀ-ÿ]+|[0-9]{1,3}|[^\sA-Za-zÀ-ÿ0-9]+"

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "que", "une", "dans"],
    "es": ["el", "los", "las", "es", "que", "una", "por", "con"],
}


def whitespace_token_count(col: Column) -> Column:
    """Tokens by whitespace split; empty/NULL-safe."""
    t = F.trim(col)
    return F.when(t.isNull() | (t == ""), F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Approximate BPE token count via the pre-tokenizer regex."""
    return F.coalesce(F.regexp_count(col, F.lit(BPE_ISH)), F.lit(0))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    return F.when(n > 0, F.regexp_count(col, F.lit(r"[^\w\s]")) / n).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    words = LANG_MARKERS[lang]
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    tokens = whitespace_token_count(col)
    return F.when(tokens > 0, F.regexp_count(col, F.lit(pat)) / tokens).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length sweet-spot, moderate
    punctuation, nonzero stopword share, low repetition."""
    n = F.length(col).cast("double")
    len_score = F.least(n / 500.0, F.lit(1.0)) * F.when(n > 20000, 0.5).otherwise(1.0)
    punct = punct_ratio(col)
    punct_score = F.when(punct > 0.3, 0.3).otherwise(1.0)
    stop_score = F.when(stopword_ratio(col) > 0.05, 1.0).otherwise(0.6)
    return F.round(len_score * punct_score * stop_score, 6)


def lang_scores(col: Column) -> Column:
    """Map of language → stopword hits (the n-gram heuristic's evidence)."""
    pairs = []
    for lang, words in LANG_MARKERS.items():
        pat = r"(?i)\b(" + "|".join(words) + r")\b"
        pairs.append(F.struct(F.lit(lang).alias("lang"), F.regexp_count(col, F.lit(pat)).alias("hits")))
    return F.array(*pairs)


def detect_language(col: Column) -> Column:
    """argmax of lang_scores; 'und' when no marker hits at all."""
    scores = lang_scores(col)
    best = F.array_max(scores.getField("hits"))
    pick = F.filter(scores, lambda s: s.getField("hits") == best)
    return F.when(best > 0, F.element_at(pick, 1).getField("lang")).otherwise(
        F.lit("und")
    )


def fingerprint(col: Column, *, normalize: bool = True) -> Column:
    """64-bit document fingerprint: xxhash64 over whitespace/case-normalized
    text — the rolling-hash dedup key at scale (one long per doc)."""
    s = F.lower(F.regexp_replace(col, r"\s+", " ")) if normalize else col
    return F.xxhash64(F.trim(s))


def text_profile(df: DataFrame, column: str = "text") -> DataFrame:
    """One-pass text-statistics projection over a documents table."""
    c = F.col(column)
    return df.select(
        "*",
        F.length(c).alias("n_chars_computed"),
        whitespace_token_count(c).alias("n_tokens_ws"),
        bpe_ish_token_count(c).alias("n_tokens_bpe"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio_en"),
        quality_score(c).alias("quality_score"),
        detect_language(c).alias("lang_detected"),
        fingerprint(c).alias("fingerprint"),
    )
