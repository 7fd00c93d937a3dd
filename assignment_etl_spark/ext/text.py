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
# Dict order is the tie-break priority (first language with the max hit
# count wins) — extend at the END to keep existing classifications stable.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "que", "une", "dans"],
    "es": ["el", "los", "las", "es", "que", "una", "por", "con"],
    "it": ["il", "di", "che", "non", "per", "sono", "della", "gli"],
    # ASCII-only markers: Java's (?i) folds ASCII only while RE2 folds
    # unicode, so a non-ASCII marker could match differently per engine.
    "pt": ["o", "de", "que", "uma", "para", "com", "mais", "os"],
    "nl": ["de", "het", "een", "van", "niet", "dat", "zijn", "voor"],
}

# Han-script detection for languages whitespace stopwords can't see:
# a handful of CJK ideographs is decisive evidence on its own.
CJK_PATTERN = r"[一-鿿]"
CJK_MIN_HITS = 4


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
    """argmax of lang_scores; Han-script check first (zh has no whitespace
    stopwords to count); 'und' when no evidence at all.

    The argmax is a single ``aggregate`` fold over the scores array with a
    strict ``>`` (first max wins — LANG_MARKERS order is the documented
    tie-break) seeded with ('und', 0), so every language's stopword regex
    is evaluated exactly ONCE per row. The previous
    filter(scores, hits == array_max(scores)) form inlined the whole
    7-regex scores array into the lambda PER ELEMENT (~70 regexp passes
    per row in the physical plan — guide §1.2/§4.1: the distributed plan
    was fine, the expression tree wasn't). Equivalence: strict > keeps the
    earliest max (== filter+element_at(1)); all-zero or all-NULL hits
    never beat the seed, so those rows stay 'und' exactly as before (NULL
    > 0 is NULL → otherwise-branch)."""
    best = F.aggregate(
        lang_scores(col),
        F.struct(F.lit("und").alias("lang"), F.lit(0).alias("hits")),
        lambda acc, s: F.when(s.getField("hits") > acc.getField("hits"), s).otherwise(acc),
    )
    return (
        F.when(F.regexp_count(col, F.lit(CJK_PATTERN)) >= CJK_MIN_HITS, F.lit("zh"))
        .otherwise(best.getField("lang"))
    )


def fingerprint(col: Column, *, normalize: bool = True) -> Column:
    """64-bit document fingerprint: xxhash64 over whitespace/case-normalized
    text — the rolling-hash dedup key at scale (one long per doc)."""
    s = F.lower(F.regexp_replace(col, r"\s+", " ")) if normalize else col
    return F.xxhash64(F.trim(s))


def gopher_flags(
    col: Column, *, line_sep: str = r"\n"
) -> Column:
    """Gopher/Dolma-style document-quality flags (public corpus-curation
    heuristics: word count bounds, mean word length, symbol-to-word ratio,
    bullet/ellipsis line shares, duplicate-line share) as ONE struct of
    native expressions — a single narrow projection over the corpus scan.

    Returns struct(n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, dup_line_frac, passes) where ``passes`` applies the
    published Gopher bounds (50 ≤ words ≤ 100k, 3 ≤ mean_word_len ≤ 10,
    symbol ratio < 0.1, bullets < 0.9, ellipses < 0.3, dup lines < 0.3).
    """
    t = F.trim(col)
    words = F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))
    symbols = F.regexp_count(t, F.lit(r"#|\.\.\.")).cast("double")
    symbol_ratio = F.when(n_words > 0, symbols / n_words).otherwise(F.lit(0.0))

    lines = F.filter(F.split(t, line_sep), lambda ln: F.length(F.trim(ln)) > 0)
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]")))
        .cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"\.\.\.$")))
        .cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(F.transform(lines, F.trim))))
        .cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))

    passes = (
        n_words.between(50, 100_000)
        & mean_wl.between(3.0, 10.0)
        & (symbol_ratio < 0.1)
        & (bullet_frac < 0.9)
        & (ellipsis_frac < 0.3)
        & (dup_line_frac < 0.3)
    )
    return F.struct(
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        passes.alias("passes"),
    )


# train/val/test split hashing: same PORTABLE_P family as ext.dedup so any
# engine reproduces the assignment (no Spark-only hash in a contract that
# downstream systems must re-derive).
from assignment_etl_spark.portable import (  # noqa: E402 — split-hash family
    ADD_B as _SPLIT_B,
    MULT_A as _SPLIT_A,
    PRIME_P as _SPLIT_P,
)


def split_bucket(id_col: Column, n_buckets: int = 100) -> Column:
    """Deterministic [0, n_buckets) bucket from a numeric id. The id is
    reduced mod P first so the multiply stays inside int64 for any id."""
    h = F.pmod(id_col.cast("long"), F.lit(_SPLIT_P))
    return F.pmod(h * _SPLIT_A + _SPLIT_B, F.lit(_SPLIT_P)) % n_buckets


def hash_split(
    df: DataFrame,
    weights: dict[str, int],
    *,
    id_col: str = "doc_id",
    out: str = "split",
) -> DataFrame:
    """Assign every row a stable train/val/test label by hashed id.

    ``weights`` maps label → integer percent (must sum to 100). The
    assignment is a pure projection (no shuffle, no sampling state): the
    same row lands in the same split on every run, any engine, any
    partitioning — the reproducibility contract a training pipeline needs.
    """
    if sum(weights.values()) != 100:
        raise ValueError("weights must sum to 100")
    from pyspark.sql import types as T  # noqa: PLC0415

    dtype = df.schema[id_col].dataType
    if not isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"hash_split needs an integral id column; {id_col} is {dtype}. "
            "For string ids, derive a numeric key first (e.g. xxhash64 — "
            "or the portable polynomial hash if a second engine must "
            "re-derive the split)."
        )
    bucket = split_bucket(F.col(id_col))
    expr = None
    lo = 0
    for label, w in weights.items():
        cond = bucket < lo + w
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        lo += w
    return df.withColumn(out, expr)


# PII patterns chosen for cross-engine regex parity (Java regex and RE2
# agree on these constructs — no backreferences, no lookaround).
# Unicode caveat, hash-certified by the r11 UTF-8 oracle (GATES_UTF8
# pii_scrub; semantics probed and documented in tools/utf8_oracle.py):
# Java's \d here is ASCII-only (Arabic-Indic ١٩٢ is NOT an IP), but
# Java's \b is UNICODE-aware — é or an Arabic letter glued to a digit
# run BLOCKS the boundary, and a non-spacing mark with a base character
# counts as word-internal. A CPython consumer replaying these patterns
# matches Java under neither default nor re.ASCII flags; see the
# oracle's hand-rolled scanners.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_counts(col: Column) -> Column:
    """struct of per-type PII match counts — the detection pass a curation
    pipeline runs before deciding to scrub or drop."""
    return F.struct(
        *[
            F.coalesce(F.regexp_count(col, F.lit(pat)), F.lit(0)).alias(name)
            for name, pat in PII_PATTERNS.items()
        ]
    )


def scrub_pii(col: Column, replacement: str = "[PII]") -> Column:
    """Redact every PII pattern (chained regexp_replace — one projection,
    no Python). Scrub order = PII_PATTERNS order; email first so addresses
    aren't partially eaten by the IP pattern's digit runs."""
    out = col
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, replacement)
    return out


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


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 500,
    overlap: int = 100,
) -> DataFrame:
    """Split documents into fixed-size character chunks with overlap — the
    retrieval/embedding prep step of a training-data pipeline (every chunk
    starts ``chunk_chars - overlap`` after the previous one; the final
    chunk may be short; empty docs produce no chunks).

    Pure expression plan: ``sequence`` generates the chunk start offsets
    from the document length, one ``explode``, ``substring`` slices — all
    codegen, no UDF, no shuffle (chunking is embarrassingly parallel; the
    downstream embed/encode step repartitions by payload if needed).
    Deterministic and engine-portable: chunk boundaries are pure integer
    arithmetic on the string length.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    length = F.length(F.col(text_col))
    # start offsets: 1, 1+stride, ... up to the last stride covering new
    # content; a doc shorter than chunk_chars gets exactly one chunk
    starts = F.sequence(
        F.lit(1),
        F.greatest(length - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    chunked = (
        docs.filter(length > 0)
        .select(
            F.col(id_col),
            F.col(text_col),
            F.posexplode(starts).alias("chunk_idx", "_start"),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            F.substring(F.col(text_col), F.col("_start"), chunk_chars).alias(
                "chunk_text"
            ),
        )
    )
    return chunked.withColumn("n_chars", F.length("chunk_text"))


def c4_line_filter(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_lines: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """C4 cleaning filters (Raffel et al. 2020, the 'c4' web-corpus
    pipeline), expressed as pure higher-order array functions — ZERO
    shuffle and zero explode; every document is cleaned inside one
    codegen projection, so at 100 TB this is a map-only stage pipelined
    into whatever shuffle follows.

    Line level — a line survives iff ALL of:
    - it ends in terminal punctuation (``.`` ``!`` ``?`` or ``"``);
    - it has at least ``min_words`` whitespace-separated words;
    - it does not contain ``javascript`` (case-insensitive).
    Page level — the whole document is dropped iff ANY of:
    - the raw text contains ``{`` (code) or ``lorem ipsum`` (placeholder);
    - fewer than ``min_lines`` lines survive the line filter.

    Returns (id, text, n_lines, n_kept, page_kept, drop_reason): ``text``
    is the reassembled kept-line document ('' when the page is dropped,
    mirroring dedup_lines' empty-doc contract); ``drop_reason`` is
    'brace' | 'lorem_ipsum' | 'too_few_lines' | NULL, first-match wins in
    that order. The reference has no corpus ops (SURVEY §2 north-star
    additions); policy source is public C4 (badwords filtering is the
    caller's extra predicate — lists are deployment-specific).
    """
    sep_pat = f"\\Q{sep}\\E"

    def line_ok(ln: Column) -> Column:
        t = F.trim(ln)
        return (
            t.rlike('[.!?"]$')
            & (F.size(F.split(t, "\\s+")) >= min_words)
            & ~F.lower(ln).contains("javascript")
        )

    # Stage the two heavy array expressions — split(text) and the
    # per-line regex filter — in their own projections. The final
    # projection references each several times (text/n_kept/page_kept/
    # drop_reason), and inlined they were re-evaluated PER REFERENCE:
    # the physical plan ran filter(split(text), line_ok) 5x and
    # split(text) 7x per row (r13, guide §1.2 — the distributed plan was
    # already map-only; the expression tree wasn't). CollapseProject
    # keeps the staging because non-cheap producer expressions consumed
    # more than once are never re-inlined, so each document is now split
    # once and line-filtered once. Downstream references (size,
    # array_join, when-branches) are O(1)/single-pass over the staged
    # arrays. Same expressions, same outputs — only the evaluation count
    # changes.
    staged = df.select(
        F.col(id_col),
        F.col(text_col),
        F.split(F.col(text_col), sep_pat).alias("_lines"),
    ).select(
        F.col(id_col),
        F.col(text_col),
        F.col("_lines"),
        F.filter(F.col("_lines"), line_ok).alias("_kept"),
    )
    has_brace = F.col(text_col).contains("{")
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    n_kept = F.size(F.col("_kept"))
    page_kept = ~has_brace & ~has_lorem & (n_kept >= min_lines)
    return staged.select(
        F.col(id_col),
        F.when(page_kept, F.array_join(F.col("_kept"), sep))
        .otherwise(F.lit(""))
        .alias(text_col),
        F.size(F.col("_lines")).alias("n_lines"),
        F.when(page_kept, n_kept).otherwise(F.lit(0)).alias("n_kept"),
        page_kept.alias("page_kept"),
        F.when(has_brace, F.lit("brace"))
        .when(has_lorem, F.lit("lorem_ipsum"))
        .when(n_kept < min_lines, F.lit("too_few_lines"))
        .alias("drop_reason"),
    )


def augment_word_dropout(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate: float = 0.1,
    salt: int = 0,
    out_col: str = "text_aug",
    pos_mult: int = 1_000_003,
) -> DataFrame:
    """Deterministic word-dropout augmentation: token ``j`` of document
    ``d`` is dropped iff ``hash01(d·pos_mult + j, salt) < rate`` — the
    replayable counterpart of random word dropout (EDA-style text
    augmentation). Determinism is the point: the same (doc, position)
    always makes the same decision, so augmented corpora are
    reproducible across runs, engines, and partitionings, and a salt
    change is a fresh augmentation epoch.

    Pure higher-order projection (split → indexed filter → rejoin):
    zero shuffle, no UDF. ``pos_mult`` must exceed the longest
    document's token count to keep (doc, pos) keys distinct.

    Returns the input plus (out_col, n_tokens, n_kept).
    """
    if not 0 <= rate < 1:
        raise ValueError("rate must be in [0, 1)")
    from assignment_etl_spark.ext.sampling import (
        portable_hash01,
        require_integral_id,
    )

    require_integral_id(df, id_col, "augment_word_dropout")
    doc = F.col(id_col)
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
    kept = F.filter(
        toks,
        lambda x, i: portable_hash01(doc * pos_mult + i, salt) >= F.lit(rate),
    )
    return (
        df.withColumn("_toks", toks)
        .withColumn("_kept", kept)
        .withColumn(out_col, F.array_join("_kept", " "))
        .withColumn("n_tokens", F.size("_toks"))
        .withColumn("n_kept", F.size("_kept"))
        .drop("_toks", "_kept")
    )


def span_corruption(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 3,
    rate: float = 0.15,
    salt: int = 0,
    sentinel: str = "<extra_id>",
    pos_mult: int = 1_000_003,
) -> DataFrame:
    """T5-style span corruption, deterministic: the token stream is cut
    into fixed ``span_len`` blocks and block ``b`` of document ``d`` is
    masked iff ``hash01(d·pos_mult + b, salt) < rate``. Masked blocks
    collapse to one ``sentinel`` occurrence in the input; the targets
    string carries sentinel-prefixed masked spans in order — the
    (inputs, targets) pair seq2seq denoising training consumes.

    Block-quantized selection replaces T5's sequential span sampling
    with an order-free rule: decisions are independent per block, so
    the operator is a pure higher-order projection (split → indexed
    transforms → rejoin), zero shuffle, reproducible across engines and
    partitionings (salt = corruption epoch, same contract as
    ``augment_word_dropout``).

    Returns input plus (inputs, targets, n_tokens, n_masked).
    """
    if not 0 <= rate < 1:
        raise ValueError("rate must be in [0, 1)")
    if span_len < 1:
        raise ValueError("span_len must be >= 1")
    from assignment_etl_spark.ext.sampling import (
        portable_hash01,
        require_integral_id,
    )

    require_integral_id(df, id_col, "span_corruption")
    doc = F.col(id_col)

    def masked(i: Column) -> Column:
        block = F.floor(i / span_len)
        return portable_hash01(doc * pos_mult + block, salt) < F.lit(rate)

    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
    out = df.withColumn("_toks", toks)
    # inputs: keep unmasked tokens; emit ONE sentinel at each masked
    # block's first position (block starts at i % span_len == 0)
    inputs = F.array_join(
        F.filter(
            F.transform(
                F.col("_toks"),
                lambda t, i: F.when(~masked(i), t).when(
                    i % span_len == 0, F.lit(sentinel)
                ),
            ),
            lambda t: t.isNotNull(),
        ),
        " ",
    )
    # targets: sentinel before each masked block, then its tokens
    targets = F.array_join(
        F.filter(
            F.transform(
                F.col("_toks"),
                lambda t, i: F.when(
                    masked(i) & (i % span_len == 0),
                    F.concat(F.lit(sentinel), F.lit(" "), t),
                ).when(masked(i), t),
            ),
            lambda t: t.isNotNull(),
        ),
        " ",
    )
    n_masked = F.size(
        F.filter(F.transform(F.col("_toks"), lambda t, i: masked(i)), lambda b: b)
    )
    return (
        out.withColumn("inputs", inputs)
        .withColumn("targets", targets)
        .withColumn("n_tokens", F.size("_toks"))
        .withColumn("n_masked", n_masked)
        .drop("_toks")
    )


def readability_scores(
    df: DataFrame,
    *,
    text_col: str = "text",
    round_to: int = 4,
) -> tuple[Column, Column, Column, Column]:
    """Flesch reading-ease ingredients as pure codegen expressions:
    (n_words, n_sentences, n_syllables, flesch). Syllables use the
    standard vowel-group heuristic (runs of [aeiouy] per word);
    sentences count terminal-punctuation runs, floored at 1 so
    fragment-only documents don't divide by zero.

        flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words)

    All three counts are regexp_count projections — no tokenizer UDF,
    no shuffle; the formula is one fixed expression, so the score
    replays exactly in any engine (the corpus-quality companion to
    quality_score/gopher_flags: heuristic, cheap, calibratable).
    Returns COLUMNS (not a DataFrame) so callers embed them in any
    projection; NULL text yields NULL score.
    """
    t = F.col(text_col)
    words = whitespace_token_count(t)
    sentences = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    syllables = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+"))
    flesch = F.when(
        words > 0,
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (words / sentences)
            - F.lit(84.6) * (syllables / words),
            round_to,
        ),
    )
    return words, sentences, syllables, flesch
