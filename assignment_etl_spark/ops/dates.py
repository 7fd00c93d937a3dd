"""Date/timestamp parsing operators.

F5 parse_dob (/root/reference/etl.py:370-424), F6 parse_datetime_safe
(etl.py:512-536), F7 tz handling (etl.py:595-601), F8 duration
(etl.py:590-593), F9 ISO-with-fallback (etl.py:115-119).

The reference leans on pandas' format sniffing; the engine enumerates the
format lattice explicitly (SURVEY §7.4.3) as a ``coalesce`` chain —
year-first beats month-first beats day-first, mirroring the README's
"months before days" rule (reference README.md:55). pandas' sniffer accepts
unambiguous day-first strings ("31-12-1985") on the *first* attempt
(verified, SURVEY §2.5 F5), so day-first formats sit in the same lattice and
``day_month_swapped`` is — as in the reference with pandas ≥ 2 — effectively
unreachable; the reason constant remains part of the log vocabulary.

Timezone policy (documented deviation, SURVEY §1.3/§7.4.4): everything is a
UTC instant in ``TimestampType`` with session tz UTC. The reference's
"parse UTC then tz_localize(None)" produces naive UTC wall-times — the same
bytes we store, so values compare equal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.ops.quality import log_frame

# Date-only lattice for dob-style columns. Order = priority.
DATE_FORMATS = [
    "yyyy-M-d",
    "yyyy/M/d",
    "M/d/yyyy",  # US month-first wins for ambiguous slash dates
    "d-M-yyyy",  # dash dates in the wild are day-first (pandas sniffs these)
    "d/M/yyyy",  # reachable only when month-first is impossible (day > 12)
    "yyyy-M-d'T'HH:mm:ss",
    "MMMM d, yyyy",
]

# Datetime lattice for encounter-style columns (mixed tz offsets, US, day-first).
DATETIME_FORMATS = [
    "yyyy-M-d'T'HH:mm:ssXXX",
    "yyyy-M-d'T'HH:mm:ss",
    "yyyy-M-d HH:mm:ssXXX",
    "yyyy-M-d HH:mm:ss",
    "yyyy-M-d HH:mm",
    "yyyy/M/d HH:mm",
    "M/d/yyyy HH:mm",
    "M/d/yyyy H:mm",
    "d-M-yyyy HH:mm",
    "d-M-yyyy H:mm",
    "yyyy-M-d",
    "M/d/yyyy",
    "d-M-yyyy",
]


def _ts_preprocess(col: Column) -> Column:
    """Inputs may arrive already lowercased (the reference runs clean_utf8
    before parsing, etl.py:509→512; pandas parses "...t...z" fine, Java
    patterns don't) — re-uppercase the ISO 'T' separator and a trailing
    'z' offset before matching."""
    s = F.trim(col.cast("string"))
    s = F.regexp_replace(s, r"(?<=[0-9])t(?=[0-9])", "T")
    return F.regexp_replace(s, r"z$", "Z")


def parse_timestamp_multi(
    col: Column, formats: list[str], *, preprocessed: bool = False
) -> Column:
    """Try each format in priority order; NULL if none matches (non-ANSI).
    preprocessed=True skips the normalization (caller staged it — the
    preprocess would otherwise inline into every format attempt)."""
    s = col if preprocessed else _ts_preprocess(col)
    return F.coalesce(*[F.to_timestamp(s, f) for f in formats])


def parse_dob(
    df: DataFrame,
    column: str = "dob",
    filename: str = "patients.csv",
    formats: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """F5: multi-format date parse with missing/unparseable logging.

    Blank or whitespace-only strings are non-null, so they log
    ``unparseable_date`` not ``missing_value`` — matching the verified
    reference behavior for patient P-0004 (SURVEY §2.5 F5).
    """
    parsed = parse_timestamp_multi(F.col(column), formats or DATE_FORMATS)
    clean = df.withColumn(column + "_parsed", parsed)
    reason = F.when(F.col(column).isNull(), F.lit("missing_value")).when(
        parsed.isNull(), F.lit("unparseable_date")
    )
    flagged = df.filter(reason.isNotNull()).withColumn("_reason", reason)
    logs = log_frame(
        flagged,
        patient_id=F.col("patient_id"),
        filename=F.lit(filename),
        column_name=F.lit(column),
        original_value=F.col(column),
        reason=F.col("_reason"),
    )
    return clean, logs


def parse_datetime_columns(
    df: DataFrame,
    columns: list[str],
    filename: str = "encounters.csv",
    id_col: str = "patient_id",
    formats: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """F6: UTC-normalizing timestamp parse over several columns.

    Matches parse_datetime_safe (etl.py:512-536): NULL/blank input → NULL
    silently; non-blank unparseable → NULL + ``invalid_datetime_format`` log.
    One log stream per column, unioned by the caller's log union.
    """
    formats = formats or DATETIME_FORMATS
    out = df
    log_parts = []
    for c in columns:
        raw = F.col(c)
        # stage the normalized string once per column — inlined, the two
        # regexp_replaces would re-run inside every to_timestamp attempt
        out = out.withColumn(f"_{c}_pre", _ts_preprocess(raw))
        pre = F.col(f"_{c}_pre")
        blank = raw.isNull() | (pre == "")
        parsed = parse_timestamp_multi(pre, formats, preprocessed=True)
        failed = ~blank & parsed.isNull()
        log_parts.append(
            log_frame(
                out.filter(failed),
                patient_id=F.col(id_col),
                filename=F.lit(filename),
                column_name=F.lit(c),
                original_value=raw,
                reason=F.lit("invalid_datetime_format"),
            )
        )
        out = out.withColumn(c, F.when(blank, F.lit(None)).otherwise(parsed)).drop(
            f"_{c}_pre"
        )
    logs = log_parts[0]
    for p in log_parts[1:]:
        logs = logs.unionByName(p)
    return out, logs


def parse_iso_with_midnight_fallback(col: Column) -> Column:
    """F9 (diagnoses.recorded_at): full ISO (offset, 'T', naive) via cast,
    date-only via midnight fallback — reference etl.py:115-119."""
    s = F.trim(col.cast("string"))
    return F.coalesce(
        s.cast("timestamp"),
        F.to_timestamp(F.concat(s, F.lit("T00:00:00"))),
    )


def duration_hours(start: Column, end: Column) -> Column:
    """F8: (end - start) in fractional hours; NULL-propagating like NaT."""
    return (end.cast("double") - start.cast("double")) / 3600.0
