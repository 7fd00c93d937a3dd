"""JSON-lines (NDJSON) source and sink.

The reference loads only CSV/XML/JDBC (/root/reference/etl.py:38,699,711);
JSONL is the missing feed format every large corpus actually ships in
(Common-Crawl-style dumps, API event logs), so the engine treats it as a
first-class source with the same contract as the CSV family: explicit
schema, normalized column names, source-order row ids, and an auditable
bad-record channel instead of silent drops.

Scale notes (100 TB):
- Schema inference is a FULL extra pass over the data before the real scan
  even starts — at 100 TB that doubles input I/O. ``read_jsonl`` therefore
  takes an explicit schema; opt-in inference samples via ``samplingRatio``
  and is meant for interactive exploration only.
- Parsing happens in the JVM's Jackson reader inside the scan (one pass,
  whole-stage-codegen downstream); there is no Python in the path.
- Corrupt records are captured PER ROW into ``_corrupt_record`` (PERMISSIVE
  mode) so one truncated line in a 100 TB feed doesn't fail the job
  (FAILFAST) or silently vanish (DROPMALFORMED). The caller splits the
  frame with :func:`split_corrupt` — same dual-output (clean, log) contract
  the quality pipelines use (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from assignment_etl_spark.ops.dedup import with_row_id
from assignment_etl_spark.ops.strings import normalize_column_names

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    sampling_ratio: float = 1.0,
    row_id: bool = True,
) -> DataFrame:
    """Read newline-delimited JSON with per-row corrupt-record capture.

    With an explicit ``schema`` (the scale path) the file is scanned as
    text and parsed with ``from_json`` — the identical JVM Jackson parser
    the native JSON source uses, one scan, no Python — with a
    ``_corrupt_record`` field carrying the raw line for rows that fail to
    parse (every data column NULL) and NULL for clean rows. Parsing via
    ``from_json`` instead of ``spark.read.json`` makes the corrupt channel
    an ORDINARY column: the native source's internal corrupt column cannot
    be queried alone (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    without caching the scan — a non-starter at 100 TB.

    Without a schema (exploration only) Spark infers one by sampling
    ``sampling_ratio`` of the input — a full extra pass at ratio 1.0 —
    and parsing still goes through the same from_json route, so the
    corrupt channel behaves identically on both paths.

    Whitespace-only lines are skipped (feed-archival convention), not
    logged as corrupt.
    """
    if schema is None:
        # exploration path: infer by sampling, then parse through the SAME
        # from_json route — handing back the native scan's internal
        # corrupt column would make split_corrupt unqueryable without
        # caching (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
        inferred = (
            spark.read.option("samplingRatio", sampling_ratio).json(path).schema
        )
        schema = T.StructType(
            [f for f in inferred.fields if f.name != CORRUPT_COL]
        )
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    else:
        schema = T.StructType(list(schema.fields))  # never mutate the caller's
    if CORRUPT_COL not in schema.fieldNames():
        schema = schema.add(CORRUPT_COL, T.StringType())
    raw = spark.read.text(path).filter(F.trim("value") != "")
    df = raw.select(
        F.from_json(
            "value",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_rec"),
        "value",
    ).select(
        "_rec.*",
        # from_json(PERMISSIVE) null-fills an unparseable row but only
        # fills the corrupt field when Jackson produced a partial
        # token stream; coalesce with the raw line so EVERY corrupt
        # row carries its source text for the audit sink
        F.coalesce(F.col(f"_rec.{CORRUPT_COL}"), F.col("value")).alias("_raw"),
    )
    df = df.withColumn(
        CORRUPT_COL,
        F.when(F.col(CORRUPT_COL).isNotNull(), F.col("_raw")),
    ).drop("_raw")
    df = normalize_column_names(df)
    return with_row_id(df) if row_id else df


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, bad) dual output. ``bad`` carries the raw offending line for
    the audit sink; ``clean`` drops the contract column.

    Works on anything read_jsonl returns: both its paths parse via
    from_json, whose corrupt field is an ordinary column — unlike the
    native JSON source's internal one, which Spark refuses to query alone
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) without caching the scan.
    """
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line"),
        *[c for c in df.columns if c not in (CORRUPT_COL,)],
    )
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = "gzip",
) -> None:
    """Write NDJSON (one object per line, gzip-splittable-enough for
    archival feeds; use parquet for anything the engine re-reads)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
