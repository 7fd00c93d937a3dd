"""S3: namespaced-XML source (no external spark-xml dependency).

Reference (parse_diagnoses_to_df, /root/reference/etl.py:97-132) walks
``<Diagnoses xmlns="http://example.org/diagnosis">`` with ElementTree on the
driver. Engine design: ``spark.read.text(wholetext=True)`` gives one row per
file; an Arrow-batched ``mapInPandas`` shreds each document into typed
records — so a directory of thousands of XML files parses in parallel, one
task per file split, nothing on the driver.

The record shape is generic: pass ``fields`` mapping output column ->
(child element | "@attribute" on a child). recorded_at stays a raw string
here; timestamp semantics (ISO + midnight fallback, F9) are applied by the
pipeline so the parse lattice lives in one place.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from assignment_etl_spark.ops.dedup import with_row_id

DIAGNOSIS_NS = "http://example.org/diagnosis"

# output column -> (tag, attribute-or-None)
DIAGNOSIS_FIELDS: dict[str, tuple[str, str | None]] = {
    "encounter_id": ("encounterId", None),
    "code": ("code", None),
    "code_system": ("code", "system"),
    "is_primary_raw": ("isPrimary", None),
    "recorded_at_raw": ("recordedAt", None),
}


def _shred_schema(fields: dict[str, tuple[str, str | None]]) -> T.StructType:
    cols = [T.StructField(name, T.StringType()) for name in fields]
    cols.append(T.StructField("_row_id", T.LongType()))
    return T.StructType(cols)


def read_xml_records(
    spark: SparkSession,
    path: str,
    *,
    record_tag: str,
    namespace: str | None = None,
    fields: dict[str, tuple[str, str | None]],
) -> DataFrame:
    """Shred XML file(s) into one DataFrame row per ``record_tag`` element.

    All output columns are strings (typed casts are downstream operators);
    ``_row_id`` preserves document order for the keep-first dedup contract
    (file ordinal in the high bits, record ordinal in the low bits).
    """
    import xml.etree.ElementTree as ET  # noqa: PLC0415 — executor-side import

    ns = f"{{{namespace}}}" if namespace else ""
    schema = _shred_schema(fields)
    files = with_row_id(spark.read.text(path, wholetext=True))

    def shred(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for doc, file_id in zip(pdf["value"], pdf["_row_id"]):
                root = ET.fromstring(doc)
                for i, rec in enumerate(root.iter(f"{ns}{record_tag}")):
                    row: dict = {}
                    for name, (tag, attr) in fields.items():
                        el = rec.find(f"{ns}{tag}")
                        if el is None:
                            row[name] = None
                        elif attr is not None:
                            row[name] = el.get(attr)
                        else:
                            row[name] = el.text
                    row["_row_id"] = (int(file_id) << 20) + i
                    out.append(row)
            yield pd.DataFrame(out, columns=list(fields) + ["_row_id"])

    return files.mapInPandas(shred, schema=schema)


def read_diagnoses_xml(spark: SparkSession, path: str) -> DataFrame:
    """The reference's diagnosis feed: 5 fields incl. the ``system``
    attribute of ``<code>`` (etl.py:106-107)."""
    return read_xml_records(
        spark,
        path,
        record_tag="Diagnosis",
        namespace=DIAGNOSIS_NS,
        fields=DIAGNOSIS_FIELDS,
    )
