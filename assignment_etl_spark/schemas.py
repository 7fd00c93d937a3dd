"""Explicit StructTypes for every engine table.

The engine never infers schemas (reference infers patients' header at
/root/reference/etl.py:38 and builds encounters/diagnoses schemas ad hoc at
etl.py:48-51,121-129; SURVEY §1.4). The audit-log table uses one fixed
superset schema — the reference's logs table is a union-of-dict-keys pandas
frame (etl.py:694); we reproduce that deterministically with
``unionByName(allowMissingColumns=True)`` over this superset (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- raw sources

# S1: patients CSV (header, BOM, padded cells) — raw columns all strings.
PATIENTS_RAW = T.StructType(
    [
        T.StructField("patient_id", T.StringType()),
        T.StructField("given_name", T.StringType()),
        T.StructField("family_name", T.StringType()),
        T.StructField("dob", T.StringType()),
        T.StructField("sex", T.StringType()),
        T.StructField("height", T.StringType()),
        T.StructField("weight", T.StringType()),
    ]
)

# S2: messy encounters CSV — fixed 6-column schema (reference hardcodes the
# expected columns at etl.py:48-51; >6 fields truncated, <6 padded with NULL).
ENCOUNTER_COLUMNS = [
    "encounter_id",
    "patient_id",
    "admit_dt",
    "discharge_dt",
    "encounter_type",
    "source_file",
]
ENCOUNTERS_RAW = T.StructType(
    [T.StructField(c, T.StringType()) for c in ENCOUNTER_COLUMNS]
)

# S3: namespaced diagnoses XML — 5 fixed fields (etl.py:121-129).
DIAGNOSES_RAW = T.StructType(
    [
        T.StructField("encounter_id", T.StringType()),
        T.StructField("code", T.StringType()),
        T.StructField("code_system", T.StringType()),
        T.StructField("is_primary", T.BooleanType()),
        T.StructField("recorded_at_raw", T.StringType()),
    ]
)

# ---------------------------------------------------------------- clean outputs

PATIENTS_CLEAN = T.StructType(
    [
        T.StructField("patient_id", T.StringType()),
        T.StructField("given_name", T.StringType()),
        T.StructField("family_name", T.StringType()),
        T.StructField("dob", T.StringType()),  # raw string kept, like reference
        T.StructField("sex", T.StringType()),
        T.StructField("height_cm", T.DoubleType()),
        T.StructField("weight_kg", T.DoubleType()),
        T.StructField("sex_iso", T.IntegerType()),
        T.StructField("dob_parsed", T.TimestampType()),
    ]
)

ENCOUNTERS_CLEAN = T.StructType(
    [
        T.StructField("encounter_id", T.StringType()),
        T.StructField("patient_id", T.StringType()),
        T.StructField("admit_dt", T.TimestampType()),
        T.StructField("discharge_dt", T.TimestampType()),
        T.StructField("encounter_type", T.StringType()),
        T.StructField("source_file", T.StringType()),
        T.StructField("length_of_stay_hours", T.DoubleType()),
    ]
)

DIAGNOSES_CLEAN = T.StructType(
    [
        T.StructField("encounter_id", T.StringType()),
        T.StructField("code", T.StringType()),
        T.StructField("code_system", T.StringType()),
        T.StructField("is_primary", T.BooleanType()),
        T.StructField("recorded_at", T.TimestampType()),
    ]
)

# ------------------------------------------------------------------ audit log

# Fixed superset of every log keyset the reference emits (SURVEY §1.4):
# patients-weight logs {patient_id, filename, original_value, cleaned_value,
# column_name, reason} (etl.py:297-304); sex logs sometimes use mapped_code
# (etl.py:333-363); diagnosis logs use {encounter_id, code, ...}
# (etl.py:621-655). All nullable strings.
LOG_COLUMNS = [
    "patient_id",
    "encounter_id",
    "code",
    "filename",
    "column_name",
    "original_value",
    "cleaned_value",
    "mapped_code",
    "reason",
]
LOG_SCHEMA = T.StructType([T.StructField(c, T.StringType()) for c in LOG_COLUMNS])

# Source-order id attached at ingest; the deterministic keep-first dedup
# contract (SURVEY §2.6/§4.3.1) requires it before any shuffle.
ROW_ID = "_row_id"
