"""F3-F14 scalar/cleaning operators: codes, dates, strings."""

import datetime as dt

from pyspark.sql import functions as F

from assignment_etl_spark.ops.codes import coerce_bool, sex_log_reason, sex_to_iso5218
from assignment_etl_spark.ops.dates import (
    DATE_FORMATS,
    duration_hours,
    parse_iso_with_midnight_fallback,
    parse_timestamp_multi,
)
from assignment_etl_spark.ops.strings import normalize_column_names, normalize_strings


def test_sex_iso5218(spark):
    cases = [
        ("M", 1, None),
        ("f", 2, None),
        (" O ", 9, None),
        ("U", 0, "unknown_or_missing"),
        ("x", 0, "invalid_code"),
        ("", 0, "invalid_code"),
        (None, 0, "missing_value"),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, *_r) in enumerate(cases)], "i int, sex string")
    got = {
        r.i: (r.code, r.reason)
        for r in df.select(
            "i",
            sex_to_iso5218(F.col("sex")).alias("code"),
            sex_log_reason(F.col("sex")).alias("reason"),
        ).collect()
    }
    for i, (s, code, reason) in enumerate(cases):
        assert got[i] == (code, reason), (s, got[i])


def test_coerce_bool(spark):
    df = spark.createDataFrame(
        [("true",), ("TRUE",), ("false",), ("yes",), (None,)], "v string"
    )
    got = [r.b for r in df.select(coerce_bool(F.col("v")).alias("b")).collect()]
    assert got == [True, True, False, False, None]


def test_date_lattice(spark):
    cases = [
        ("1991-02-03", dt.datetime(1991, 2, 3)),
        ("1999-9-9", dt.datetime(1999, 9, 9)),
        ("12/31/1992", dt.datetime(1992, 12, 31)),
        ("01/02/1990", dt.datetime(1990, 1, 2)),  # ambiguous → month-first wins
        ("31-12-1984", dt.datetime(1984, 12, 31)),  # dash → day-first, no raise
        ("1993/04/05", dt.datetime(1993, 4, 5)),
        ("", None),
        ("not a date", None),
        (None, None),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)], "i int, d string")
    got = {
        r.i: r.ts
        for r in df.select(
            "i", parse_timestamp_multi(F.col("d"), DATE_FORMATS).alias("ts")
        ).collect()
    }
    for i, (s, expected) in enumerate(cases):
        assert got[i] == expected, (s, got[i])


def test_iso_midnight_fallback_and_utc(spark):
    cases = [
        ("2025-01-10T09:00:00+01:00", dt.datetime(2025, 1, 10, 8, 0)),  # UTC instant
        ("2025-01-10", dt.datetime(2025, 1, 10, 0, 0)),
        ("2025-01-15T10:00:00", dt.datetime(2025, 1, 15, 10, 0)),  # naive = UTC
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)], "i int, s string")
    got = {
        r.i: r.ts
        for r in df.select(
            "i", parse_iso_with_midnight_fallback(F.col("s")).alias("ts")
        ).collect()
    }
    for i, (s, expected) in enumerate(cases):
        assert got[i] == expected, (s, got[i])


def test_duration_hours(spark):
    df = spark.createDataFrame(
        [
            (dt.datetime(2025, 1, 1, 0, 0), dt.datetime(2025, 1, 4, 4, 30)),
            (dt.datetime(2025, 1, 1, 0, 0), None),
        ],
        "a timestamp, b timestamp",
    )
    got = [r.h for r in df.select(duration_hours(F.col("a"), F.col("b")).alias("h")).collect()]
    assert got[0] == 76.5
    assert got[1] is None


def test_normalize_column_names(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["﻿ patient_id ", "given name", "A B  C"])
    assert normalize_column_names(df).columns == ["patient_id", "given_name", "a_b_c"]


def test_normalize_strings_nfkc(spark):
    df = spark.createDataFrame(
        [("Ｊｏｈｎ", "MÜLLER", 5), ("ﬁn", None, 6)], "a string, b string, n int"
    )
    rows = normalize_strings(df).orderBy("n").collect()
    assert rows[0].a == "john" and rows[0].b == "müller"
    assert rows[1].a == "fin" and rows[1].b is None  # NFKC folds the ﬁ ligature
    assert rows[0].n == 5  # non-strings untouched
