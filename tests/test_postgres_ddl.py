"""Postgres dialect contract for the JDBC load path.

The reference loads its four tables into Postgres 15 via pandas
to_sql(if_exists='replace') (/root/reference/etl.py:711-719). Derby proves
the JDBC mechanism end to end (test_jdbc.py); this asserts the *dialect* —
the exact Postgres column types the overwrite path produces for each table,
per SURVEY §1.3 — without needing a live server.
"""

import pytest
from pyspark.sql import types as T

from assignment_etl_spark.io.jdbc import postgres_ddl, postgres_type
from assignment_etl_spark.pipelines.runner import run_etl


@pytest.fixture(scope="module")
def etl(spark, fixture_dir):
    return run_etl(
        spark,
        str(fixture_dir / "patients.csv"),
        str(fixture_dir / "encounters.csv"),
        str(fixture_dir / "diagnoses.xml"),
    )


def test_patients_ddl(etl):
    # sex_iso is INTEGER (SURVEY §1.3 maps ISO 5218 codes to IntegerType;
    # the reference's pandas int64 would say BIGINT — documented deviation)
    assert postgres_ddl(etl.patients, "patients") == (
        'CREATE TABLE "patients" (\n'
        '  "patient_id" TEXT,\n'
        '  "given_name" TEXT,\n'
        '  "family_name" TEXT,\n'
        '  "dob" TEXT,\n'
        '  "sex" TEXT,\n'
        '  "height_cm" DOUBLE PRECISION,\n'
        '  "weight_kg" DOUBLE PRECISION,\n'
        '  "sex_iso" INTEGER,\n'
        '  "dob_parsed" TIMESTAMP\n'
        ")"
    )


def test_encounters_ddl(etl):
    assert postgres_ddl(etl.encounters, "encounters") == (
        'CREATE TABLE "encounters" (\n'
        '  "encounter_id" TEXT,\n'
        '  "patient_id" TEXT,\n'
        '  "admit_dt" TIMESTAMP,\n'
        '  "discharge_dt" TIMESTAMP,\n'
        '  "encounter_type" TEXT,\n'
        '  "source_file" TEXT,\n'
        '  "length_of_stay_hours" DOUBLE PRECISION\n'
        ")"
    )


def test_diagnoses_ddl(etl):
    assert postgres_ddl(etl.diagnoses, "diagnoses") == (
        'CREATE TABLE "diagnoses" (\n'
        '  "encounter_id" TEXT,\n'
        '  "code" TEXT,\n'
        '  "code_system" TEXT,\n'
        '  "is_primary" BOOLEAN,\n'
        '  "recorded_at" TIMESTAMP\n'
        ")"
    )


def test_logs_ddl(etl):
    ddl = postgres_ddl(etl.logs, "logs")
    # every log column is a string channel (original_value carries the
    # F13 row→JSON serialization)
    assert ddl.count("TEXT") == 9 and '"reason" TEXT' in ddl


def test_scalar_type_lattice():
    assert postgres_type(T.LongType()) == "BIGINT"
    assert postgres_type(T.FloatType()) == "REAL"
    assert postgres_type(T.ShortType()) == "SMALLINT"
    assert postgres_type(T.DateType()) == "DATE"
    assert postgres_type(T.BinaryType()) == "BYTEA"
    assert postgres_type(T.DecimalType(18, 4)) == "NUMERIC(18,4)"
    assert postgres_type(T.TimestampNTZType()) == "TIMESTAMP"
    # nested → TEXT: the F13 policy to_json-serializes nested values
    # before the JDBC write, so the shipped column is a string
    assert postgres_type(T.ArrayType(T.FloatType())) == "TEXT"
    assert postgres_type(T.MapType(T.StringType(), T.LongType())) == "TEXT"
    with pytest.raises(TypeError):
        postgres_type(T.NullType())
