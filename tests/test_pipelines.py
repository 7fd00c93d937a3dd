"""End-to-end pipeline goldens on the engine's own adversarial fixtures
(same messiness taxonomy as the reference's, SURVEY §5.2 / FIXTURES.md)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.pipelines import diagnoses, encounters, patients
from assignment_etl_spark.pipelines.runner import run_etl


@pytest.fixture(scope="module")
def etl(spark, fixture_dir):
    return run_etl(
        spark,
        str(fixture_dir / "patients.csv"),
        str(fixture_dir / "encounters.csv"),
        str(fixture_dir / "diagnoses.xml"),
    )


def _reason_histogram(logs_df):
    return {
        r.reason: r.n
        for r in logs_df.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }


def test_patients_golden(etl):
    rows = {r.patient_id: r for r in etl.patients.collect()}
    assert len(rows) == 11  # 13 in − id-dup − person-dup
    assert "x-0001" in rows  # ids lowercased by the final normalize pass
    r1 = rows["x-0001"]
    assert r1.height_cm == 170.0 and r1.weight_kg == 65.0 and r1.sex_iso == 2
    assert r1.given_name == "ana" and r1.family_name == "garcía"
    assert r1.dob_parsed == dt.datetime(1991, 2, 3)
    r2 = rows["x-0002"]
    assert r2.given_name == "ben"  # keep-first: the Benny copy dropped
    assert r2.height_cm == pytest.approx(172.72)
    assert r2.weight_kg == pytest.approx(68.0388)
    assert r2.dob_parsed == dt.datetime(1992, 12, 31)
    r3 = rows["x-0003"]
    assert r3.height_cm == pytest.approx(167.64)
    assert r3.weight_kg == 54.5  # BMI-assumed kg
    assert r3.dob_parsed == dt.datetime(1984, 12, 31)  # day-first, no log
    assert rows["x-0004"].dob_parsed is None
    assert rows["x-0004"].weight_kg == pytest.approx(68.0388)  # assumed lb
    assert rows["x-0006"].weight_kg == 300.0  # implausible kept unfixed
    assert rows["x-0007"].height_cm is None and rows["x-0007"].weight_kg is None
    assert rows["x-0008"].given_name == "李"
    assert rows["x-0012"].given_name == "john"  # NFKC fullwidth fold
    assert rows["x-0011"].sex_iso == 0
    assert "x-0010" not in rows  # person-key dup removed
    assert "weight" not in etl.patients.columns and "height" not in etl.patients.columns


def test_encounters_golden(etl):
    rows = {r.encounter_id: r for r in etl.encounters.collect()}
    assert len(rows) == 8  # 9 parsed − 1 duplicate e-101
    e100 = rows["e-100"]
    assert e100.admit_dt == dt.datetime(2025, 1, 10, 7, 0)  # +01:00 → UTC
    assert e100.length_of_stay_hours == pytest.approx(50.5)
    assert e100.encounter_type == "inpatient"
    e101 = rows["e-101"]
    assert e101.source_file == "filea.csv"  # keep-first across delimiters
    assert e101.admit_dt == dt.datetime(2025, 1, 15, 9, 30)  # US format
    e102 = rows["e-102"]
    assert e102.admit_dt == dt.datetime(2025, 1, 16, 22, 15)  # day-first dashes
    e103 = rows["e-103"]
    assert e103.discharge_dt is None  # discharge_before_admit → nulled
    assert e103.length_of_stay_hours is None
    assert rows["e-105"].encounter_type == "unknown"  # invalid enum, lowercased fill
    assert rows["e-105"].patient_id == "x-9999"  # orphan retained
    e106 = rows["e-106"]
    assert e106.admit_dt is None  # unparseable → NULL + log
    assert rows["e-107"].encounter_type == "unknown"  # padded short row


def test_diagnoses_golden(etl):
    rows = etl.diagnoses.orderBy("encounter_id", "code").collect()
    assert len(rows) == 6  # 8 in − missing-code drop − (e-100, e11.9) dup
    by_key = {(r.encounter_id, r.code): r for r in rows}
    assert ("e-100", "e11.9") in by_key
    assert by_key[("e-100", "e11.9")].is_primary is True  # keep-first kept the first
    assert by_key[("e-100", "e11.9")].recorded_at == dt.datetime(2025, 1, 10, 8, 0)
    assert by_key[("e-100", "i10")].recorded_at == dt.datetime(2025, 1, 10)  # date-only
    assert by_key[("e-101", "38341003")].is_primary is False  # filled
    assert by_key[("e-101", "38341003")].code_system == "snomed"
    assert ("unknown", "j45") in by_key  # encounter_id fill, lowercased
    assert ("unknown", "r07.9") in by_key
    assert by_key[("unknown", "r07.9")].is_primary is False  # independent fill (non-strict)
    assert by_key[("e-104", "zzz")].recorded_at == dt.datetime(2035, 1, 1)  # future kept


def test_log_histogram(etl):
    hist = _reason_histogram(etl.logs)
    assert hist == {
        # patients
        "missing_unit_assumed_kg": 1,
        "missing_unit_assumed_lb": 2,
        "missing_marker": 1,
        "implausible_bmi_110.2": 1,
        "no_numeric_found": 1,
        "unknown_or_missing": 1,
        "invalid_code": 1,
        "missing_value": 2,  # sex NULL + dob NULL
        "unparseable_date": 1,
        "duplicate_removed": 2,
        # encounters
        "invalid_datetime_format": 1,
        "duplicate_encounter_id": 2,
        "discharge_before_admit": 1,
        "missing_discharge": 3,
        "invalid_encounter_type": 2,
        # diagnoses
        "dropped for missing code": 1,
        "missing encounter_id": 2,
        "filled missing is_primary": 2,
        "duplicate encounter_id + code": 1,
    }
    assert etl.logs.columns == [
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


def test_log_keyset_quirks(etl):
    sex_logs = etl.logs.filter(F.col("reason") == "unknown_or_missing").collect()
    assert sex_logs[0].cleaned_value == "0" and sex_logs[0].mapped_code is None
    inv = etl.logs.filter(F.col("reason") == "invalid_code").collect()
    assert inv[0].mapped_code == "0" and inv[0].cleaned_value is None


def test_strict_parity_if_elif_quirk(spark, fixture_dir):
    _, logs = diagnoses.run(
        spark, str(fixture_dir / "diagnoses.xml"), strict_parity=True
    )
    hist = _reason_histogram(logs)
    # the row missing BOTH encounter_id and is_primary gets only the
    # encounter_id fill under the reference's if/elif chain
    assert hist["missing encounter_id"] == 2
    assert hist["filled missing is_primary"] == 1
