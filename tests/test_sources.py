"""S1-S3 sources: clean CSV (BOM/CRLF/padding), messy multi-delimiter CSV,
namespaced XML."""

from assignment_etl_spark.io.csv import read_csv
from assignment_etl_spark.io.messy_csv import read_messy_csv
from assignment_etl_spark.io.xml import read_diagnoses_xml
from assignment_etl_spark.schemas import ENCOUNTER_COLUMNS, ROW_ID


def test_clean_csv_bom_crlf_padding(spark, fixture_dir):
    df = read_csv(spark, str(fixture_dir / "patients.csv"))
    assert df.columns[:7] == [
        "patient_id",
        "given_name",
        "family_name",
        "dob",
        "sex",
        "height",
        "weight",
    ]
    assert df.count() == 13
    first = df.orderBy(ROW_ID).first()
    assert first.patient_id == "X-0001"  # no BOM residue
    assert first.height == "170 cm"  # padding trimmed


def test_messy_csv(spark, fixture_dir):
    df = read_messy_csv(spark, str(fixture_dir / "encounters.csv"), ENCOUNTER_COLUMNS)
    rows = df.orderBy(ROW_ID).collect()
    # blank line + repeated interior header skipped; 9 data rows survive
    assert len(rows) == 9
    # semicolon row parsed + 7th EXTRA field truncated
    semi = [r for r in rows if r.source_file == "fileB.csv" and r.encounter_id == "E-101"]
    assert len(semi) == 1
    assert semi[0].encounter_type == "OUTPATIENT"
    # short row padded with NULLs
    short = [r for r in rows if r.encounter_id == "E-107"][0]
    assert short.discharge_dt is None and short.source_file is None
    # padded cells trimmed
    assert rows[2].patient_id == "X-0003"
    # row order preserved for keep-first dedup
    ids = [r.encounter_id for r in rows]
    assert ids[0] == "E-100" and ids.index("E-106") > ids.index("E-104")


def test_xml_shred(spark, fixture_dir):
    df = read_diagnoses_xml(spark, str(fixture_dir / "diagnoses.xml"))
    rows = df.orderBy(ROW_ID).collect()
    assert len(rows) == 8
    assert rows[0].encounter_id == "E-100"
    assert rows[0].code == "E11.9"
    assert rows[0].code_system == "ICD-10"  # attribute extraction
    assert rows[0].is_primary_raw == "true"
    assert rows[3].encounter_id is None  # missing element → NULL
    assert rows[4].code is None
    assert rows[2].is_primary_raw is None
    # document order preserved
    assert [r.code for r in rows[:3]] == ["E11.9", "I10", "38341003"]
