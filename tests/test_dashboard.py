"""Dashboard-parity API over the ETL outputs (reference
interactive_dashboard.py templates)."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.analytics.dashboard import (
    classify_columns,
    export_csv,
    numeric_histogram,
    quality_drilldown,
    quality_report,
    records_over_time,
    scatter_sample,
    table_overview,
    top_categories,
)
from assignment_etl_spark.pipelines.runner import run_etl


@pytest.fixture(scope="module")
def etl(spark, fixture_dir):
    return run_etl(
        spark,
        str(fixture_dir / "patients.csv"),
        str(fixture_dir / "encounters.csv"),
        str(fixture_dir / "diagnoses.xml"),
    )


def test_classify_columns(etl):
    cls = classify_columns(etl.patients)
    assert "height_cm" in cls["numeric"] and "sex_iso" in cls["numeric"]
    assert cls["datetime"] == ["dob_parsed"]
    assert "patient_id" in cls["categorical"]


def test_table_overview(etl):
    head, cls = table_overview(etl.encounters, 3)
    assert head.count() == 3
    assert "length_of_stay_hours" in cls["numeric"]
    assert set(cls["datetime"]) == {"admit_dt", "discharge_dt"}


def test_histogram_and_time(etl):
    h = numeric_histogram(etl.patients, "height_cm", 10)
    assert h.agg(F.sum("count")).first()[0] == 10  # 1 NULL height excluded
    t = records_over_time(etl.encounters, "admit_dt", 5)
    assert t.agg(F.sum("count")).first()[0] == 7  # 8 rows, 1 NULL admit


def test_scatter_sample(etl):
    pts = scatter_sample(etl.patients, "height_cm", "weight_kg", "sex")
    assert pts.columns == ["height_cm", "weight_kg", "sex"]
    assert pts.count() == 11  # below max_points → no sampling


def test_top_categories_bounds(etl):
    top = top_categories(etl.logs, "reason", 5).collect()
    assert len(top) == 5
    with pytest.raises(ValueError):
        top_categories(etl.logs, "reason", 3)


def test_quality_report(etl):
    rep = quality_report(etl.logs)
    reasons = {r.reason: r["count"] for r in rep["reason_counts"].collect()}
    assert reasons["duplicate_removed"] == 2
    fr = rep["file_reason_counts"].collect()
    assert any(r.filename == "patients.csv" for r in fr if r.filename)
    aff = rep["affected_entities"].first()
    assert aff.affected == 9  # distinct patients with issues from patients.csv
    drill = quality_drilldown(etl.logs, "missing_marker").collect()
    assert len(drill) == 1 and drill[0].patient_id == "x-0005"


def test_export_csv(etl, tmp_path, spark):
    out = str(tmp_path / "logs_csv")
    export_csv(etl.logs, out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == etl.logs.count()
    assert back.columns == etl.logs.columns
