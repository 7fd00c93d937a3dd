"""SQL surface over the ETL outputs and lakehouse tables."""

from assignment_etl_spark.analytics.sql import register_parquet_dir, register_tables, sql
from assignment_etl_spark.pipelines.runner import run_etl


def test_sql_over_etl_outputs(spark, fixture_dir):
    etl = run_etl(
        spark,
        str(fixture_dir / "patients.csv"),
        str(fixture_dir / "encounters.csv"),
        str(fixture_dir / "diagnoses.xml"),
    )
    register_tables(spark, etl.tables())
    out = sql(
        spark,
        """
        SELECT p.sex_iso, count(*) AS n, round(avg(e.length_of_stay_hours), 2) AS avg_los
        FROM encounters e JOIN patients p ON e.patient_id = p.patient_id
        GROUP BY p.sex_iso ORDER BY p.sex_iso
        """,
    ).collect()
    assert len(out) >= 2
    n_logs = sql(spark, "SELECT count(*) AS n FROM logs WHERE reason LIKE 'dup%'").first().n
    # duplicate_removed×2 + duplicate_encounter_id×2 + "duplicate encounter_id + code"×1
    assert n_logs == 5

def test_sql_over_parquet(spark, sf_dir):
    register_parquet_dir(spark, sf_dir, ["orders", "customer"], prefix="t_")
    row = sql(
        spark,
        """
        SELECT c_mktsegment, count(*) AS n
        FROM t_orders JOIN t_customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY n DESC LIMIT 1
        """,
    ).first()
    assert row.n > 0
