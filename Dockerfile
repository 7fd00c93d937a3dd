# Containerized engine: same service surface as the reference image
# (ETL batch run + dashboard server; reference Dockerfile:1-24) but on a
# Spark base — spark-submit against a cluster master replaces the
# single-process conda app for the 100 TB deployment.
FROM apache/spark:4.0.0-python3

WORKDIR /app
USER root

# Postgres JDBC driver for the warehouse load (reference loads via
# SQLAlchemy/psycopg2; Spark side is the jdbc datasource)
ADD https://jdbc.postgresql.org/download/postgresql-42.7.3.jar /opt/spark/jars/

COPY assignment_etl_spark/ /app/assignment_etl_spark/
COPY data/ /app/data/

ENV PYTHONPATH=/app
# Local mode by default; at scale point spark.master at the cluster
# (e.g. SPARK_MASTER=spark://master:7077 or k8s://...)
ENV SPARK_GRAFT_CPUS=4

# Run the ETL, then serve the dashboard — the reference image's CMD
# (etl.py; streamlit run ...) with the engine's CLI. Compose overrides
# this per service.
CMD ["bash", "-c", "python -m assignment_etl_spark run-etl \
      --patients data/patients.csv --encounters data/encounters.csv \
      --diagnoses data/diagnoses.xml --store /app/store \
   && python -m assignment_etl_spark serve-dashboard --store /app/store --port 8501"]
