"""assignment_etl_spark — a PySpark-native ETL + analytics engine.

A from-scratch re-expression of the capabilities of the reference project
``patrickthomasius/Assignment-ETL`` (an eager pandas dataflow, see
/root/reference/etl.py) as a lazy, distributed, Catalyst-optimized Spark
engine. Architecture blueprint: SURVEY.md at the repo root.

Layout:
    session    -- SparkSession factory (UTC, AQE, shuffle-partition policy)
    schemas    -- explicit StructTypes for every source and the LOG schema
    io         -- sources/sinks: clean CSV, messy multi-delimiter CSV,
                  namespaced XML, JDBC, parquet
    ops        -- the cleaning-operator library; every operator is a pure
                  function DataFrame -> (clean_df, log_df)
    pipelines  -- patients / encounters / diagnoses composition
    analytics  -- the query layer (top-k, histogram, distinct counts, quality)
    ext        -- scale extensions: dedup (minhash/simhash/ngram/embedding),
                  similarity search, text analysis, multimodal, streaming
"""

__version__ = "0.1.0"
