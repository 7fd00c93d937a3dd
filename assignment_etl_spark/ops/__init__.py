"""Cleaning-operator library.

Contract (SURVEY §2.9): every cleaning operator is a pure function
``DataFrame -> (clean_df, log_df)``. Both outputs derive from one shared
intermediate so the scan is not recomputed; the caller unions all log_dfs
into the ``logs`` table via :func:`assignment_etl_spark.ops.quality.union_logs`.
"""
