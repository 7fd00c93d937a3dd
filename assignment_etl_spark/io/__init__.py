"""Sources and sinks: clean CSV (S1), messy multi-delimiter CSV (S2),
namespaced XML (S3), JDBC sink/scan (S4/S5), parquet native store."""
