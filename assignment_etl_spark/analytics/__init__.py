"""The query/analytics layer (reference: interactive_dashboard.py's
aggregation/top-k/histogram/distinct-count templates, SURVEY §2.4)."""
