"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with a cheap count-collect (the driver collects
entry() itself); timings are wall-clock per query after a shared session
warm-up so JVM startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from assignment_etl_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "top_revenue_orders",
    "revenue_by_region",
    "segment_order_stats",
    "top_orders_per_customer",
    "histogram_extendedprice",
    "event_pairs_15min",
    "unit_normalization",
    "date_lattice_roundtrip",
    "dedup_exact_documents",
    "text_stats_by_lang",
    "similarity_topk",
    "minhash_lsh_pairs",
    "streaming_hourly_events",
    "session_windows",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    # warm-up: JVM + parquet footer caches, not billed to any query
    queries["event_type_counts"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]:.2f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
