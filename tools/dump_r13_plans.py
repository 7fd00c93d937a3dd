"""Dump `.explain("formatted")` for named headline/registry queries into
plans/r13/<query>_<tag>.txt — the r13 round before/after plan
evidence (guide §1: capture the plan shape before changing anything).

Usage: python tools/dump_r13_plans.py <tag> <query> [query ...]
       (tag is `before` or `after`)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import bench as bench_mod  # noqa: E402
from assignment_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = "/root/repo/plans/r13"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-r13-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = bench_mod.build_queries(spark)
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
