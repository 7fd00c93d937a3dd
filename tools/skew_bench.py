"""Measure salted vs naive plans on a deliberately skewed key (one hot key
owning ~70% of rows): two-phase salted aggregation, and the salted join with
a non-broadcastable dim (autoBroadcastJoinThreshold=-1 models the dim that's
too big to broadcast at full scale).

Measured conclusions (recorded in SCALE.md, re-runnable here): at local[32]
/ tens of millions of rows, NEITHER salted variant beats naive —
(a) mergeable aggregates are immune to agg-key skew because map-side partial
aggregation collapses the hot key to one partial row per mapper, and
(b) the hot SMJ task sorts a single-key run in near-linear time, so the
salted join's extra dim-replication shuffle costs more than the skew saves.
Salting's regime is the one local mode can't reproduce: a reduce task whose
single key exceeds executor MEMORY (spill → death spiral) or a wall-clock
SLA at 1000-executor scale, and non-AQE contexts (streaming joins). The
correctness gate `skewed_agg_salted` hash-checks plan equivalence so the
mitigation is proven safe to reach for when that regime hits.

Usage: python tools/skew_bench.py [sf_dir] [amplify]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from assignment_etl_spark.ops.skew import salted_agg
from assignment_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    spark = get_spark("skew_bench")
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    rep = F.explode(F.array(*[F.lit(i) for i in range(amplify)])).alias("_rep")
    skewed = (
        ev.select(
            F.when((F.col("user_id") % 10) < 7, F.lit(0))
            .otherwise(F.col("user_id"))
            .cast("long")
            .alias("k"),
            F.col("value").cast("decimal(28,6)").alias("v"),
            rep,
        )
        .drop("_rep")
        .persist()
    )
    n = skewed.count()
    hot = skewed.filter(F.col("k") == 0).count()
    print(f"# rows={n}, hot-key share={hot / n:.2%}", file=sys.stderr)

    def naive():
        return skewed.groupBy("k").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").alias("total"),
            F.max("v").alias("vmax"),
        )

    def salted():
        return salted_agg(
            skewed,
            ["k"],
            {"n_events": ("v", "count"), "total": ("v", "sum"), "vmax": ("v", "max")},
            n_salts=32,
        )

    a = {r.k: (r.n_events, r.total) for r in naive().collect()}
    b = {r.k: (r.n_events, r.total) for r in salted().collect()}
    assert a == b, "salted plan must be result-equivalent to the naive plan"

    for name, fn in [("agg naive", naive), ("agg salted", salted)]:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn().count()
            runs.append(time.perf_counter() - t0)
        print(f"{name}: min {min(runs):.2f}s runs={[round(r, 2) for r in runs]}")

    # --- skewed join, non-broadcastable-dim regime ---
    from assignment_etl_spark.ops.skew import salted_join  # noqa: PLC0415

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        dim = (
            skewed.select("k").distinct()
            .withColumn("payload", F.md5(F.col("k").cast("string")))
            .persist()
        )
        dim.count()

        def jnaive():
            return skewed.join(dim, on="k").agg(F.count(F.lit(1)))

        def jsalted():
            return salted_join(skewed, dim, "k", n_salts=32).agg(F.count(F.lit(1)))

        assert jnaive().first()[0] == jsalted().first()[0]
        for name, fn in [("join naive", jnaive), ("join salted", jsalted)]:
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn().first()
                runs.append(time.perf_counter() - t0)
            print(f"{name}: min {min(runs):.2f}s runs={[round(r, 2) for r in runs]}")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


if __name__ == "__main__":
    main()
