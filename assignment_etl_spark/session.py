"""SparkSession factory with the engine's scale-oriented defaults.

Design notes (100 TB target, tested on local[*]):
- Session timezone is pinned to UTC: the engine normalizes all timestamps to
  UTC at parse time (reference keeps mixed-tz python objects,
  /root/reference/etl.py:115-119 — documented deviation, SURVEY §1.3).
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting are
  the first line of defense at scale; local shuffle reader avoids needless
  exchanges for broadcast-converted joins.
- Arrow on: every pandas_udf / mapInPandas / toPandas crossing is
  Arrow-batched.
- spark.sql.shuffle.partitions: a *local* default only. On a real cluster
  AQE's coalesceShufflePartitions makes the static number mostly irrelevant
  (set initialPartitionNum high and let AQE shrink).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _mem_bytes(spec: str) -> int:
    """'2g' / '512m' / '24g' → bytes (JVM -Xmx spec subset)."""
    spec = spec.strip().lower()
    mult = {"k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40}.get(spec[-1], 1)
    return int(spec[:-1] if spec[-1] in "kmgt" else spec) * mult


def broadcast_threshold_bytes(heap_spec: str) -> int:
    """Broadcast budget scaled to the executor heap: min(64 MB, heap/100).

    A broadcast-hash relation expands ~5-10× over its on-wire estimate
    (boxed rows + hash table), is pinned on-heap per executor, and is the
    ONE join input Spark cannot spill — so the threshold must be a
    function of the heap, not a constant. 64 MB (the engine's historical
    setting) is right for the default 24 g sandbox heap but lethal at
    2 g: the r12 memory-pressure sweep measured `negative_sample_parts`
    OOM at sf10/2g because a 2M-row item index estimated at ~32 MB
    (< 64 MB → static BHJ) hashed into hundreds of on-heap MB. heap/100
    keeps the expanded relation ~a few percent of the heap: 2 g → ~21 MB
    (the index shuffle-joins and spills instead), ≥ 6.4 g → the 64 MB
    cap (plans unchanged on the default config, bench unaffected)."""
    return min(64 * 2**20, _mem_bytes(heap_spec) // 100)


def get_spark(
    app_name: str = "assignment-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local mode uses ``local[$SPARK_GRAFT_CPUS]``; on a cluster, pass
    ``master=None`` with an external cluster manager config.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    parts = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            str(broadcast_threshold_bytes(
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
            )),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        # parquet timestamp policy (mirrors __spark_entry__._prep): µs-NTZ
        # columns read as instants; TIMESTAMP(NANOS) surfaces as a long
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the driver's parquet tables from ``sf_dir`` as a dict of DataFrames."""
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
