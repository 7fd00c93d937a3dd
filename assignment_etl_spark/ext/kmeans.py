"""Portable k-means: deterministic, cross-engine-replayable Lloyd
iterations over an embedding column.

`ext/similarity.py` uses MLlib's KMeans for IVF coarse quantization —
fast, but its initialization and float reductions are
implementation-defined, so no independent engine can replay it. This
module is the portable counterpart (the PageRank treatment for
clustering): every source of nondeterminism is pinned —

- init: the k vectors with the smallest ids, in id order;
- assignment: squared-L2 via a LEFT FOLD over dimensions (Spark
  ``aggregate`` with 0.0 init ≡ SQL ``list_reduce`` — identical IEEE
  add order, so identical doubles), ties broken by centroid index;
- update: per-dimension mean under the decimal-sum policy (components
  rounded then summed as decimal — partitioning cannot change the sum;
  one double division + round at the end);
- empty clusters keep their previous centroid.

Each iteration is: a ×k broadcast nested-loop expansion (k is small and
fixed — bounded, NOT a cartesian hazard), a per-point window argmin
(shuffle on point id), and a (k×dim)-row aggregate. O(n·k·dim) work.
The centroid state (k rows, bounded by construction) round-trips
through the driver between iterations — the classic Lloyd's hand-off,
which keeps plan depth constant WITHOUT persistence. The earlier
per-iteration localCheckpoint achieved the same plan depth but its
checkpoint RDDs live outside the CacheManager (clearCache can't free
them; ContextCleaner reaps only on driver GC), so repeated calls leaked
storage at steady state — caught by the scale sweep's cache-discipline
assertion. At 100 TB this is exactly MLlib's dataflow, minus the
nondeterminism.

Reference parity note: the reference repo has no clustering; this
serves the training-data curation layer (topic bucketing, dedup-cluster
seeding) beside ext/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def squared_l2(v: Column, c: Column) -> Column:
    """Left-fold Σ(v_i − c_i)² — engine-portable double reduction."""
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    comp_scale: int = 7,
    mean_round: int = 9,
) -> tuple[DataFrame, DataFrame]:
    """Returns (assignments, centroids) after ``iters`` Lloyd steps plus
    a final assignment pass against the final centroids. assignments =
    (pid, cidx, dist); centroids = (cidx, c: array<double>)."""
    spark = df.sparkSession
    pts = df.select(
        F.col(id_col).alias("pid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # Centroid state lives on the DRIVER between iterations (k rows —
    # bounded by construction), re-shipped as a broadcast-sized literal
    # table each step. This is the classic Lloyd's hand-off: it severs
    # lineage without persistence. The previous localCheckpoint design
    # kept plan depth constant too, but each iteration's checkpoint RDD
    # lives OUTSIDE the CacheManager (clearCache can't free it,
    # ContextCleaner only reaps on driver GC) — the scale-sweep's
    # cache-discipline assertion caught it accumulating across queries.
    cents_schema = "cidx int, c array<double>"
    cents_rows = [
        (i + 1, list(r.v))
        for i, r in enumerate(pts.orderBy("pid").limit(k).collect())
    ]
    cents = spark.createDataFrame(cents_rows, cents_schema)

    def assign(cents_df: DataFrame) -> DataFrame:
        d = pts.crossJoin(F.broadcast(cents_df)).select(
            "pid", "v", "cidx", squared_l2(F.col("v"), F.col("c")).alias("dist")
        )
        wa = Window.partitionBy("pid").orderBy("dist", "cidx")
        return (
            d.withColumn("_rn", F.row_number().over(wa))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    dec = f"decimal(20,{comp_scale})"
    for _ in range(iters):
        a = assign(cents)
        dims = (
            a.select("cidx", F.posexplode("v").alias("pos", "x"))
            .groupBy("cidx", "pos")
            .agg(
                F.sum(F.round(F.col("x"), comp_scale).cast(dec)).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        newc = (
            dims.select(
                "cidx",
                "pos",
                F.round(
                    F.col("s").cast("double") / F.col("n"), mean_round
                ).alias("m"),
            )
            .groupBy("cidx")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
        )
        # k-row collect (bounded): empty clusters keep their previous
        # centroid — the coalesce, done as a dict merge on the driver
        new_map = {r.cidx: list(r.c) for r in newc.collect()}
        cents_rows = [
            (cidx, new_map.get(cidx, c_old)) for cidx, c_old in cents_rows
        ]
        cents = spark.createDataFrame(cents_rows, cents_schema)
    return assign(cents).select("pid", "cidx", "dist"), cents
