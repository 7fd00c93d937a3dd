"""Embedding scalar quantization: float vectors → int8 codes and back.

Vector stores at 100 TB are storage- and bandwidth-bound; per-dimension
scalar quantization cuts both 4× (float32 → int8) at a reconstruction
error bounded by step/2 per dimension, and distance math on codes stays
SIMD-friendly. This is the affine scheme every serious ANN stack ships
(FAISS SQ8 / Lucene scalar quantizer): per-dimension [min, max] from ONE
aggregate pass, code = round((x − min)/step), dequant = min + code·step.

Everything is codegen arithmetic: the stats table is ≤ dim rows
(broadcast), quantize/dequantize are zip_with projections, and the
round-half-up convention is pinned so codes replay exactly in SQL.
Degenerate dimensions (max == min) quantize to code 0 and reconstruct
exactly.

Reference parity note: no vector surface in the reference; this joins
ext/similarity.py (search) and ext/kmeans.py (clustering) in the
embedding toolchain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVELS = 255  # int8 code points 0..255 stored as int (offset-free)


def dim_stats(df: DataFrame, *, vec_col: str = "embedding") -> DataFrame:
    """(pos, lo, hi) per dimension — one posexplode aggregate."""
    return (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    )


def _stats_arrays(stats: DataFrame) -> DataFrame:
    """1-row (los, his) arrays ordered by dimension, for broadcast."""
    return stats.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lo"))), lambda s: s["lo"]
        ).alias("_los"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "hi"))), lambda s: s["hi"]
        ).alias("_his"),
    )


def quantize(
    df: DataFrame,
    stats: DataFrame,
    *,
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Append ``out_col``: int codes 0..255 per dimension.
    code = round(LEVELS · (x − lo)/(hi − lo)) half-up; degenerate
    dimensions → 0. The stats collapse to one broadcast row, so this is
    a pure projection over the data."""
    one = _stats_arrays(stats)
    x = F.col(vec_col).cast("array<double>")
    codes = F.zip_with(
        x,
        F.zip_with(
            F.col("_los"), F.col("_his"), lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi"))
        ),
        lambda v, s: F.when(
            s["hi"] > s["lo"],
            F.round(F.lit(LEVELS) * (v - s["lo"]) / (s["hi"] - s["lo"]), 0).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return (
        df.crossJoin(F.broadcast(one))
        .withColumn(out_col, codes)
        .drop("_los", "_his")
    )


def dequantize(
    df: DataFrame,
    stats: DataFrame,
    *,
    codes_col: str = "codes",
    out_col: str = "approx",
) -> DataFrame:
    """Append ``out_col``: reconstructed double vector
    lo + code·(hi − lo)/LEVELS."""
    one = _stats_arrays(stats)
    approx = F.zip_with(
        F.col(codes_col),
        F.zip_with(
            F.col("_los"), F.col("_his"), lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi"))
        ),
        lambda c, s: s["lo"]
        + c.cast("double") * (s["hi"] - s["lo"]) / F.lit(LEVELS),
    )
    return (
        df.crossJoin(F.broadcast(one))
        .withColumn(out_col, approx)
        .drop("_los", "_his")
    )
