"""Z-order (Morton) clustering for multi-column data skipping.

Directory partitioning prunes on ONE column hierarchy; a table queried by
several independent dimensions (user_id AND time, lat AND lon) wants rows
clustered so parquet row-group min/max stats are tight on *all* of them.
Sorting by the interleaved-bit Morton code of the dimensions gives every
row group a small hyper-rectangle of the key space — the technique Delta
Lake's OPTIMIZE ZORDER BY applies; here it is a pure-expression sort key
any parquet writer can use.

Everything is native integer expressions (shiftleft/or over per-dimension
rank buckets), so the z-value is portable across engines and the sort is
one range-partitioned exchange — the same cost as any global sort, paid
once at write time, repaid on every multi-dimension scan.

Scale note: dimension normalization uses equal-width buckets over a
caller-supplied (min, max) per column — supply them from table stats; the
optional stats pass is one min/max aggregation. ``bits`` per dimension
bounds the code at bits×ndims ≤ 63 so the key stays a BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Equal-width bucket index in [0, 2^bits - 1], nulls to bucket 0."""
    n = 1 << bits
    width = (F.lit(float(hi)) - F.lit(float(lo))) / F.lit(float(n))
    idx = F.floor((col.cast("double") - F.lit(float(lo))) / width)
    return F.coalesce(
        F.least(F.greatest(idx, F.lit(0)), F.lit(n - 1)), F.lit(0)
    ).cast("long")


def interleave_bits(buckets: list[Column], bits: int) -> Column:
    """Morton code: bit j of dimension d lands at position j*ndims + d."""
    ndims = len(buckets)
    if bits * ndims > 63:
        raise ValueError(f"{bits} bits x {ndims} dims exceeds a signed 64-bit key")
    out = F.lit(0).cast("long")
    for d, b in enumerate(buckets):
        for j in range(bits):
            # extract bit j of this dimension's bucket, place at j*ndims+d
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, j * ndims + d))
    return out


def zorder_key(
    df: DataFrame,
    dims: dict[str, tuple[float, float]],
    *,
    bits: int = 16,
    out_col: str = "z_key",
) -> DataFrame:
    """Append the Morton key for ``dims`` ({column: (min, max)})."""
    cols = [_bucket(F.col(c), lo, hi, bits) for c, (lo, hi) in dims.items()]
    return df.withColumn(out_col, interleave_bits(cols, bits))


def zorder_stats(df: DataFrame, columns: list[str]) -> dict[str, tuple[float, float]]:
    """One min/max aggregation pass supplying the dims for zorder_key."""
    aggs = []
    for c in columns:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
        ]
    row = df.agg(*aggs).first()
    return {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in columns}


def write_zordered(
    df: DataFrame,
    path: str,
    dims: dict[str, tuple[float, float]],
    *,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Sort by the Morton key (one range exchange) and write parquet whose
    row-group min/max stats are tight on every dimension in ``dims``."""
    keyed = zorder_key(df, dims, bits=bits)
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (
        keyed.repartitionByRange(n, "z_key")
        .sortWithinPartitions("z_key")
        .drop("z_key")
        .write.mode(mode)
        .parquet(path)
    )
