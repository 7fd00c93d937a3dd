"""Z-order clustering (ops/zorder.py): Morton-code correctness against a
Python reference, and the actual data-skipping claim — parquet row-group
min/max hyper-rectangles must shrink vs an unclustered write."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ops.zorder import (
    interleave_bits,
    write_zordered,
    zorder_key,
    zorder_stats,
)


def _morton_ref(x: int, y: int, bits: int) -> int:
    out = 0
    for j in range(bits):
        out |= ((x >> j) & 1) << (2 * j)
        out |= ((y >> j) & 1) << (2 * j + 1)
    return out


def test_interleave_matches_python_reference(spark):
    rows = [(x, y) for x in range(0, 256, 37) for y in range(0, 256, 41)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", interleave_bits([F.col("x"), F.col("y")], bits=8).alias("z")
    ).collect()
    for r in got:
        assert r.z == _morton_ref(r.x, r.y, 8)


def test_zorder_key_clamps_and_nulls(spark):
    df = spark.createDataFrame(
        [(0, -5.0, 50.0), (1, 2000.0, 50.0), (2, None, 50.0)],
        "id long, a double, b double",
    )
    out = {r.id: r.z_key for r in zorder_key(df, {"a": (0, 1000), "b": (0, 1000)}, bits=8).collect()}
    # a clamps to bucket 0 / 255; null a -> bucket 0; b identical everywhere
    assert out[0] == out[2]
    assert out[1] > out[0]


def test_interleave_rejects_key_overflow(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError):
        df.select(interleave_bits([F.col("x"), F.col("y")], bits=32))


def test_zorder_stats_roundtrip(spark):
    df = spark.createDataFrame([(0.0, 10.0), (5.0, 20.0)], "a double, b double")
    assert zorder_stats(df, ["a", "b"]) == {"a": (0.0, 5.0), "b": (10.0, 20.0)}


def test_row_group_hyperrectangles_shrink(spark, tmp_path):
    """The point of z-ordering: per-file min/max spans on BOTH dimensions
    are tight, so multi-dim predicates skip files/row-groups. Compare the
    mean normalized span area of (user_id, value) per output file for a
    z-ordered write vs the natural (event_id-ordered) write."""
    import pyarrow.parquet as pq

    events = spark.range(0, 20000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 97 * 131 % 1000).cast("double").alias("user_id"),
        (F.col("id") * 7919 % 1000).cast("double").alias("value"),
    )
    dims = {"user_id": (0.0, 1000.0), "value": (0.0, 1000.0)}

    plain_path, z_path = str(tmp_path / "plain"), str(tmp_path / "zord")
    events.repartitionByRange(8, "event_id").write.parquet(plain_path)
    write_zordered(events, z_path, dims, bits=8)

    def mean_area(path):
        import glob

        areas = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                stats = {}
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in dims and col.statistics is not None:
                        stats[name] = col.statistics.max - col.statistics.min
                if len(stats) == 2:
                    areas.append((stats["user_id"] / 1000.0) * (stats["value"] / 1000.0))
        assert areas
        return sum(areas) / len(areas)

    # z-ordering must shrink the mean query-space rectangle substantially
    assert mean_area(z_path) < 0.5 * mean_area(plain_path)
