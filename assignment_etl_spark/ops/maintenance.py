"""Table maintenance: the OPTIMIZE operation of lakehouse table formats,
composed from the repo's own primitives — small-file compaction
(io/store.compact sizing) + multi-dimension z-order clustering
(ops/zorder) in ONE rewrite, swapped in atomically.

A streaming sink or partition-pruned upsert leaves a table fragmented
(per-batch files) and unclustered (arrival order); every scan then pays
per-file open costs and row-group min/max stats are useless for skipping.
``optimize_table`` fixes both with a single pass over the data: one scan,
one range exchange on the Morton key (or a plain repartition when no
z-order dims are given), one write — the same cost as compaction alone,
because the clustering rides the exchange compaction already pays for.

Scale: sizing comes from filesystem metadata (driver-side listing, no
job); the optional z-order stats pass is one min/max aggregation; the
rewrite never truncates the original before the replacement is durable
(``atomic_overwrite_parquet``). At 100 TB, run per partition directory.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

from assignment_etl_spark.io.store import atomic_overwrite_parquet
from assignment_etl_spark.ops.zorder import zorder_key, zorder_stats


def optimize_table(
    spark: SparkSession,
    path: str,
    *,
    zorder_by: list[str] | None = None,
    dims: dict[str, tuple[float, float]] | None = None,
    bits: int = 12,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Compact ``path`` to ceil(total_bytes / target) files, z-ordered on
    ``zorder_by`` when given (bucket bounds from ``dims`` or a one-pass
    min/max aggregation). Returns maintenance metrics; a no-op dict when
    the directory holds no parquet files."""
    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    if not files:
        return {"files_before": 0, "files_after": 0, "total_bytes": 0, "n_target": 0}
    total = sum(os.path.getsize(f) for f in files)
    n = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    if zorder_by:
        bounds = dims or zorder_stats(df, zorder_by)
        keyed = zorder_key(df, bounds, bits=bits)
        out = (
            keyed.repartitionByRange(n, "z_key")
            .sortWithinPartitions("z_key")
            .drop("z_key")
        )
    else:
        out = df.repartition(n)
    atomic_overwrite_parquet(out, path)
    after = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    return {
        "files_before": len(files),
        "files_after": len(after),
        "total_bytes": total,
        "n_target": n,
    }
