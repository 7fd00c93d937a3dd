"""Cross-source duplication overlap: which corpus sources copy from
which.

Mixture design for a training corpus needs the SOURCE-pair view of
exact duplication, not just the global dedup rate: if 40% of source B
is already inside source A, B's effective token contribution (and the
right mixture weight) is very different from its raw size. This module
computes the full pairwise overlap matrix — distinct fingerprints per
source, shared fingerprints per source pair, and the pairwise Jaccard —
in three aggregates and one self-equi-join on the fingerprint key.

Dataflow: (fingerprint, source) pairs → distinct (one corpus pass; the
fingerprint is the 64-bit ext/text.fingerprint, so no text shuffles) →
per-source distinct counts + a fingerprint-key self-join restricted to
source_a < source_b → per-pair distinct counts. The join key is the
fingerprint — uniform by construction; per-fingerprint fan-out is
bounded by the number of sources (a small constant), so the join output
is at most C(n_sources, 2) × shared-fingerprint rows, never all-pairs
of documents. Output is exactly C(n_sources, 2) rows — every source
pair, INCLUDING zero-overlap pairs (n_shared = 0, jaccard = 0), so a
caller can distinguish "no overlap" from "not computed" (ADVICE r5) —
dashboard-sized at any corpus scale.

Determinism: counts are exact; Jaccard is one integer division rounded
to ``round_to``. The oracle replays equality classes on the NORMALIZED
TEXT itself (hash equality = text equality modulo 64-bit collisions),
so the gate is engine-portable without replicating xxhash64.

Reference parity note: the reference repo has no corpus surface; this
extends the ext/dedup.py family (gate ``source_overlap_matrix``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.ext.text import fingerprint


def source_overlap_matrix(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """(source_a, source_b, n_a, n_b, n_shared, jaccard) for EVERY
    source pair with source_a < source_b — zero-overlap pairs included
    (n_shared = 0, jaccard = 0). ``n_a``/``n_b`` are distinct
    fingerprints per source; ``n_shared`` distinct fingerprints present
    in both; ``jaccard`` = n_shared / (n_a + n_b − n_shared). The pair
    scaffold is a self-join of the per-source count table (n_sources
    rows — broadcast-sized), never of the corpus."""
    fp = (
        # NULL text is excluded, not fingerprinted: xxhash64(NULL) is the
        # SEED (a real value), so unfiltered NULLs would register as one
        # shared "document" across every source that has any
        docs.filter(F.col(text_col).isNotNull())
        .select(
            fingerprint(F.col(text_col)).alias("_fp"),
            F.col(source_col).alias("_src"),
        )
        .distinct()
    )
    per_source = fp.groupBy("_src").agg(F.count(F.lit(1)).alias("n_fp"))
    a = fp.select(F.col("_fp"), F.col("_src").alias("source_a"))
    b = fp.select(F.col("_fp"), F.col("_src").alias("source_b"))
    shared = (
        a.join(b, on="_fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # pair scaffold from the tiny per-source table, so zero-overlap pairs
    # are emitted explicitly instead of silently dropped by the inner join
    pairs = (
        per_source.select(
            F.col("_src").alias("source_a"), F.col("n_fp").alias("n_a")
        )
        .join(
            F.broadcast(
                per_source.select(
                    F.col("_src").alias("source_b"),
                    F.col("n_fp").alias("n_b"),
                )
            ),
            on=F.col("source_a") < F.col("source_b"),
        )
    )
    return (
        pairs.join(F.broadcast(shared), on=["source_a", "source_b"], how="left")
        .withColumn("n_shared", F.coalesce("n_shared", F.lit(0)))
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                round_to,
            ).alias("jaccard"),
        )
    )
