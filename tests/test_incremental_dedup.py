"""Incremental ingest dedup against a fingerprint store (ext/dedup.py)."""

from pyspark.sql import functions as F

from assignment_etl_spark.ext.dedup import exact_dedup, incremental_dedup
from assignment_etl_spark.ext.text import fingerprint


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_within_batch_keep_first_and_store_anti(spark):
    store_docs = _docs(spark, [(1, "alpha beta"), (2, "gamma")])
    store = store_docs.select(fingerprint(F.col("text")).alias("fp"))
    batch = _docs(
        spark,
        [
            (10, "ALPHA  beta"),   # dup of store doc 1 (normalized)
            (11, "delta"),          # new
            (12, "delta"),          # within-batch dup of 11
            (13, "epsilon"),        # new
        ],
    )
    survivors, delta = incremental_dedup(batch, store)
    assert sorted(r.doc_id for r in survivors.collect()) == [11, 13]
    # the delta is exactly the survivors' fingerprints, ready to append
    got = {r.fp for r in delta.collect()}
    want = {
        r.fp
        for r in _docs(spark, [(0, "delta"), (0, "epsilon")])
        .select(fingerprint(F.col("text")).alias("fp"))
        .collect()
    }
    assert got == want


def test_no_store_degenerates_to_exact_dedup(spark):
    batch = _docs(spark, [(1, "a"), (2, "a"), (3, "b")])
    survivors, _ = incremental_dedup(batch, None)
    assert sorted(r.doc_id for r in survivors.collect()) == sorted(
        r.doc_id for r in exact_dedup(batch).collect()
    )


def test_two_batch_chain_equals_one_shot(spark):
    """Splitting an ingest into two incremental batches must equal a
    single exact_dedup over the concatenation (keep-first by id, ids
    aligned with batch order)."""
    b1 = _docs(spark, [(1, "x"), (2, "y"), (3, "x")])
    b2 = _docs(spark, [(4, "y"), (5, "z"), (6, "z")])
    s1, d1 = incremental_dedup(b1, None)
    s2, d2 = incremental_dedup(b2, d1)
    chained = sorted(
        r.doc_id for r in s1.select("doc_id").union(s2.select("doc_id")).collect()
    )
    oneshot = sorted(r.doc_id for r in exact_dedup(b1.union(b2)).collect())
    assert chained == oneshot == [1, 2, 5]
