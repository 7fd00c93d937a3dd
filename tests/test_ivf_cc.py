"""IVF similarity search + connected-components dedup clustering."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.dedup import cluster_pairs, minhash_dedup_cc
from assignment_etl_spark.ext.similarity import (
    brute_force_topk,
    build_ivf_index,
    ivf_topk,
)


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )


def test_ivf_recall_improves_with_nprobe(spark, embeddings):
    assigned, centroids = build_ivf_index(embeddings, n_cells=8)
    assigned = assigned.persist()
    q = embeddings.filter(F.col("vec_id") < 30)
    exact = {r.query_id: r.neighbor_id for r in brute_force_topk(q, embeddings, 1).collect()}

    def recall(nprobe):
        approx = {
            r.query_id: r.neighbor_id
            for r in ivf_topk(q, assigned, centroids, 1, nprobe=nprobe).collect()
        }
        return sum(1 for qid, n in approx.items() if exact.get(qid) == n) / len(exact)

    r2, r8 = recall(2), recall(8)
    assert r8 >= r2  # monotone in probed cells
    assert r8 == 1.0  # nprobe == n_cells ≡ exact search


def test_ivf_partial_probe_recall(spark, embeddings):
    assigned, centroids = build_ivf_index(embeddings, n_cells=8)
    q = embeddings.filter(F.col("vec_id") < 30)
    exact = {r.query_id: r.neighbor_id for r in brute_force_topk(q, embeddings, 1).collect()}
    approx = {
        r.query_id: r.neighbor_id
        for r in ivf_topk(q, assigned, centroids, 1, nprobe=4).collect()
    }
    hits = sum(1 for qid, n in approx.items() if exact.get(qid) == n)
    assert hits / len(exact) >= 0.5  # half the budget, decent recall


def test_cluster_pairs_chain(spark):
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (8, 9), (7, 9)], "id_a long, id_b long"
    )
    comps = {r.node: r.cluster for r in cluster_pairs(pairs).collect()}
    assert comps[0] == comps[1] == comps[2] == 0  # transitive chain
    assert comps[5] == comps[6] == 5
    assert comps[7] == comps[8] == comps[9] == 7
    assert len(comps) == 8


def test_minhash_dedup_cc_transitive(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches from "
        "the fence and the birds sing in the morning light across the meadow"
    )
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base.replace("morning", "evening")),   # near 0
            (2, base.replace("morning", "evening").replace("quick", "swift")),  # near 1
            (3, "entirely different text about query engines and shuffles and page faults"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in minhash_dedup_cc(docs, jaccard_threshold=0.5).collect()
    )
    assert 0 in kept and 3 in kept
    assert 1 not in kept  # chained into 0's component
    assert len(kept) <= 3


def test_signbit_cell_probe(spark):
    """Deterministic quantizer: cells follow the sign bits of the first
    components, and the probe join scores only same-cell pairs."""
    from pyspark.sql import functions as F

    from assignment_etl_spark.ext.similarity import cell_probe_topk, signbit_cell

    rows = [
        (0, [1.0, 1.0, 1.0, 0.0]),   # cell 7
        (1, [1.0, 1.0, 1.0, 1.0]),   # cell 7
        (2, [-1.0, 1.0, 1.0, 0.5]),  # cell 6
        (3, [-1.0, -1.0, -1.0, 0.1]),# cell 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cells = {
        r.vec_id: r.c
        for r in df.select("vec_id", signbit_cell(F.col("embedding"), 3).alias("c")).collect()
    }
    assert cells == {0: 7, 1: 7, 2: 6, 3: 0}
    out = cell_probe_topk(df, df, 3, n_bits=3).collect()
    pairs = {(r.query_id, r.neighbor_id) for r in out}
    # only the two cell-7 vectors see each other; 2 and 3 are alone
    assert pairs == {(0, 1), (1, 0)}


def test_pandas_topk_collect_guard(spark):
    """The bucket-local numpy scorer refuses a candidate side above the
    collect guard instead of silently OOMing the driver."""
    import pytest as _pytest

    from assignment_etl_spark.ext.similarity import brute_force_topk_pandas

    emb = spark.range(100).selectExpr(
        "id AS vec_id", "array(cast(id AS double), 1.0d) AS embedding"
    )
    with _pytest.raises(ValueError, match="max_candidates"):
        brute_force_topk_pandas(emb, emb, 3, max_candidates=10)
    # within the guard it still works
    out = brute_force_topk_pandas(emb.limit(4), emb.limit(8), 2, max_candidates=10)
    assert out.count() == 8
