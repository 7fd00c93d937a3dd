"""NN-descent k-NN graph (ext/nndescent.py): recall improves monotonically
with rounds on clustered data, construction is partition-deterministic,
and graph-expanded search beats quantizer-only search."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.nndescent import (
    build_knn_graph,
    knn_graph_expand_search,
)
from assignment_etl_spark.ext.similarity import (
    brute_force_topk,
    cell_multiprobe_topk,
)


@pytest.fixture(scope="module")
def blobs(spark):
    # 8 well-separated 8-dim blobs x 30 points, deterministic offsets
    rows = []
    for c in range(8):
        center = [3.0 if j == c else 0.0 for j in range(8)]
        for i in range(30):
            vid = c * 30 + i
            vec = [
                center[j] + ((vid * 31 + j * 7) % 11 - 5) / 25.0
                for j in range(8)
            ]
            rows.append((vid, vec, c))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).persist()


def _graph_recall(graph, exact_set):
    got = {(r.src, r.dst) for r in graph.collect()}
    return len(got & exact_set) / len(exact_set)


def test_rounds_improve_recall(spark, blobs):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(blobs, blobs, 4).collect()
    }
    r0 = _graph_recall(build_knn_graph(blobs, k=4, rounds=0), exact)
    r2 = _graph_recall(build_knn_graph(blobs, k=4, rounds=2), exact)
    assert r2 >= r0
    assert r2 > 0.85  # separated blobs: descent must nearly solve it


def test_deterministic_across_partitionings(spark, blobs):
    a = build_knn_graph(blobs.repartition(3), k=4, rounds=1)
    b = build_knn_graph(blobs.repartition(17), k=4, rounds=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_expand_search_beats_seed_only(spark, blobs):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(blobs, blobs, 4).collect()
    }
    q = blobs.filter(F.col("vec_id") % 30 == 0)  # one query per blob
    qids = {r.vec_id for r in q.select("vec_id").collect()}
    exact_q = {(a, b) for a, b in exact if a in qids}

    seed_only = {
        (r.query_id, r.neighbor_id)
        for r in cell_multiprobe_topk(q, blobs, 4, n_bits=4, hamming=1).collect()
    }
    g = build_knn_graph(blobs, k=4, rounds=2)
    expanded = {
        (r.query_id, r.neighbor_id)
        for r in knn_graph_expand_search(q, blobs, g, 4).collect()
    }
    seed_recall = len(seed_only & exact_q) / len(exact_q)
    exp_recall = len(expanded & exact_q) / len(exact_q)
    assert exp_recall >= seed_recall


def test_validation(spark, blobs):
    with pytest.raises(ValueError, match="k >= 1"):
        build_knn_graph(blobs, k=0)
    with pytest.raises(ValueError, match="rounds >= 0"):
        build_knn_graph(blobs, k=3, rounds=-1)


def test_uncheckpointed_build_passes_hint_audit(spark, blobs):
    """checkpoint_rounds=False keeps the full lineage visible, so the
    broadcast-hint audit can inspect every join inside the rounds (the
    checkpointed production path truncates the plan at LogicalRDDs)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.plan_audit import audit_broadcast_hints

    g = build_knn_graph(blobs, k=4, rounds=2, checkpoint_rounds=False)
    assert audit_broadcast_hints(g) == []
    # and the uncheckpointed build returns the identical graph
    a = sorted(map(tuple, g.collect()))
    b = sorted(map(tuple, build_knn_graph(blobs, k=4, rounds=2).collect()))
    assert a == b
