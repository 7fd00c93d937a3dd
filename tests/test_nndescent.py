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


def test_beam_search_beats_one_hop_and_dedups(spark, blobs):
    from assignment_etl_spark.ext.nndescent import (
        beam_search_scored,
        knn_graph_beam_search,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(blobs, blobs, 4).collect()
    }
    q = blobs.filter(F.col("vec_id") % 30 == 0)
    qids = {r.vec_id for r in q.select("vec_id").collect()}
    exact_q = {(a, b) for a, b in exact if a in qids}
    g = build_knn_graph(blobs, k=4, rounds=1)

    one_hop = {
        (r.query_id, r.neighbor_id)
        for r in knn_graph_expand_search(q, blobs, g, 4).collect()
    }
    beam = knn_graph_beam_search(q, blobs, g, 4, beam=8, hops=2).collect()
    beam_set = {(r.query_id, r.neighbor_id) for r in beam}
    assert len(beam_set) == len(beam), "no duplicate answers per query"
    # per-query ranks are 1..k, ties deterministic
    for r in beam:
        assert 1 <= r.rank <= 4
    one_recall = len(one_hop & exact_q) / len(exact_q)
    beam_recall = len(beam_set & exact_q) / len(exact_q)
    assert beam_recall >= one_recall
    assert beam_recall > 0.9  # separated blobs: beam must nearly solve it

    # each (query, candidate) pair is scored AT MOST once (the anti-join
    # dedup — total exact-distance work is bounded)
    scored = beam_search_scored(q, blobs, g, beam=8, hops=2)
    n = scored.count()
    assert n == scored.select("query_id", "cand").distinct().count()


def test_beam_search_hops0_equals_seed_ranking(spark, blobs):
    from assignment_etl_spark.ext.nndescent import knn_graph_beam_search

    q = blobs.filter(F.col("vec_id") % 30 == 0)
    g = build_knn_graph(blobs, k=4, rounds=0)
    got = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in knn_graph_beam_search(q, blobs, g, 4, beam=4, hops=0).collect()
    )
    seed = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in cell_multiprobe_topk(q, blobs, 4, n_bits=4, hamming=1).collect()
    )
    assert got == seed


def test_beam_search_validation(spark, blobs):
    from assignment_etl_spark.ext.nndescent import knn_graph_beam_search

    g = build_knn_graph(blobs, k=4, rounds=0)
    with pytest.raises(ValueError, match="k >= 1"):
        knn_graph_beam_search(blobs, blobs, g, 0)
    with pytest.raises(ValueError, match="hops >= 0"):
        knn_graph_beam_search(blobs, blobs, g, 3, hops=-1)
    with pytest.raises(ValueError, match="beam >= 1"):
        knn_graph_beam_search(blobs, blobs, g, 3, beam=-2)


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


def test_salted_seed_bounds_hot_cells_and_recall_recovers(spark, blobs):
    """Skew-proof seeding (r9): with a cell_cap smaller than the hot
    cells, each (query, probed-cell) pair scores at most ~cap
    candidates, and a refine round recovers the recall the bucket
    sampling gave up — the graph family's answer to data-dependent
    sign-bit skew. With a cap larger than every cell, the salted join
    degenerates to the unsalted one edge-for-edge."""
    from assignment_etl_spark.ext.nndescent import _salted_cell_seed
    from assignment_etl_spark.ext.similarity import brute_force_topk

    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(blobs, blobs, 4).collect()
    }
    # cap >= any cell -> identical to the unsalted multiprobe seed
    salted_big = _salted_cell_seed(
        blobs, 4, id_col="vec_id", vec_col="embedding", n_bits=4, cell_cap=10_000
    ).withColumn("cos_sim", F.round("cos_sim", 6))  # build_knn_graph's rounding
    unsalted = build_knn_graph(blobs, k=4, rounds=0, init_bits=4)
    assert sorted(map(tuple, salted_big.collect())) == sorted(
        map(tuple, unsalted.collect())
    )
    # tight cap: seed loses some recall, one refine round recovers it
    capped = build_knn_graph(blobs, k=4, rounds=0, init_bits=4, cell_cap=8)
    refined = build_knn_graph(blobs, k=4, rounds=2, init_bits=4, cell_cap=8)
    r_capped = _graph_recall(capped.select("src", "dst"), exact)
    r_refined = _graph_recall(refined.select("src", "dst"), exact)
    assert r_refined > r_capped
    assert r_refined >= 0.9


def test_salted_seed_cosines_match_expression_cosine(spark, blobs):
    """The salted seed's bucket-local BLAS scoring (cogrouped
    applyInPandas) produces the same cosine values the expression path
    would, to fp noise: recompute exact cosine for every returned edge
    with the zip_with/aggregate expression and compare. The production
    and gate paths differ only in evaluation engine, not in math."""
    from assignment_etl_spark.ext.nndescent import _salted_cell_seed
    from assignment_etl_spark.ext.similarity import cosine

    seed = _salted_cell_seed(
        blobs, 4, id_col="vec_id", vec_col="embedding", n_bits=4, cell_cap=16
    )
    a = blobs.select(F.col("vec_id").alias("src"), F.col("embedding").alias("_a"))
    b = blobs.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("_b"))
    checked = (
        seed.join(a, "src")
        .join(b, "dst")
        .select(
            "src",
            "dst",
            "cos_sim",
            cosine(F.col("_a"), F.col("_b")).alias("expr_cos"),
        )
    )
    n = checked.count()
    assert n > 0
    bad = checked.filter(
        F.abs(F.col("cos_sim") - F.col("expr_cos")) > F.lit(1e-9)
    ).count()
    assert bad == 0


def test_materialize_knn_graph_roundtrip_and_search(spark, blobs, tmp_path):
    """The persisted-graph artifact (VERDICT r8 ask #1): the parquet
    edge table round-trips the built graph bit-identically, and
    beam search over the SCAN returns exactly what searching the
    in-memory graph returns — build-once/search-many is lossless."""
    from assignment_etl_spark.ext.nndescent import (
        knn_graph_beam_search,
        materialize_knn_graph,
    )

    p = str(tmp_path / "graph")
    stored = materialize_knn_graph(blobs, p, k=4, rounds=1)
    direct = build_knn_graph(blobs, k=4, rounds=1)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, direct.collect())
    )
    queries = blobs.filter(F.col("vec_id") % 60 == 0)
    via_store = knn_graph_beam_search(
        queries, blobs, stored, 4, beam=3, hops=2
    )
    via_direct = knn_graph_beam_search(
        queries, blobs, direct, 4, beam=3, hops=2
    )
    assert sorted(map(tuple, via_store.collect())) == sorted(
        map(tuple, via_direct.collect())
    )


def test_salt_portable_same_dataflow_degenerates_identically(spark, blobs):
    """The gate flavor (salt_portable=True, VERDICT r9 ask #1) changes
    ONLY the salt hash: with cell_cap >= every cell (splits == 1
    everywhere, salt identically 0 under either hash) it is
    edge-for-edge the unsalted seed; with a tight cap it still yields
    up to k well-formed edges per src with the standard tie rule."""
    from assignment_etl_spark.ext.nndescent import _salted_cell_seed

    a = _salted_cell_seed(
        blobs, 4, id_col="vec_id", vec_col="embedding",
        n_bits=4, cell_cap=10_000, salt_portable=True,
    )
    b = _salted_cell_seed(
        blobs, 4, id_col="vec_id", vec_col="embedding",
        n_bits=4, cell_cap=10_000, salt_portable=False,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    tight = build_knn_graph(
        blobs, k=4, rounds=0, init_bits=4, cell_cap=8, salt_portable=True
    ).collect()
    assert tight
    per_src = {}
    for r in tight:
        per_src.setdefault(r.src, []).append((r.rank, r.dst))
    for src, edges in per_src.items():
        ranks = sorted(rk for rk, _ in edges)
        assert ranks == list(range(1, len(edges) + 1))
        assert len(edges) <= 4
