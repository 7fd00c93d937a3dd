"""PageRank (ext/graph.py): fixed-point sanity on known graphs, decimal
determinism, dangling variant semantics."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.graph import degrees, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_symmetric_cycle_stays_uniform(spark):
    # a→b→c→a: uniform 1/3 is the exact fixed point, so 3 iterations
    # must return (1-d)/3 + d*(1/3) = 1/3 at every node
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    got = {r.node: r.rank for r in pagerank(e, iters=3).collect()}
    third = Decimal("0.333333333333")
    assert set(got) == {"a", "b", "c"}
    for v in got.values():
        assert abs(v - third) <= Decimal("0.000000000002"), got


def test_hub_receives_more_rank(spark):
    # star into 'hub': hub must outrank every leaf; leaves equal by symmetry
    e = _edges(
        spark,
        [("x", "hub"), ("y", "hub"), ("z", "hub"), ("hub", "x")],
    )
    got = {r.node: r.rank for r in pagerank(e, iters=3).collect()}
    assert got["hub"] > got["x"]
    assert got["y"] == got["z"]  # exact equality: decimal arithmetic


def test_deterministic_across_partitionings(spark):
    import random

    pairs = [
        (f"n{random.Random(i).randrange(20)}", f"n{random.Random(i + 999).randrange(20)}")
        for i in range(200)
    ]
    e1 = _edges(spark, pairs).repartition(1)
    e2 = _edges(spark, pairs).repartition(13)
    r1 = sorted(map(tuple, pagerank(e1, iters=3).collect()))
    r2 = sorted(map(tuple, pagerank(e2, iters=3).collect()))
    assert r1 == r2  # decimal sums: partitioning cannot change results


def test_dangling_mass_leaks_by_design(spark):
    # b is a sink: total rank < 1 after an iteration (documented variant)
    e = _edges(spark, [("a", "b")])
    total = pagerank(e, iters=2).agg(F.sum("rank")).first()[0]
    assert total < 1


def test_degrees(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c")])
    got = {r.node: (r.out_deg, r.in_deg) for r in degrees(e).collect()}
    assert got == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}


def test_checkpoint_every_preserves_values(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    plain = sorted(map(tuple, pagerank(e, iters=4).collect()))
    ck = sorted(map(tuple, pagerank(e, iters=4, checkpoint_every=2).collect()))
    assert plain == ck


def test_min_label_rounds_converges_to_components(spark):
    from assignment_etl_spark.ext.graph import min_label_rounds

    # two components: {a,b,c,d} chained (diameter 3) and {x,y}
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")])
    got = {r.node: r.label for r in min_label_rounds(e, rounds=3).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_min_label_fixed_rounds_are_partial(spark):
    from assignment_etl_spark.ext.graph import min_label_rounds

    # chain a-b-c-d: after ONE synchronous round d only sees c
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {r.node: r.label for r in min_label_rounds(e, rounds=1).collect()}
    assert got == {"a": "a", "b": "a", "c": "b", "d": "c"}


def test_min_label_deterministic_across_partitionings(spark):
    from assignment_etl_spark.ext.graph import min_label_rounds

    pairs = [(f"n{(i * 3) % 40}", f"n{(i * 7 + 1) % 40}") for i in range(60)]
    r1 = sorted(map(tuple, min_label_rounds(_edges(spark, pairs).repartition(1), rounds=4).collect()))
    r2 = sorted(map(tuple, min_label_rounds(_edges(spark, pairs).repartition(11), rounds=4).collect()))
    assert r1 == r2


def test_triangle_count(spark):
    from assignment_etl_spark.ext.graph import triangle_count

    # K4 minus one edge = 2 triangles; edges given noisily (reverse
    # duplicates + a self-loop) to exercise canonicalization
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (3, 4), (2, 2)],
        "src long, dst long",
    )
    r = triangle_count(edges).collect()[0]
    assert r.n_triangles == 2   # {1,2,3} and {1,3,4}
    assert r.n_edges == 5       # canonical simple edges
    # true path-of-length-2 count Σ C(deg,2): degs 1:3,2:2,3:3,4:2 -> 3+1+3+1
    assert r.n_wedges == 8


def test_triangle_count_star_graph(spark):
    from assignment_etl_spark.ext.graph import triangle_count

    # star: no triangles, but C(3,2)=3 wedges centered at the hub — the
    # ordered-wedge join alone would report 0
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "src long, dst long"
    )
    r = triangle_count(edges).collect()[0]
    assert (r.n_triangles, r.n_edges, r.n_wedges) == (0, 3, 3)


def test_khop_reachable(spark):
    from assignment_etl_spark.ext.graph import khop_reachable

    # path 1->2->3->4->5 plus a shortcut 1->4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {
        r.node: r.min_hops
        for r in khop_reachable(edges, seeds, k=3).collect()
    }
    # min_hops, not any-hops: node 4 is 1 hop via the shortcut
    assert out == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


# --- HITS (ext/graph.hits) -------------------------------------------------


def test_hits_star(spark):
    # x,y,z → hub: 'hub' is the sole authority (auth 1 after L1 norm),
    # x/y/z are equal hubs at 1/3, and the authority's own hub score is 0
    e = _edges(spark, [("x", "hub"), ("y", "hub"), ("z", "hub")])
    from assignment_etl_spark.ext.graph import hits

    got = {r.node: r for r in hits(e, iters=2).collect()}
    assert set(got) == {"x", "y", "z", "hub"}
    assert float(got["hub"].auth) == pytest.approx(1.0, abs=1e-9)
    assert float(got["hub"].hub) == 0.0
    for leaf in ("x", "y", "z"):
        assert float(got[leaf].auth) == 0.0
        assert float(got[leaf].hub) == pytest.approx(1 / 3, abs=1e-9)


def test_hits_l1_norms_sum_to_one(spark):
    e = _edges(
        spark,
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")],
    )
    from assignment_etl_spark.ext.graph import hits

    rows = hits(e, iters=2).collect()
    assert sum(float(r.hub) for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert sum(float(r.auth) for r in rows) == pytest.approx(1.0, abs=1e-9)


def test_hits_distinguishes_hubs_from_authorities(spark):
    # a cites everything (pure hub); p is cited by everyone (pure authority);
    # HITS must rank a top on hub and p top on auth — PageRank on this
    # graph would rank only p (in-link blind spot is what HITS fixes)
    e = _edges(
        spark,
        [("a", "p"), ("a", "q"), ("b", "p"), ("c", "p")],
    )
    from assignment_etl_spark.ext.graph import hits

    got = {r.node: r for r in hits(e, iters=2).collect()}
    best_hub = max(got.values(), key=lambda r: float(r.hub)).node
    best_auth = max(got.values(), key=lambda r: float(r.auth)).node
    assert best_hub == "a"
    assert best_auth == "p"


def test_hits_checkpointed_matches_uncheckpointed(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    from assignment_etl_spark.ext.graph import hits

    plain = sorted(map(tuple, hits(e, iters=2).collect()))
    ckpt = sorted(map(tuple, hits(e, iters=2, checkpoint_every=1).collect()))
    assert plain == ckpt
