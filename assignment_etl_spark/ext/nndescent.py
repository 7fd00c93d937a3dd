"""k-NN graph construction by NN-descent (Dong, Moses & Li, WWW 2011) —
the graph-based ANN family (HNSW et al.) re-expressed for a shared-
nothing engine.

HNSW itself is a sequential, pointer-chasing structure a distributed
dataflow cannot build or search efficiently; what production Spark
pipelines build instead is the k-NN GRAPH it navigates, via NN-descent's
one insight: *a neighbor of a neighbor is likely a neighbor*. Each
round, every node offers its current neighbors to each other as
candidates (one self-equi-join on the edge list), candidates are scored
exactly, and each node keeps its best k — converging to the true k-NN
graph in a few rounds regardless of corpus size.

Spark-first design, no iteration over rows, no driver state:

- INIT is not random (a random seed needs a global id→index map — a
  100 TB anti-pattern): the sign-bit cell graph
  (ext/similarity.cell_multiprobe_topk) seeds each node with good-ish
  neighbors from ONE equi-join, and NN-descent repairs cell-boundary
  losses in the refine rounds.
- Each ROUND is: edge⋈edge on the shared source (bounded ×k² candidate
  explosion, k is small), union with current edges, attach the two
  endpoint vectors (joins on well-distributed ids), exact cosine, and a
  per-node top-k window. Everything shuffles on node ids — never a
  cross join, never a collect.
- DETERMINISM: ranking orders by (cos_sim DESC, neighbor_id); rounds
  are a fixed unrolled composition, so a SQL engine replays the whole
  construction (gate ``knn_graph_nndescent`` unrolls init + rounds in
  DuckDB).

The finished graph serves kNN-graph workloads directly (graph-based
dedup, KNN-Shapley pruning, label propagation) and answers ANN queries
via "seed from the quantizer, expand one hop over the graph" — both
pure joins. Recall vs the exact graph is measured in tools/ann_eval.py.

Reference parity note: no reference counterpart; this closes the
graph-ANN item from the round-4 review (IVF/LSH/multiprobe already
certified; this adds the graph family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from assignment_etl_spark.ext.similarity import (
    bucket_topk_scorer,
    cell_multiprobe_topk,
    dot,
    l2_norm,
    signbit_cell,
)


def _top_k_edges(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("src").orderBy(
        F.desc("cos_sim"), F.col("dst")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "cos_sim", "rank")
    )


def refine_knn_graph(
    edges: DataFrame,
    emb: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: bool = True,
) -> DataFrame:
    """One NN-descent refine round over an existing (src, dst, ...) edge
    list: for each pivot v, every member of B(v) ∪ R(v) (neighbors AND
    reverse neighbors) proposes every other member — one symmetrized
    edge self-join on the pivot, exact re-score, per-node top-k.
    Forward-only propagation stalls at a much lower recall (measured:
    0.53 vs 0.95 on the same seed graph). ``checkpoint=False`` keeps
    the full lineage (plan-inspection/testing; production rounds
    checkpoint so plan depth stays constant)."""
    # norm hoisted per NODE (one O(dim) fold each); the inline cosine()
    # would re-run three interpreted folds per candidate PAIR, and this
    # loop proposes ~n*K^2 pairs per round (the similarity-module hoist,
    # applied here after the sf10 sweep put the graph build in the
    # watch band)
    vecs = emb.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_vn"),
    )
    undirected = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    e1 = undirected.select(F.col("src").alias("_via"), F.col("dst").alias("src"))
    e2 = undirected.select(F.col("src").alias("_via"), F.col("dst").alias("dst"))
    proposals = (
        e1.join(e2, on="_via")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )
    cand = edges.select("src", "dst").unionByName(proposals).distinct()
    scored = (
        cand.join(vecs.withColumnRenamed("_vid", "src"), on="src")
        .withColumnRenamed("_v", "_sv")
        .withColumnRenamed("_vn", "_svn")
        .join(vecs.withColumnRenamed("_vid", "dst"), on="dst")
        .select(
            "src",
            "dst",
            (dot(F.col("_sv"), F.col("_v")) / (F.col("_svn") * F.col("_vn"))).alias("cos_sim"),
        )
    )
    out = _top_k_edges(scored, k)
    return out.localCheckpoint(eager=True) if checkpoint else out


def _salted_cell_seed(
    emb: DataFrame,
    k: int,
    *,
    id_col: str,
    vec_col: str,
    n_bits: int,
    cell_cap: int,
    salt_portable: bool = False,
) -> DataFrame:
    """Skew-proof seed graph: the sign-bit cell join with OVERSIZED
    cells split into ~``cell_cap``-member salt buckets. Sign-bit cells
    are data-dependent — real embedding distributions concentrate, and
    one hot cell's |cell|² pairs dominate the whole seed stage as a
    straggler task (measured at sf10: one task of 32 carried the
    build). Each vector lands in ONE deterministic bucket of its cell
    (xxhash64(id) pmod splits) and each (query, probed-cell) pair
    scores one bucket of that cell, so per-query candidate work is
    bounded by probes × cell_cap REGARDLESS of how skewed the cells
    are. The seed sees a bucket-sample of hot cells instead of all
    members — exactly the repair NN-descent's refine rounds exist for
    (same argument as the cell-boundary losses of the unsalted seed).

    ``salt_portable=True`` swaps the xxhash64 salt for the repo's
    PORTABLE_P polynomial family (assignment_etl_spark/portable.py) so
    a DuckDB oracle replays the bucketing bit-for-bit — the SAME
    salted-join + bucket-BLAS-scorer dataflow, only the salt hash
    differs (the minhash_lsh_pairs gate precedent). Production keeps
    xxhash64: adversarial/clustered ids call for a real mixer.

    Returns (src, dst, cos_sim, rank) like cell_multiprobe_topk."""
    from assignment_etl_spark.portable import ADD_B, MULT_A, PRIME_P

    if salt_portable:
        # ((x mod P) * A + B [+ cell]) mod P, all inside int64 — the
        # cross-engine-replayable family; cell folds in so a query's
        # bucket choice still varies across its probes
        def cand_salt():
            h = ((F.col("_cid") % F.lit(PRIME_P)) * F.lit(MULT_A) + F.lit(ADD_B)) % F.lit(PRIME_P)
            return F.pmod(h, F.col("_splits"))

        def probe_salt():
            h = (
                (F.col("src") % F.lit(PRIME_P)) * F.lit(MULT_A)
                + F.lit(ADD_B)
                + F.col("_cell")
            ) % F.lit(PRIME_P)
            return F.pmod(h, F.col("_splits"))
    else:
        def cand_salt():
            return F.pmod(F.xxhash64(F.col("_cid")), F.col("_splits"))

        def probe_salt():
            return F.pmod(F.xxhash64(F.col("src"), F.col("_cell")), F.col("_splits"))

    sized = emb.groupBy(signbit_cell(F.col(vec_col), n_bits).alias("_cell")).agg(
        F.count(F.lit(1)).alias("_n")
    ).withColumn(
        "_splits", F.greatest(F.ceil(F.col("_n") / F.lit(cell_cap)), F.lit(1))
    ).select("_cell", "_splits")
    cand = (
        emb.select(
            F.col(id_col).alias("_cid"),
            F.col(vec_col).alias("_cv"),
            l2_norm(F.col(vec_col)).alias("_cn"),
            signbit_cell(F.col(vec_col), n_bits).alias("_cell"),
        )
        .join(F.broadcast(sized), on="_cell")
        .withColumn("_salt", cand_salt())
        .drop("_splits")
    )
    masks = [0] + [1 << i for i in range(n_bits)]  # home + hamming-1 probes
    probe = F.explode(F.array(*[F.lit(m) for m in masks])).alias("_mask")
    probes = (
        emb.select(
            F.col(id_col).alias("src"),
            F.col(vec_col).alias("_qv"),
            l2_norm(F.col(vec_col)).alias("_qn"),
            signbit_cell(F.col(vec_col), n_bits).alias("_home"),
        )
        .select("src", "_qv", "_qn", "_home", probe)
        .withColumn("_cell", F.col("_home").bitwiseXOR(F.col("_mask")))
        .join(F.broadcast(sized), on="_cell")
        # bucket choice varies with the probed cell so a query does not
        # always sample the same bucket index across its probes
        .withColumn("_salt", probe_salt())
        .select("src", "_qv", "_qn", "_cell", "_salt")
    )
    # Bucket-local BLAS scoring (cogrouped applyInPandas), NOT the
    # zip_with expression join: HOFs never codegen, and at sf10 the
    # pair relation is ~10^9 rows — the interpreted per-pair eval was
    # the measured straggler wall (jstack: ZipWith.eval/
    # ArrayAggregate.eval; one sf10 build repeat did not finish in
    # 55 min). Cogrouping ships each vector across Arrow once per
    # bucket and never materializes the pairs. Gate
    # knn_graph_salted_seed pins this exact dataflow (portable salt
    # flavor); fp summation order differs from the expression path
    # only below the gate's round-6 certification. Each
    # (probe-row, bucket) emits its local top-k; the global window
    # below merges ≤ probes×k rows per src.
    schema, score = bucket_topk_scorer(k)
    scored = (
        probes.groupBy("_cell", "_salt")
        .cogroup(cand.groupBy("_cell", "_salt"))
        .applyInPandas(score, schema=schema)
    )
    return _top_k_edges(scored, k)


def seed_bits_for(n_rows: int, *, target_cell: int = 1024, max_bits: int = 16) -> int:
    """Sign-bit count for the seed quantizer, scaled so the EXPECTED
    cell population stays ~``target_cell`` as the corpus grows. The
    seed graph's within-cell candidate join is Σ|cell|² — with a FIXED
    bit count, cell population grows linearly with the corpus and the
    seed join quadratically (measured: 16 cells over 200k vectors =
    2.5B seed pairs at the sf10 sweep). Doubling the cells per corpus
    doubling keeps the join linear; floor 4 preserves small-corpus
    behavior, cap ``max_bits`` bounds the probe fan-out."""
    import math

    if n_rows <= target_cell:
        return 4
    return max(4, min(max_bits, math.ceil(math.log2(n_rows / target_cell))))


def build_knn_graph(
    emb: DataFrame,
    *,
    k: int,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_bits: int | None = 4,
    round_to: int = 6,
    checkpoint_rounds: bool = True,
    cell_cap: int | None = None,
    salt_portable: bool = False,
) -> DataFrame:
    """Approximate k-NN graph: (src, dst, cos_sim, rank), up to k edges
    per node, refined through ``rounds`` NN-descent passes
    (:func:`refine_knn_graph`) from the sign-bit-cell seed graph.
    ``cos_sim`` is rounded to ``round_to`` AFTER ranking (ties rank by
    unrounded score then dst id, the repo's standard ANN contract).
    ``init_bits=None`` scales the seed quantizer with the corpus AND
    caps per-bucket cell population at 4× the target (the production
    setting — :func:`seed_bits_for` keeps the EXPECTED cell small,
    :func:`_salted_cell_seed` bounds the worst cell, because sign-bit
    cells on real embeddings are skewed and one hot cell's |cell|²
    otherwise carries the build as a straggler task). Explicit
    ``init_bits``/``cell_cap=None`` keep the unsalted join; with a
    ``cell_cap``, ``salt_portable=True`` runs the salted seed on the
    DuckDB-replayable polynomial salt so the production dataflow
    (salted buckets + BLAS scorer) is itself oracle-gated
    (``knn_graph_salted_seed``).
    Note the eager per-round checkpoints mean CONSTRUCTING this
    DataFrame runs the build when ``rounds > 0`` and
    ``checkpoint_rounds`` is on — pass ``checkpoint_rounds=False`` for
    plan inspection (the broadcast-hint audit sees the full lineage
    that way; tests/test_nndescent.py pins the uncheckpointed plan
    clean)."""
    if k < 1 or rounds < 0:
        raise ValueError(f"need k >= 1 and rounds >= 0, got k={k} rounds={rounds}")
    if init_bits is None:
        init_bits = seed_bits_for(emb.count())
        if cell_cap is None:
            cell_cap = 4096  # 4x the seed_bits_for target cell
    if cell_cap is not None:
        edges = _salted_cell_seed(
            emb, k, id_col=id_col, vec_col=vec_col,
            n_bits=init_bits, cell_cap=cell_cap,
            salt_portable=salt_portable,
        )
    else:
        edges = cell_multiprobe_topk(
            emb, emb, k, id_col=id_col, vec_col=vec_col,
            n_bits=init_bits, hamming=1,
        ).select(
            F.col("query_id").alias("src"),
            F.col("neighbor_id").alias("dst"),
            "cos_sim",
            "rank",
        )
    for _ in range(rounds):
        edges = refine_knn_graph(
            edges, emb, k, id_col=id_col, vec_col=vec_col,
            checkpoint=checkpoint_rounds,
        )
    return edges.withColumn("cos_sim", F.round("cos_sim", round_to))


def materialize_knn_graph(
    emb: DataFrame,
    path: str,
    *,
    k: int,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_bits: int | None = 4,
    round_to: int = 6,
    partitions: int | None = None,
    cell_cap: int | None = None,
) -> DataFrame:
    """Build the k-NN graph ONCE and write it as a parquet edge table
    (src, dst, cos_sim, rank), returning the read-back frame — the
    build-once/search-many artifact (the ``build_ivf_index``
    materialization pattern, VERDICT r8 ask #1). Search operators
    (:func:`knn_graph_beam_search`, :func:`knn_graph_expand_search`)
    consume the returned scan; their per-query cost is then bounded by
    beam + hops·beam·k exact distances regardless of how much the BUILD
    cost grew with the corpus — the build's n·K² candidate join is paid
    here, once, not per query batch.

    Layout: repartitioned on ``src`` and sorted (src, rank) within
    files, so a frontier equi-join on src scans clustered row groups; at
    a real deployment write it bucketed by src (``.bucketBy(n, 'src')``
    via saveAsTable) so the search join needs no shuffle of the graph
    side at all. Edges are k rows per node ≈ 24 B each — three orders
    of magnitude smaller than the vectors it indexes."""
    graph = build_knn_graph(
        emb, k=k, rounds=rounds, id_col=id_col, vec_col=vec_col,
        init_bits=init_bits, round_to=round_to, cell_cap=cell_cap,
    )
    n_parts = partitions or emb.sparkSession.sparkContext.defaultParallelism
    (
        graph.repartition(n_parts, "src")
        .sortWithinPartitions("src", "rank")
        .write.mode("overwrite")
        .parquet(path)
    )
    return emb.sparkSession.read.parquet(path)


def knn_graph_beam_search(
    queries: DataFrame,
    emb: DataFrame,
    graph: DataFrame,
    k: int,
    *,
    beam: int | None = None,
    hops: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_bits: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Multi-hop beam search over a built k-NN graph — HNSW's search
    loop as a FIXED unrolled dataflow (VERDICT r5 ask #8): seed the
    beam from the sign-bit quantizer (multi-probe, top-``beam`` per
    query), then ``hops`` times expand the current beam along graph
    edges, exactly score only the NEVER-SCORED candidates (anti-join —
    each (query, candidate) pair is scored at most once, so total work
    per query is bounded by beam + hops·beam·k_graph exact distances),
    and re-select the beam as the global top-``beam`` of everything
    scored so far. Final answer = top-``k`` of all scored.

    All joins key on candidate/query ids, every window partitions by
    query_id — no global sort, no collect, no iteration over rows; the
    hop count is a compile-time constant so a SQL engine replays the
    whole search (gate ``knn_graph_beam_search``). Ties order by
    (cos_sim DESC, id) — the repo's standard ANN contract.

    ``beam`` defaults to ``k``. With ``hops=0`` this degrades to the
    quantizer seed ranking; :func:`knn_graph_expand_search` is the
    beam=seed-set, one-hop, no-reselection special case kept for the
    cheap path."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    scored = beam_search_scored(
        queries, emb, graph,
        beam=beam or k, hops=hops, id_col=id_col, vec_col=vec_col,
        init_bits=init_bits,
    )
    beam_w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("cand")
    )
    return (
        scored.withColumn("rank", F.row_number().over(beam_w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("cand").alias("neighbor_id"),
            F.round("cos_sim", round_to).alias("cos_sim"),
            "rank",
        )
    )


def beam_search_scored(
    queries: DataFrame,
    emb: DataFrame,
    graph: DataFrame,
    *,
    beam: int,
    hops: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_bits: int = 4,
) -> DataFrame:
    """The full (query_id, cand, cos_sim) set a beam search scores —
    :func:`knn_graph_beam_search` is its top-k ranking. Exposed so
    tools/ann_eval.py can MEASURE the scanned fraction (rows here /
    n_queries·n_candidates) instead of quoting the
    beam + hops·beam·k_graph upper bound."""
    if hops < 0:
        raise ValueError(f"need hops >= 0, got {hops}")
    if beam < 1:
        raise ValueError(f"need beam >= 1, got {beam}")
    vecs = emb.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_vn"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    # (query_id, cand, cos_sim): the quantizer seed, already exactly
    # scored within its probed cells
    scored = cell_multiprobe_topk(
        queries, emb, beam, id_col=id_col, vec_col=vec_col,
        n_bits=init_bits, hamming=1,
    ).select("query_id", F.col("neighbor_id").alias("cand"), "cos_sim")
    frontier = scored.select("query_id", "cand")
    edges = graph.select(F.col("src").alias("cand"), F.col("dst"))
    beam_w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("cand")
    )
    for _ in range(hops):
        expanded = (
            frontier.join(edges, on="cand")
            .select("query_id", F.col("dst").alias("cand"))
            .distinct()
        )
        fresh = (
            expanded.filter(F.col("query_id") != F.col("cand"))
            .join(
                scored.select("query_id", "cand"),
                on=["query_id", "cand"],
                how="left_anti",
            )
        )
        fresh_scored = (
            fresh.join(qv, on="query_id")
            .join(vecs.withColumnRenamed("_vid", "cand"), on="cand")
            .select(
                "query_id",
                "cand",
                (dot(F.col("_qv"), F.col("_v")) / (F.col("_qn") * F.col("_vn"))).alias("cos_sim"),
            )
        )
        scored = scored.unionByName(fresh_scored)
        frontier = (
            scored.withColumn("_bk", F.row_number().over(beam_w))
            .filter(F.col("_bk") <= beam)
            .select("query_id", "cand")
        )
    return scored


def knn_graph_expand_search(
    queries: DataFrame,
    emb: DataFrame,
    graph: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_bits: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """ANN query over a built k-NN graph: seed candidates from the
    sign-bit quantizer (multi-probe), expand ONE hop along the graph
    (seed neighbors' neighbors), score the union exactly, return top-k.
    Two joins + a window — the dataflow form of HNSW's beam expansion
    with beam = the seed set."""
    seeds = cell_multiprobe_topk(
        queries, emb, k, id_col=id_col, vec_col=vec_col,
        n_bits=init_bits, hamming=1,
    ).select("query_id", F.col("neighbor_id").alias("_seed"))
    hop = seeds.join(
        graph.select(F.col("src").alias("_seed"), F.col("dst").alias("cand")),
        on="_seed",
    ).select("query_id", "cand")
    cand = (
        seeds.select("query_id", F.col("_seed").alias("cand"))
        .unionByName(hop)
        .distinct()
    )
    vecs = emb.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_vn"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    scored = (
        cand.filter(F.col("query_id") != F.col("cand"))
        .join(F.broadcast(qv), on="query_id")
        .join(vecs.withColumnRenamed("_vid", "cand"), on="cand")
        .select(
            "query_id",
            F.col("cand").alias("neighbor_id"),
            (dot(F.col("_qv"), F.col("_v")) / (F.col("_qn") * F.col("_vn"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_sim", round_to).alias("cos_sim"),
            "rank",
        )
    )
