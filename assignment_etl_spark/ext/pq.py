"""Product quantization (PQ): codebook training, encoding, and
asymmetric-distance (ADC) top-k search over an embedding column.

PQ is the memory side of the ANN family (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public): split
each d-dim vector into m contiguous subvectors, vector-quantize each
subspace with its own k-centroid codebook, and store each vector as m
small codes (m·log2(k) bits instead of d doubles — 64 doubles → 4 bytes
at m=4, k=256). Query time never decodes: the query's distance to every
centroid of every subspace is a tiny m·k lookup table, and a database
vector's approximate distance is the sum of its m looked-up entries
(ADC). This composes with the IVF layer in ext/similarity.py — IVF
prunes WHICH vectors to score, PQ shrinks WHAT is stored and scored —
which is exactly FAISS's IVFPQ layout re-expressed as dataflow.

Scale shape:
- training explodes vectors to (pid, sub, subvector) rows — m·n rows,
  but each is d/m wide, so bytes stay ~constant — and runs ALL m
  subspace Lloyd loops in ONE dataflow per iteration: the m·k centroid
  table broadcasts, assignment is a per-(pid, sub) window argmin over k
  candidates, the update is a (m·k·d/m)-row decimal-mean aggregate.
  No per-subspace driver loop, no collect.
- encoding is the same broadcast-join argmin (one pass);
- ADC search broadcasts the m·k distance table, joins codes on
  (sub, cidx), sums per pid, and finishes with orderBy().limit(topk) —
  TakeOrderedAndProject, per-partition heaps, never a global sort.

Determinism (the portable-kmeans policy, ext/kmeans.py): init is the k
smallest ids' subvectors per subspace (the SAME k ids for every
subspace — one bounded limit(k), not a per-subspace window); distances
are left folds (identical IEEE order in any engine); centroid updates
are exact decimal component sums whose double image and IEEE division
are bit-identical in any engine — the mean is deliberately NOT
re-rounded (see the in-loop comment); argmin ties break on centroid
index; empty clusters keep their previous centroid. Every stage is
SQL-replayable, and the gate oracle replays both Lloyd iterations per
subspace verbatim.

Reference parity note: the reference repo has no vector surface; this
extends ext/similarity.py (brute/LSH/IVF/cell-probe ANN) and
ext/quantize.py (SQ8) with the codebook quantizer a 100 TB embedding
store actually ships.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from assignment_etl_spark.ext.kmeans import (
    argmin_struct_sql,
    squared_l2,
)


def _sub_pts(
    df: DataFrame, id_col: str, vec_col: str, m: int, d_sub: int
) -> DataFrame:
    """(pid, sub 1-based, v: the sub-th length-d_sub slice). A vector
    whose length differs from m·d_sub raises at execution time — slice
    would otherwise truncate silently and poison every distance."""
    dim = m * d_sub
    src = F.col(vec_col)
    checked = F.when(
        src.isNotNull() & (F.size(src) == dim),
        F.transform(src, lambda x: x.cast("double")),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"pq: declared dim={dim} but vector has length "),
                F.coalesce(F.size(src).cast("string"), F.lit("NULL")),
            )
        ).cast("array<double>")
    )
    slices = F.array(
        *[F.slice(checked, i * d_sub + 1, d_sub) for i in range(m)]
    )
    return df.select(
        F.col(id_col).alias("pid"), F.posexplode(slices).alias("_s0", "v")
    ).select("pid", (F.col("_s0") + 1).alias("sub"), "v")


def _assign(
    pts: DataFrame, cents_rows: list, *, d_sub: int | None = None
) -> DataFrame:
    """Per-(pid, sub) argmin over that subspace's k centroids as a PURE
    PROJECTION (r12, guide §2.4): the codebook state is driver-side
    between Lloyd iterations, so each row's argmin is a (dist, cidx)
    struct min over its subspace's k LITERAL centroids — no ×k
    broadcast-join fanout and no per-(pid, sub) window shuffle+sort of
    n·m·k rows (the old shape). The struct min replays the window's
    orderBy("dist", "cidx") tie-break exactly. ``d_sub`` unrolls the
    distance into codegen (bit-identical values — see squared_l2)."""
    by_sub: dict[int, list] = {}
    for sub, cidx, c in cents_rows:
        by_sub.setdefault(sub, []).append((cidx, c))

    # CASE sub WHEN ... dispatch: a row evaluates only its own
    # subspace's k distances (CASE branches are lazy). The whole
    # m·k·d_sub-literal expression is ONE F.expr parse — building it
    # through the Column API cost ~2.2s of py4j chatter per assign
    # (see ext/kmeans._sq_l2_sql).
    subs = sorted(by_sub)
    if len(subs) == 1:
        best_sql = argmin_struct_sql("v", by_sub[subs[0]], d_sub)
    else:
        whens = " ".join(
            f"WHEN {sub} THEN {argmin_struct_sql('v', by_sub[sub], d_sub)}"
            for sub in subs[1:]
        )
        best_sql = (
            f"CASE sub {whens} "
            f"ELSE {argmin_struct_sql('v', by_sub[subs[0]], d_sub)} END"
        )
    best: Column = F.expr(best_sql)
    return pts.withColumn("_m", best).select(
        "pid", "sub", "v",
        F.col("_m.cidx").alias("cidx"), F.col("_m.dist").alias("dist"),
    )


def pq_train(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    d_sub: int = 16,
    k: int = 16,
    iters: int = 2,
    comp_scale: int = 7,
    unroll: bool | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train m subspace codebooks of k centroids each with ``iters``
    Lloyd steps, then encode. Returns ``(codes, cents)``:
    codes = (pid, sub, cidx, dist) — one row per vector per subspace,
    dist the squared-L2 quantization error in that subspace;
    cents = (sub, cidx, c: array<double> of length d_sub)."""
    if m < 1 or k < 1 or d_sub < 1:
        raise ValueError(f"need m, k, d_sub >= 1, got {m}, {k}, {d_sub}")
    # fan out low-partition inputs before the projection argmin — the
    # Lloyd distance work now runs where the input sits (no assign
    # shuffle to rebalance it); see ext/kmeans.kmeans for the measured
    # rationale. Checkpoint/shuffle-shaped inputs (the ivfpq residual
    # frame) already sit at shuffle parallelism and skip this.
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    from assignment_etl_spark.caching import scoped_persist

    # consumed once per Lloyd iteration plus the final encode pass —
    # persist the exploded subvector frame so the slice explode runs
    # once (r13, guide §5; released via release_scoped_caches)
    pts = scoped_persist(_sub_pts(df, id_col, vec_col, m, d_sub))
    # ``unroll`` is retained for API compatibility but no longer
    # drives the assign: the projection argmin evaluates all m·k
    # distances in one expression, and unrolling that blows janino's
    # 64 KB method limit — interpreted fallback PLUS a failed compile
    # per stage (measured at sf10, m=4·k=8·d=16: unrolled warm 2.0s +
    # ~4s compile overhead vs fold 1.5s flat). The fold is the faster
    # AND compilable form at every tested scale; see ext/kmeans.kmeans.
    unroll_dim = None
    # init: the k smallest ids' subvectors, every subspace — ONE
    # TakeOrderedAndProject over the source table (bounded k rows),
    # exploded after, so no per-subspace window touches the data
    seed = df.select(
        F.col(id_col).alias("pid"), F.col(vec_col).alias(vec_col)
    ).orderBy("pid").limit(k)
    # Centroid state (m×k rows, bounded) round-trips through the driver
    # between iterations — severs lineage without persistence (the
    # localCheckpoint it replaces leaked its checkpoint RDDs past
    # clearCache at steady state; see ext/kmeans.py for the full note).
    cents_schema = "sub int, cidx int, c array<double>"
    cents_rows = [
        (r.sub, r.cidx, list(r.c))
        for r in _sub_pts(seed, "pid", vec_col, m, d_sub)
        .withColumn(
            "cidx",
            F.row_number().over(Window.partitionBy("sub").orderBy("pid")),
        )
        .select("sub", "cidx", F.col("v").alias("c"))
        .collect()
    ]
    dec = f"decimal(20,{comp_scale})"
    for _ in range(iters):
        a = _assign(pts, cents_rows, d_sub=unroll_dim)
        # centroid update in ONE aggregate (r12): d_sub per-component
        # decimal sums + per-component non-null counts keyed on
        # (sub, cidx) — no posexplode (which multiplied the
        # pre-aggregation row count ×d_sub) and no second collect_list
        # shuffle. The mean is NOT re-rounded: the decimal sum is
        # exact, its double image is the deterministic nearest double,
        # and the IEEE division is bit-identical in any engine —
        # whereas a round-to-9 HERE is where engines diverge (Spark
        # rounds the shortest string repr HALF_UP, DuckDB multiplies
        # and rounds; Lloyd means are sums over small counts, which
        # land near 1e-9 ties systematically — observed at sf0.01)
        newc = (
            a.groupBy("sub", "cidx")
            .agg(
                *[
                    F.expr(
                        f"sum(CAST(round(v[{i}], {comp_scale}) AS {dec}))"
                    ).alias(f"_s{i}")
                    for i in range(d_sub)
                ],
                *[
                    F.expr(f"count(v[{i}])").alias(f"_n{i}")
                    for i in range(d_sub)
                ],
            )
            .select(
                "sub", "cidx",
                F.expr(
                    "array(" + ", ".join(
                        f"CAST(_s{i} AS DOUBLE) / _n{i}"
                        for i in range(d_sub)
                    ) + ")"
                ).alias("c"),
            )
        )
        # m×k-row collect (bounded): empty cells keep their previous
        # centroid — the coalesce, done as a dict merge on the driver
        new_map = {(r.sub, r.cidx): list(r.c) for r in newc.collect()}
        cents_rows = [
            (sub, cidx, new_map.get((sub, cidx), c_old))
            for sub, cidx, c_old in cents_rows
        ]
    cents = spark.createDataFrame(cents_rows, cents_schema)
    codes = _assign(pts, cents_rows, d_sub=unroll_dim).select(
        "pid", "sub", "cidx", "dist"
    )
    return codes, cents


def pq_encode_profile(codes: DataFrame, cents: DataFrame) -> DataFrame:
    """Codebook-quality summary, one row per (sub, cidx): population,
    decimal-summed centroid coordinates, and decimal-summed
    quantization error — the shape the kmeans gate certifies, per
    subspace. Empty cells still appear (population 0) so a collapsed
    codebook is visible, not silently absent."""
    fin = codes.groupBy("sub", "cidx").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(
            F.sum(F.round(F.col("dist"), 7).cast("decimal(20,7)"))
            .cast("double"),
            3,
        ).alias("sq_err"),
    )
    # centroid_sum: an IN-ROW left fold over d_sub doubles — no
    # partitioning can reorder it, and both engines fold the same list
    # in the same IEEE order, so the unrounded sum is bit-identical
    # (re-rounding components to a decimal scale is the tie-divergence
    # hazard the training loop avoids; see pq_train)
    cs = cents.select(
        "sub", "cidx",
        F.round(
            F.aggregate("c", F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("centroid_sum"),
    )
    return (
        cs.join(fin, on=["sub", "cidx"], how="left")
        .select(
            "sub", "cidx",
            F.coalesce("n_points", F.lit(0)).alias("n_points"),
            "centroid_sum",
            F.coalesce("sq_err", F.lit(0.0)).alias("sq_err"),
        )
        .orderBy("sub", "cidx")
    )


def pq_adc_topk(
    codes: DataFrame,
    cents: DataFrame,
    query: list[float],
    *,
    m: int,
    d_sub: int,
    topk: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Asymmetric-distance top-k: (pid, adc_dist, rank). The query
    never joins the data — its m·k distance table is computed on the
    centroid table (tiny) and broadcast; each vector's approximate
    distance is the sum of its m looked-up entries (exact decimal sum
    of per-entry rounded doubles, so partial-agg order can't flip
    ranks); the finish is orderBy().limit(topk) →
    TakeOrderedAndProject. Ties break on pid."""
    if topk < 1:
        raise ValueError(f"need topk >= 1, got {topk}")
    if len(query) != m * d_sub:
        raise ValueError(
            f"query has length {len(query)}, expected m*d_sub = {m * d_sub}"
        )
    qlit = F.array(*[F.lit(float(x)) for x in query])
    qsub = F.slice(qlit, (F.col("sub") - 1) * d_sub + 1, d_sub)
    lut = cents.select(
        "sub", "cidx",
        F.round(squared_l2(qsub, F.col("c")), 7)
        .cast("decimal(20,7)")
        .alias("qd"),
    )
    scored = (
        codes.join(F.broadcast(lut), on=["sub", "cidx"])
        .groupBy("pid")
        .agg(F.sum("qd").alias("_d"))
        .select(
            "pid", F.round(F.col("_d").cast("double"), round_to).alias("adc_dist")
        )
    )
    top = scored.orderBy(F.asc("adc_dist"), F.asc("pid")).limit(topk)
    w = Window.orderBy(F.asc("adc_dist"), F.asc("pid"))  # over ≤ topk rows
    return top.withColumn("rank", F.row_number().over(w))


def ivfpq_search(
    codes_with_cell: DataFrame,
    pq_cents: DataFrame,
    coarse_cents: DataFrame,
    query: list[float],
    *,
    m: int,
    d_sub: int,
    nprobe: int = 2,
    topk: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """IVF-PQ search (FAISS's IVFPQ layout as dataflow): the coarse
    quantizer picks the ``nprobe`` cells nearest the query (a bounded
    sort of the TINY centroid table), the query's RESIDUAL against each
    probed cell gets its own m·k ADC lookup table, and only vectors in
    probed cells are scored — the inner join on (cell, sub, code)
    against the broadcast LUT is simultaneously the IVF prune and the
    ADC lookup. approx ||q − (c + r̂)||² = Σ_sub ||q_res_sub − r̂_sub||².

    Inputs: ``codes_with_cell`` = (pid, cell, sub, cidx) — pq_train's
    codes joined with the coarse assignment; ``pq_cents`` = (sub, cidx,
    c) over RESIDUALS; ``coarse_cents`` = (cidx, c) full-dimension.
    Returns (pid, adc_dist, rank), ties on pid.

    Scale shape: everything query-dependent happens on centroid tables
    (coarse k rows, LUT nprobe·m·k rows — broadcast); the data-side
    work is one broadcast-join + per-pid sum over probed cells only,
    then TakeOrderedAndProject. Nothing rescans unprobed cells."""
    if topk < 1 or nprobe < 1:
        raise ValueError(f"need topk, nprobe >= 1, got {topk}, {nprobe}")
    if len(query) != m * d_sub:
        raise ValueError(
            f"query has length {len(query)}, expected m*d_sub = {m * d_sub}"
        )
    qlit = F.array(*[F.lit(float(x)) for x in query])
    probed = (
        coarse_cents.select(
            F.col("cidx").alias("cell"),
            F.col("c").alias("ccell"),
        )
        .withColumn("qd_cell", squared_l2(qlit, F.col("ccell")))
        .orderBy("qd_cell", "cell")
        .limit(nprobe)
    )
    qres = probed.select(
        "cell", F.zip_with(qlit, F.col("ccell"), lambda a, b: a - b).alias("qr")
    )
    pqc = pq_cents.select("sub", "cidx", F.col("c").alias("pc"))
    lut = qres.crossJoin(pqc).select(
        "cell", "sub", "cidx",
        F.round(
            squared_l2(
                F.slice(F.col("qr"), (F.col("sub") - 1) * d_sub + 1, d_sub),
                F.col("pc"),
            ),
            7,
        ).cast("decimal(20,7)").alias("qd"),
    )
    scored = (
        codes_with_cell.join(F.broadcast(lut), on=["cell", "sub", "cidx"])
        .groupBy("pid")
        .agg(F.sum("qd").alias("_d"))
        .select(
            "pid",
            F.round(F.col("_d").cast("double"), round_to).alias("adc_dist"),
        )
    )
    top = scored.orderBy(F.asc("adc_dist"), F.asc("pid")).limit(topk)
    w = Window.orderBy(F.asc("adc_dist"), F.asc("pid"))  # over ≤ topk rows
    return top.withColumn("rank", F.row_number().over(w))
