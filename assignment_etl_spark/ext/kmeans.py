"""Portable k-means: deterministic, cross-engine-replayable Lloyd
iterations over an embedding column.

`ext/similarity.py` uses MLlib's KMeans for IVF coarse quantization —
fast, but its initialization and float reductions are
implementation-defined, so no independent engine can replay it. This
module is the portable counterpart (the PageRank treatment for
clustering): every source of nondeterminism is pinned —

- init: the k vectors with the smallest ids, in id order;
- assignment: squared-L2 via a LEFT FOLD over dimensions (Spark
  ``aggregate`` with 0.0 init ≡ SQL ``list_reduce`` — identical IEEE
  add order, so identical doubles), ties broken by centroid index;
- update: per-dimension mean under the decimal-sum policy (components
  rounded then summed as decimal — partitioning cannot change the sum;
  one double division + round at the end);
- empty clusters keep their previous centroid.

Each iteration is: a ×k broadcast nested-loop expansion (k is small and
fixed — bounded, NOT a cartesian hazard), a per-point window argmin
(shuffle on point id), and a (k×dim)-row aggregate. O(n·k·dim) work.
The centroid state (k rows, bounded by construction) round-trips
through the driver between iterations — the classic Lloyd's hand-off,
which keeps plan depth constant WITHOUT persistence. The earlier
per-iteration localCheckpoint achieved the same plan depth but its
checkpoint RDDs live outside the CacheManager (clearCache can't free
them; ContextCleaner reaps only on driver GC), so repeated calls leaked
storage at steady state — caught by the scale sweep's cache-discipline
assertion. At 100 TB this is exactly MLlib's dataflow, minus the
nondeterminism.

Reference parity note: the reference repo has no clustering; this
serves the training-data curation layer (topic bucketing, dedup-cluster
seeding) beside ext/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from assignment_etl_spark import internals

# Input size (Catalyst plan stats, no job) above which the Lloyd assign
# unrolls its distance into codegen. The unrolled form executes ~3.3×
# faster but costs ~0.5s of driver plan/codegen work PER assign stage
# (measured: plan-only 0.69s vs 0.13s at dim 64), so on small inputs —
# exactly the bench's sf0.1 regime — the fold is net faster, while at
# sf10 (86 MB stats) the executor win dominates by tens of seconds.
UNROLL_MIN_BYTES = 32 * 1024 * 1024


_STATS_SENTINEL = 1 << 60
_stats_probe_warned = False


def _stats_bytes(df: DataFrame) -> int:
    """Input-size estimate for the unroll gate, derived from the
    optimized plan's BASE SCANS — safe by construction on composed
    dataflows (the round-10 landmine: a join output without CBO stats
    carries a PRODUCT-inflated root sizeInBytes, so gating on the root
    unrolled tiny composed inputs and paid ~0.5s of driver codegen per
    assign stage for nothing).

    The verdict is ``min(root, max-leaf)`` over sentinel-free
    estimates: max-of-leaves bounds the data any downstream stage can
    actually scan (immune to join-product inflation), while the root —
    when Catalyst reports one below the ~2^63 "unknown" sentinel — is
    smaller exactly when column pruning/limits shrank the working set,
    and then it's the better signal. Either side at the sentinel falls
    back to the other; both unknown → 0 (keep the portable fold).

    LogicalRDD leaves are treated as UNKNOWN regardless of the number
    they report (ADVICE r11): a plain (non-severed) localCheckpoint of
    a join is a LogicalRDD leaf PRESERVING the source plan's
    product-inflated sizeInBytes — an estimate that can sit below the
    sentinel (86 MB² ≈ 7e15 < 2^60) while being astronomically wrong,
    so a leaf-based verdict over it would unroll tiny composed inputs.
    Only leaves with honest file/relation metadata count; a dataflow
    whose ONLY leaves are checkpoints keeps the portable fold (safe,
    slower) unless the caller passes an explicit unroll override.
    Driver-side only, never launches a job."""
    global _stats_probe_warned
    try:
        plan = internals.optimized_plan(df)
        root = internals.plan_size_bytes(plan)
        max_leaf, honest_leaf = 0, False
        for leaf in internals.plan_leaves(plan):
            if internals.plan_node_class(leaf) == "LogicalRDD":
                continue  # preserved (possibly product-inflated) stats
            honest_leaf = True
            n = internals.plan_size_bytes(leaf)
            if n < _STATS_SENTINEL:
                max_leaf = max(max_leaf, n)
        if not honest_leaf:
            # every leaf is a checkpoint: the ROOT estimate is derived
            # from preserved stats too, so nothing here is trustworthy
            return 0
        if root >= _STATS_SENTINEL:
            return max_leaf
        return min(root, max_leaf) if max_leaf else root
    except Exception as exc:  # noqa: BLE001
        # A silent 0 here permanently disables the unroll (~3.3× slower
        # Lloyd assigns at scale) — if a Spark version bump renames the
        # private queryExecution API, say so once instead of quietly
        # reverting to the interpreted fold (ADVICE r10).
        if not _stats_probe_warned:
            _stats_probe_warned = True
            import logging

            logging.getLogger(__name__).warning(
                "kmeans stats probe failed (%s: %s) — size-gated codegen "
                "unroll disabled, Lloyd assigns use the interpreted fold",
                type(exc).__name__,
                exc,
            )
        return 0


def stats_unroll(df: DataFrame) -> bool:
    """Public helper for composed dataflows: True when ``df`` is large
    enough (by base-scan plan stats) that downstream Lloyd assigns
    should unroll their distance into codegen. Safe on join outputs
    (the verdict comes from leaf scans, never a product-inflated root
    estimate) and on checkpoint outputs in the conservative direction:
    LogicalRDD leaves — plain localCheckpoints preserve their source
    plan's possibly-inflated estimate — are treated as UNKNOWN, so a
    frame whose only leaves are checkpoints answers False (portable
    fold; safe, slower). Callers that checkpoint a large dataflow and
    still want the unroll should gate on the PRE-checkpoint frame or
    the base table (the q_ivfpq_search_topk pattern)."""
    return _stats_bytes(df) >= UNROLL_MIN_BYTES


def _dlit(x: float) -> str:
    """SQL fragment for an EXACT double literal: repr() round-trips the
    binary double in shortest form, and CAST(string AS DOUBLE) parses
    with Double.parseDouble (nearest = same bits). Avoids the SQL
    parser's decimal-literal default for bare numerics."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _sq_l2_sql(vcol: str, c: list, dim: int | None) -> str:
    """SQL text of squared_l2(vcol, literal-centroid) — same Catalyst
    expressions as the Column form (left-assoc unrolled sum with
    ``dim``, else the zip_with/aggregate fold), built as ONE string so
    a k·dim-literal argmin costs one py4j call instead of thousands
    (measured: 2.2s of driver chatter per assign at k=8·m=4·d=16)."""
    if dim is not None:
        return "(" + " + ".join(
            f"({vcol}[{i}] - {_dlit(c[i])}) * ({vcol}[{i}] - {_dlit(c[i])})"
            for i in range(dim)
        ) + ")"
    arr = ", ".join(_dlit(x) for x in c)
    return (
        f"aggregate(zip_with({vcol}, array({arr}), "
        f"(a, b) -> (a - b) * (a - b)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def argmin_struct_sql(
    vcol: str, rows: list, dim: int | None
) -> str:
    """SQL text of the (dist, cidx) struct-min over literal centroids:
    ``rows`` is [(cidx, centroid-list)]. array_min over structs
    compares field-lexicographically (dist first, then cidx, nulls
    first) — exactly the Lloyd window's orderBy('dist', 'cidx')."""
    structs = ", ".join(
        f"named_struct('dist', {_sq_l2_sql(vcol, c, dim)}, 'cidx', {int(cidx)})"
        for cidx, c in rows
    )
    return f"array_min(array({structs}))"


def squared_l2(v: Column, c: Column, *, dim: int | None = None) -> Column:
    """Σ(v_i − c_i)² as a left-associated double reduction.

    With ``dim`` the sum is emitted as an UNROLLED expression —
    (v[0]−c[0])² + (v[1]−c[1])² + … — which stays inside whole-stage
    codegen; the default emits the ``aggregate``/``zip_with`` fold,
    which is engine-portable (the oracle replays it) but INTERPRETED:
    Spark's higher-order functions never enter codegen (the round-9
    knn finding), and this distance runs once per (point, centroid)
    pair in every Lloyd assign — measured 3.3× slower than the
    unrolled form on a 200k×4×64 assign, with BIT-IDENTICAL sums
    (same left-assoc addition order; each term is a square so no
    −0.0 can differ either). Callers that know the dimension (the
    kmeans driver loop after collecting seeds, PQ's fixed d_sub)
    pass it; oracle SQL is unaffected because the VALUES are equal."""
    if dim is not None:
        out: Column | None = None
        for i in range(dim):
            t = (v[i] - c[i]) * (v[i] - c[i])
            out = t if out is None else out + t
        return out if out is not None else F.lit(0.0)
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    comp_scale: int = 7,
    mean_round: int = 9,
) -> tuple[DataFrame, DataFrame]:
    """Returns (assignments, centroids) after ``iters`` Lloyd steps plus
    a final assignment pass against the final centroids. assignments =
    (pid, cidx, dist); centroids = (cidx, c: array<double>)."""
    spark = df.sparkSession
    # fan out low-partition inputs (a single-file local parquet) to the
    # session's parallelism: the r12 projection argmin runs the Lloyd
    # distance work WHERE THE INPUT SITS — the old join+window shape
    # paid a shuffle that incidentally rebalanced, so without this
    # guard a 2-split scan computes every fold on 2 cores (measured at
    # sf1: ivfpq_search_topk ~15% slower than the window path). Real
    # cluster layouts arrive with thousands of splits and skip this
    # (the _sig_frame fan-out precedent).
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    from assignment_etl_spark.caching import scoped_persist

    # consumed once per Lloyd iteration plus the final assignment pass
    # (iters+1 evaluations of the scan + cast) — persist so the source
    # is read once (r13, guide §5; released via release_scoped_caches)
    pts = scoped_persist(df.select(
        F.col(id_col).alias("pid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ))
    # Centroid state lives on the DRIVER between iterations (k rows —
    # bounded by construction), re-shipped as a broadcast-sized literal
    # table each step. This is the classic Lloyd's hand-off: it severs
    # lineage without persistence. The previous localCheckpoint design
    # kept plan depth constant too, but each iteration's checkpoint RDD
    # lives OUTSIDE the CacheManager (clearCache can't free it,
    # ContextCleaner only reaps on driver GC) — the scale-sweep's
    # cache-discipline assertion caught it accumulating across queries.
    cents_schema = "cidx int, c array<double>"
    cents_rows = [
        (i + 1, list(r.v))
        for i, r in enumerate(pts.orderBy("pid").limit(k).collect())
    ]
    # The projection argmin always uses the PORTABLE FOLD: in the old
    # one-distance-per-joined-row shape the size-gated codegen unroll
    # won 3.3× at sf10, but the argmin evaluates k distances in ONE
    # expression — k·dim unrolled terms blow janino's 64 KB method
    # limit ("Code grows beyond 64 KB"), so the whole projection falls
    # back to interpreted AND pays a failed compile per stage (measured
    # at sf10, k=4·dim=64: unrolled first-run 6.8s / warm 1.57s vs fold
    # 1.3s / 1.02s). squared_l2's dim unroll remains for one-distance
    # callers (ADC LUTs, ext/projection).
    dim = None
    d_out = len(cents_rows[0][1]) if cents_rows else 0

    # r12 optimization (guide §2.4): the centroid state is DRIVER-side
    # between iterations, so the assignment is an argmin over k KNOWN
    # literal centroids — a pure projection, not a ×k broadcast-join
    # fanout followed by a per-point window (the old shape shuffled and
    # sorted n·k rows per assign). The (dist, cidx) struct min replays
    # the window's orderBy("dist", "cidx") tie-break exactly (struct
    # ordering is field-lexicographic, nulls first — same as the sort).
    # The whole argmin is ONE F.expr parse — see _sq_l2_sql.
    def assign(rows) -> DataFrame:
        best = F.expr(argmin_struct_sql("v", [(cidx, c) for cidx, c in rows], dim))
        return pts.withColumn("_m", best).select(
            "pid", "v", F.col("_m.cidx").alias("cidx"), F.col("_m.dist").alias("dist")
        )

    dec = f"decimal(20,{comp_scale})"
    for _ in range(iters):
        a = assign(cents_rows)
        # centroid update in ONE aggregate: d per-component decimal sums
        # + per-component non-null counts, no posexplode (which
        # multiplied the pre-aggregation row count ×d) and no second
        # collect_list shuffle — the cluster_centroids pattern. Each
        # component mean keeps the exact engine arithmetic: decimal sum
        # → double cast → IEEE division → HALF_UP round, identical to
        # the old per-(cidx,pos) path.
        newc = (
            a.groupBy("cidx")
            .agg(
                *[
                    F.expr(
                        f"sum(CAST(round(v[{i}], {comp_scale}) AS {dec}))"
                    ).alias(f"_s{i}")
                    for i in range(d_out)
                ],
                *[
                    F.expr(f"count(v[{i}])").alias(f"_n{i}")
                    for i in range(d_out)
                ],
            )
            .select(
                "cidx",
                F.expr(
                    "array(" + ", ".join(
                        f"round(CAST(_s{i} AS DOUBLE) / _n{i}, {mean_round})"
                        for i in range(d_out)
                    ) + ")"
                ).alias("c"),
            )
        )
        # k-row collect (bounded): empty clusters keep their previous
        # centroid — the coalesce, done as a dict merge on the driver
        new_map = {r.cidx: list(r.c) for r in newc.collect()}
        cents_rows = [
            (cidx, new_map.get(cidx, c_old)) for cidx, c_old in cents_rows
        ]
    cents = spark.createDataFrame(cents_rows, cents_schema)
    return assign(cents_rows).select("pid", "cidx", "dist"), cents
