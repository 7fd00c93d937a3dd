"""Facade for every private py4j crossing the engine performs.

The engine's hot paths are pure public DataFrame API; a handful of
driver-side optimizations reach through ``df._jdf`` into Spark
internals that are ``private[sql]`` in Scala (package-private compiles
to public bytecode, so py4j can call them — but no compatibility
contract protects them across Spark versions):

- ``query_execution / analyzed_plan / optimized_plan /
  executed_plan_string`` — plan-tree access for the PLANAUDIT walkers
  and the stats-gated codegen unroll (`ext/kmeans._stats_bytes`,
  `ext/multimodal.repartition_for_decode`).
- ``plan_size_bytes / plan_leaves`` — Catalyst statistics
  (``stats().sizeInBytes()``, ``collectLeaves()``), file-footer
  metadata only, never a job.
- ``checkpoint_rdd`` — the persisted RDD backing an eager
  ``localCheckpoint`` (its analyzed root is a LogicalRDD by
  construction), the exact unpersist target for
  `io/store.released_local_checkpoint`.
- ``severed_from_checkpoint`` — rebuild a frame over a checkpoint's
  materialized RDD via ``SparkSession.internalCreateDataFrame``,
  dropping the origin plan's preserved (product-inflatable) statistics
  (`io/store.stats_severed_local_checkpoint`; the round-11
  BigInteger-planning pathology).
- ``cache_manager_is_empty / persistent_rdd_ids`` — session-level
  cache/persistence introspection for the scale sweeps' measurement
  discipline (tools/scale_curves3) and io/store's fallback-only
  checkpoint-release id diff (r12: the last raw crossings outside this
  module, migrated in).

Every caller has a graceful fallback (slower, never wrong), so a Spark
bump that removes one of these methods degrades silently — scattered
warnings and a slower suite instead of one named failure. ``probe()``
closes that gap: it exercises EACH crossing against the live session
and reports per-crossing pass/fail, and ``tests/test_internals.py``
fails BY CROSSING NAME on any breakage, so the first signal after an
engine upgrade is one red test naming the broken API.

All helpers here raise on failure (no swallowing) — fallback policy
belongs to the call sites, which each document their degraded mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Catalyst's "unknown size" sentinel region: LogicalRDD without origin
# stats reports spark.sql.defaultSizeInBytes = Long.MaxValue; anything
# >= 2^60 is treated as "no usable estimate" by the stats consumers
# here (ext/kmeans, ext/multimodal, tools/plan_audit sbits gate).
STATS_UNKNOWN_MIN = 1 << 60


def query_execution(df: DataFrame):
    """``df._jdf.queryExecution()`` — the root of every plan crossing."""
    return df._jdf.queryExecution()


def analyzed_plan(df: DataFrame):
    """Analyzed logical plan (pre-optimizer tree, names resolved)."""
    return query_execution(df).analyzed()


def optimized_plan(df: DataFrame):
    """Optimized logical plan — the tree Catalyst statistics hang off."""
    return query_execution(df).optimizedPlan()


def executed_plan_string(df: DataFrame) -> str:
    """The physical (executed) plan as text. After an action under AQE
    this is the settled AdaptiveSparkPlan with final stages."""
    return str(query_execution(df).executedPlan().toString())


def plan_size_bytes(jplan) -> int:
    """``plan.stats().sizeInBytes()`` as a Python int. Driver-side
    metadata only — never launches a job. May be astronomically large
    on stats-compounded trees (the sbits pathology) — callers compare
    against STATS_UNKNOWN_MIN / bit_length, never trust it raw."""
    return int(jplan.stats().sizeInBytes())


def plan_leaves(jplan) -> list:
    """``plan.collectLeaves()`` as a Python list of jvm plan nodes."""
    leaves = jplan.collectLeaves()
    return [leaves.apply(i) for i in range(leaves.length())]


def plan_node_class(jnode) -> str:
    """Simple class name of a jvm plan node (the walkers' dispatch key)."""
    return str(jnode.getClass().getSimpleName())


def plan_children(jnode) -> list:
    """Children of a jvm plan node as a Python list."""
    kids = jnode.children()
    return [kids.apply(i) for i in range(kids.length())]


def checkpoint_rdd(ck: DataFrame):
    """The persisted JavaRDD backing an eager localCheckpoint — the
    analyzed plan root is a LogicalRDD by construction, so ``.rdd()``
    is the exact unpersist target (thread-safe, unlike a global
    getPersistentRDDs id diff)."""
    return analyzed_plan(ck).rdd()


def severed_from_checkpoint(ck: DataFrame) -> DataFrame:
    """Rebuild ``ck`` (an eager localCheckpoint) over its own
    materialized InternalRow RDD via the ``private[sql]``
    ``SparkSession.internalCreateDataFrame``. The rebuilt LogicalRDD
    has NO origin stats, so its sizeInBytes is the unknown sentinel —
    which resets the multiplicative digit growth that chained
    checkpoints of joins otherwise compound into minutes of driver
    BigInteger arithmetic (io/store.stats_severed_local_checkpoint)."""
    jdf = ck._jdf
    njdf = ck.sparkSession._jsparkSession.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return DataFrame(njdf, ck.sparkSession)


def cache_manager_is_empty(spark) -> bool:
    """``sharedState().cacheManager().isEmpty()`` — the scale sweeps'
    cache-discipline assertion (a clearCache() that silently stopped
    clearing would corrupt every cross-query measurement)."""
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def persistent_rdd_ids(spark) -> dict[int, object]:
    """``sc._jsc.getPersistentRDDs()`` as ``{id: jrdd}`` — the scale
    sweeps' forced checkpoint release and io/store's (fallback-only)
    pre/post id diff when the LogicalRDD capture path is unavailable."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k): jmap.get(k) for k in jmap.keySet().toArray()}


def probe(spark) -> dict[str, str | None]:
    """Exercise every crossing above against the live session.

    Returns ``{crossing_name: None | "ErrType: message"}`` — one entry
    per crossing, in a stable order. Cheap (a 3-row in-memory frame,
    one localCheckpoint materialization); safe to run in any session.
    The checkpoint RDD created by the probe is unpersisted before
    returning. Each probe also sanity-checks the SEMANTICS the engine
    relies on (e.g. severed stats actually read as unknown), not just
    that the method resolves — a Spark bump that keeps the name but
    changes the behavior should also fail by name here.
    """
    from pyspark.sql import functions as F

    results: dict[str, str | None] = {}

    def run(name, fn):
        try:
            fn()
            results[name] = None
        except Exception as exc:  # noqa: BLE001 — report, never raise
            results[name] = f"{type(exc).__name__}: {exc}"

    df = spark.range(3).withColumn("v", F.col("id") * 2)

    def p_query_execution():
        qe = query_execution(df)
        assert qe is not None

    def p_analyzed_plan():
        node = analyzed_plan(df)
        assert plan_node_class(node), "empty class name"
        # the PLANAUDIT walkers need children() traversal too
        for kid in plan_children(node):
            assert plan_node_class(kid)

    def p_optimized_plan_stats():
        n = plan_size_bytes(optimized_plan(df))
        # a 3-row LocalRelation/Range has a real, small estimate
        assert 0 < n < STATS_UNKNOWN_MIN, f"implausible sizeInBytes {n}"

    def p_plan_leaves():
        leaves = plan_leaves(optimized_plan(df))
        assert leaves, "no leaves"
        assert plan_size_bytes(leaves[0]) > 0

    def p_executed_plan_string():
        s = executed_plan_string(df)
        assert "Plan" in s or "Scan" in s or "*" in s, s[:80]

    ck = df.localCheckpoint(eager=True)
    jrdd = {}

    def p_checkpoint_rdd():
        jrdd["rdd"] = checkpoint_rdd(ck)
        # a live py4j RDD handle with the unpersist we call on release
        assert jrdd["rdd"].id() >= 0

    def p_severed_from_checkpoint():
        severed = severed_from_checkpoint(ck)
        assert severed.count() == 3
        assert [f.name for f in severed.schema.fields] == ["id", "v"]
        # the property the engine RELIES on: origin stats dropped
        n = plan_size_bytes(optimized_plan(severed))
        assert n >= STATS_UNKNOWN_MIN, (
            f"severed checkpoint still carries origin stats ({n} bytes) — "
            "stats_severed_local_checkpoint would no longer reset "
            "checkpoint stats compounding"
        )

    def p_cache_manager():
        # Relative to the session's pre-probe state: a shared session may
        # legitimately hold other cached frames (test suites, long-lived
        # pipelines), in which case isEmpty() can only be asserted to
        # RETURN to its baseline, not to become globally true.
        was_empty = cache_manager_is_empty(spark)
        cached = spark.range(2).persist()
        try:
            cached.count()
            assert not cache_manager_is_empty(spark), (
                "cacheManager blind to a persisted frame"
            )
        finally:
            cached.unpersist(True)
        assert cache_manager_is_empty(spark) == was_empty, (
            "unpersist not observed"
        )

    def p_persistent_rdd_ids():
        ids = persistent_rdd_ids(spark)
        # the probe's own eager localCheckpoint RDD must be visible
        assert int(jrdd["rdd"].id()) in ids if jrdd.get("rdd") else ids is not None

    run("query_execution", p_query_execution)
    run("analyzed_plan", p_analyzed_plan)
    run("optimized_plan_stats", p_optimized_plan_stats)
    run("plan_leaves", p_plan_leaves)
    run("executed_plan_string", p_executed_plan_string)
    run("checkpoint_rdd", p_checkpoint_rdd)
    run("severed_from_checkpoint", p_severed_from_checkpoint)
    run("cache_manager_is_empty", p_cache_manager)
    run("persistent_rdd_ids", p_persistent_rdd_ids)

    if jrdd.get("rdd") is not None:
        try:
            jrdd["rdd"].unpersist(False)
        except Exception:  # noqa: BLE001 — probe cleanup is best-effort
            pass

    return results
