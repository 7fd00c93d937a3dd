"""The plan-audit broadcast-hint rule (VERDICT r4 ask #2): an explicit
F.broadcast() over an un-aggregated scan of an sf-proportional table must be
flagged; broadcasts of aggregates/distincts and of fixed-size dims must not.

Plus the global-window rule (VERDICT r5 ask #3): a Window with an empty (or
all-literal) partition spec over an un-collapsed sf-proportional scan is the
single-partition corpus funnel and must be flagged; windows over aggregates,
limits (TakeOrderedAndProject bounded-rank), bounded key filters, or with a
real partition key must not.
"""

import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, "/root/repo")
from tools.plan_audit import audit_broadcast_hints, audit_global_windows  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    return {
        name: spark.read.parquet(f"{SF}/{name}.parquet")
        for name in ("customer", "orders", "nation", "part", "events")
    }


def test_flags_broadcast_of_customer_scan(tables):
    df = tables["orders"].join(
        F.broadcast(tables["customer"]),
        tables["orders"].o_custkey == tables["customer"].c_custkey,
    )
    bad = audit_broadcast_hints(df)
    assert bad == ["broadcast-hint-over-customer"]


def test_flags_filtered_big_scan_too(tables):
    # a constant-fraction filter is still sf-proportional
    members = tables["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    df = tables["orders"].join(
        F.broadcast(members.select("c_custkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    assert audit_broadcast_hints(df) == ["broadcast-hint-over-customer"]


def test_flags_part_scan(tables):
    df = tables["orders"].crossJoin(F.broadcast(tables["part"].limit(5)))
    # limit() does not collapse sf-proportionality guarantees in the rule's
    # eyes only Aggregate/Deduplicate do; limit is driver-chosen and bounded,
    # but the rule is deliberately strict about raw scans
    assert audit_broadcast_hints(df) == ["broadcast-hint-over-part"]


def test_exempts_aggregate_of_big_table(tables):
    tot = tables["orders"].agg(F.count(F.lit(1)).alias("n"))
    df = tables["nation"].crossJoin(F.broadcast(tot))
    assert audit_broadcast_hints(df) == []


def test_exempts_distinct_of_bounded_domain(tables):
    buckets = tables["events"].select(
        F.floor(F.unix_timestamp("ts") / 86400).alias("b")
    ).distinct()
    df = tables["nation"].crossJoin(F.broadcast(buckets))
    assert audit_broadcast_hints(df) == []


def test_exempts_fixed_size_dim(tables):
    df = tables["orders"].join(
        F.broadcast(tables["nation"]), F.lit(True), "left"
    )
    assert audit_broadcast_hints(df) == []


def test_registry_sample_is_clean(spark):
    # the nine de-hinted round-5 sites must stay clean
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in (
        "revenue_by_region",
        "promo_revenue",
        "small_quantity_revenue",
        "bloom_join_prune",
        "min_cost_supplier",
        "large_volume_customers",
    ):
        assert audit_broadcast_hints(qs[name](spark, SF)) == [], name


def test_exempts_literal_key_upper_bound(spark, tables):
    # `vec_id < 8`-style filters are FIXED-size at any sf — broadcastable
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    df = emb.crossJoin(F.broadcast(q.select("vec_id")))
    assert audit_broadcast_hints(df) == []


def test_flags_key_lower_bound(spark):
    # `vec_id >= 8` keeps the sf-proportional complement — still flagged
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    big = emb.filter(F.col("vec_id") >= 8)
    df = emb.crossJoin(F.broadcast(big.select("vec_id")))
    assert audit_broadcast_hints(df) == ["broadcast-hint-over-embeddings"]


def test_window_rule_flags_corpus_global_window(tables):
    w = Window.orderBy("o_orderkey")
    df = tables["orders"].withColumn("rn", F.row_number().over(w))
    assert audit_global_windows(df) == ["global-window-over-orders"]


def test_window_rule_flags_literal_partition_key(tables):
    # Catalyst strips foldable partition keys — partitionBy(F.lit(0)) is
    # still a single-partition window and must NOT evade the rule
    w = Window.partitionBy(F.lit(0)).orderBy("o_orderkey")
    df = tables["orders"].withColumn("rn", F.row_number().over(w))
    assert audit_global_windows(df) == ["global-window-over-orders"]


def test_window_rule_flags_entity_aggregate_window_class(tables):
    # r7 TIGHTENING (VERDICT r6 ask #3): a per-entity aggregate's group
    # key (o_custkey) is sf-PROPORTIONAL — the Aggregate no longer
    # sanctions a downstream empty-partition window (pre-r7 this was
    # exempt; survival_curve was the live counterexample)
    per = tables["orders"].groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("v")
    )
    w = Window.orderBy("v", "o_custkey")
    df = per.withColumn("rn", F.row_number().over(w))
    assert audit_global_windows(df) == ["global-window-over-orders"]


def test_window_rule_flags_continuous_aggregate_window(tables):
    # the survival_curve-before-fix shape: group-by on a CONTINUOUS
    # value column, then a global cumulative window — one group per
    # distinct value, sf-proportional, must flag
    per_t = tables["orders"].groupBy(
        F.col("o_totalprice").alias("t")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    df = per_t.withColumn("c", F.sum("n").over(w))
    assert audit_global_windows(df) == ["global-window-over-orders"]


def test_window_rule_exempts_calendar_bucket_aggregate(tables):
    # the cusum_changepoint contract: raw events collapse to one row per
    # DAY (calendar-bounded domain) — a window over that is sanctioned
    daily = tables["events"].groupBy(
        F.date_trunc("DAY", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    df = daily.withColumn("c", F.sum("n").over(w))
    assert audit_global_windows(df) == []


def test_window_rule_exempts_enum_key_aggregate(tables):
    # bounded-domain sanction list: event_type is enum-ish
    per = tables["events"].groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("n", "event_type")
    df = per.withColumn("rn", F.row_number().over(w))
    assert audit_global_windows(df) == []


def test_window_rule_exempts_range_exchange_offsets(tables):
    # ops/ids.global_cumsum_multi's offsets window runs over a
    # groupBy(spark_partition_id()) aggregate — bounded by the partition
    # count (the _pid sanction), and the kernel itself must stay clean
    from assignment_etl_spark.ops.ids import global_cumsum_multi

    df = global_cumsum_multi(
        tables["orders"].select("o_orderkey", "o_totalprice"),
        [F.asc("o_orderkey")],
        [("o_totalprice", "cum_price")],
    )
    assert audit_global_windows(df) == []


def test_window_rule_flags_continuous_distinct_window(tables):
    # Deduplicate follows the same rule: distinct() on a continuous
    # column is one row per value — still sf-proportional
    vals = tables["orders"].select(F.col("o_totalprice").alias("t")).distinct()
    w = Window.orderBy("t")
    df = vals.withColumn("rn", F.row_number().over(w))
    assert audit_global_windows(df) == ["global-window-over-orders"]


def test_window_rule_exempts_limit_before_window(tables):
    # orderBy().limit(n) → TakeOrderedAndProject; the window input is ≤ n
    top = tables["orders"].orderBy("o_orderkey").limit(100)
    w = Window.orderBy("o_orderkey")
    df = top.withColumn("rn", F.row_number().over(w))
    assert audit_global_windows(df) == []


def test_window_rule_exempts_partitioned_window(tables):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    df = tables["orders"].withColumn("rn", F.row_number().over(w))
    assert audit_global_windows(df) == []


def test_window_rule_exempts_bounded_key_filter(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8)
    w = Window.orderBy("vec_id")
    df = q.withColumn("rn", F.row_number().over(w))
    assert audit_global_windows(df) == []


def test_window_rule_scalable_rank_paths_are_clean(spark):
    # the two round-6 de-funneled operators must stay clean
    from assignment_etl_spark.ext.lexdiv import zipf_slope
    from assignment_etl_spark.ext.rankcmp import ranked

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert audit_global_windows(zipf_slope(docs)) == []
    scored = docs.select("doc_id", F.length("text").alias("score"))
    assert (
        audit_global_windows(ranked(scored, id_col="doc_id", score_col="score"))
        == []
    )


def test_flags_negated_and_disjunctive_key_filters(spark):
    # NOT (vec_id < 8) keeps the sf-proportional complement; an OR arm
    # widens the filter past the bounded comparison — both must flag
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    neg = emb.filter(~(F.col("vec_id") < 8))
    assert audit_broadcast_hints(
        emb.crossJoin(F.broadcast(neg.select("vec_id")))
    ) == ["broadcast-hint-over-embeddings"]
    disj = emb.filter((F.col("vec_id") == 8) | (F.col("label") == 1))
    assert audit_broadcast_hints(
        emb.crossJoin(F.broadcast(disj.select("vec_id")))
    ) == ["broadcast-hint-over-embeddings"]


def test_window_rule_flags_composite_key_mixing_unbounded_leaf(tables):
    # r8 TIGHTENING (ADVICE r7): a composite grouping key that mixes an
    # UNBOUNDED column with a calendar function — concat(c_name,
    # year(ts)) / struct(o_custkey, to_date(ts)) — must NOT be sanctioned
    # by the calendar function buried inside it (pre-r8 `search` matched
    # anywhere: audit fail-open)
    per = tables["orders"].groupBy(
        F.concat(
            F.col("o_custkey").cast("string"), F.year("o_orderdate")
        ).alias("k")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("n", "k")
    df = per.withColumn("rn", F.row_number().over(w))
    assert audit_global_windows(df) == ["global-window-over-orders"]

    per2 = tables["orders"].groupBy(
        F.struct(F.col("o_custkey"), F.to_date("o_orderdate")).alias("k")
    ).agg(F.count(F.lit(1)).alias("n"))
    df2 = per2.withColumn(
        "rn", F.row_number().over(Window.orderBy("n"))
    )
    assert audit_global_windows(df2) == ["global-window-over-orders"]


def test_window_rule_exempts_composite_of_bounded_leaves(tables):
    # ...but a composite whose EVERY leaf is bounded (enum attr +
    # calendar bucket + literal separator) stays sanctioned
    per = tables["orders"].groupBy(
        F.concat_ws(
            "-", F.col("o_orderstatus"), F.year("o_orderdate")
        ).alias("k")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("n", "k")
    df = per.withColumn("rn", F.row_number().over(w))
    assert audit_global_windows(df) == []
