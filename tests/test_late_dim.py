"""Late-arriving dimensions (ops/late_dim.py): inferred members, no
dropped facts, idempotent reconciliation."""

from pyspark.sql import functions as F

from assignment_etl_spark.ops.late_dim import (
    dim_with_inferred,
    inferred_members,
    reconcile_inferred,
)


def _frames(spark):
    facts = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (9, 90.0), (9, 91.0), (None, 5.0)],
        "cust long, amount double",
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "cust long, tier string"
    )
    return facts, dim


def test_inferred_members_created_for_missing_keys(spark):
    facts, dim = _frames(spark)
    inf = inferred_members(
        facts, dim, fact_key="cust", dim_key="cust", defaults={"tier": "UNKNOWN"}
    ).collect()
    assert len(inf) == 1  # only key 9; NULL fact keys never infer
    assert (inf[0].cust, inf[0].tier, inf[0]._inferred) == (9, "UNKNOWN", True)


def test_every_fact_joins(spark):
    facts, dim = _frames(spark)
    full = dim_with_inferred(
        facts, dim, fact_key="cust", dim_key="cust", defaults={"tier": "UNKNOWN"}
    )
    joined = facts.join(full, on="cust")  # inner join, nothing drops
    assert joined.count() == 4  # all non-null-key facts
    assert joined.filter("cust = 9").first().tier == "UNKNOWN"


def test_reconcile_replaces_placeholder_and_is_idempotent(spark):
    facts, dim = _frames(spark)
    table = dim_with_inferred(
        facts, dim, fact_key="cust", dim_key="cust", defaults={"tier": "UNKNOWN"}
    )
    arrivals = spark.createDataFrame([(9, "bronze")], "cust long, tier string")
    once = reconcile_inferred(table, arrivals, dim_key="cust")
    assert once.filter("_inferred").count() == 0
    assert once.filter("cust = 9").first().tier == "bronze"
    assert once.count() == 3
    twice = reconcile_inferred(once, arrivals, dim_key="cust")
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))


def test_reconcile_keeps_unarrived_placeholders(spark):
    facts, dim = _frames(spark)
    table = dim_with_inferred(
        facts, dim, fact_key="cust", dim_key="cust", defaults={"tier": "UNKNOWN"}
    )
    unrelated = spark.createDataFrame([(1, "gold2")], "cust long, tier string")
    got = reconcile_inferred(table, unrelated, dim_key="cust")
    assert got.filter("cust = 9 AND _inferred").count() == 1  # still waiting
    assert got.filter("cust = 1").first().tier == "gold2"  # superseded
