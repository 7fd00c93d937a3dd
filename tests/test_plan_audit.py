"""Plan-audit harness (tools/plan_audit.py): the string auditor on known
plan shapes, plus live hard-violation checks on representative queries."""

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")
from plan_audit import HARD, audit_plan  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

REPRESENTATIVE = [
    "pricing_summary",          # scan + single hash agg
    "revenue_by_region",        # broadcast star join
    "perplexity_top_docs",      # LM train+score, windows + broadcasts
    "minhash_lsh_pairs",        # LSH banding self-join
    "top_orders_per_customer",  # window ranking
]


def test_audit_plan_counts():
    plan = (
        "AdaptiveSparkPlan\n"
        "+- Exchange hashpartitioning\n"
        "   +- *(1) HashAggregate\n"
        "      +- *(1) BroadcastHashJoin\n"
        "         +- *(2) Filter\n"
        "         +- FileScan parquet ... PushedFilters: [IsNotNull(x)], ...\n"
        "         +- FileScan parquet ... PushedFilters: [], ...\n"
    )
    c = audit_plan(plan)
    assert c["Exchange"] == 1 and c["BroadcastHashJoin"] == 1
    assert c["WholeStageCodegen"] == 2  # distinct *(N) stage ids
    assert c["scans"] == 2 and c["scans_with_pushdown"] == 1
    assert all(c[k] == 0 for k in HARD)


def test_audit_plan_flags_hard_violations():
    c = audit_plan("CartesianProduct\nBatchEvalPython")
    assert c["CartesianProduct"] == 1 and c["BatchEvalPython"] == 1


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_no_hard_violations_live(spark, name):
    df = entry.queries()[name](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    c = audit_plan(plan)
    assert not any(c[k] for k in HARD), {k: c[k] for k in HARD}


def test_star_join_broadcasts_and_pushes_down(spark):
    df = entry.queries()["revenue_by_region"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    c = audit_plan(plan)
    assert c["BroadcastHashJoin"] >= 3  # region/nation/customer dims broadcast
    assert c["scans_with_pushdown"] >= 1
