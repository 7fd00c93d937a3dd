"""Driver-contract sanity: entry() runs, queries()/oracle_sql() keys line
up, and a fast subset hash-matches DuckDB at sf0.001 (the full sweep lives
in tools/check_correctness.py at sf0.01)."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod
from tools.check_correctness import canon

FAST_SUBSET = [
    "pricing_summary",
    "revenue_by_region",
    "top_orders_per_customer",
    "histogram_extendedprice",
    "unit_normalization",
    "sex_code_mapping",
    "text_stats_by_lang",
    "session_windows",
    "order_count_distribution",
    "sole_returning_supplier",
    "scd2_customer_priority",
    "user_stickiness",
    "model_score_histogram",
    "shuffle_head",
]


def test_contract_keys():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # round 2: every gate query is oracle-checked (portable hashing for the
    # LSH family, sha256 math for multimodal) — zero rows-only entries
    assert set(qs) == set(oracles)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "sum_qty" in df.columns


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    got = entry_mod.queries()[name](spark, sf_dir).toPandas()
    exp = oracle_con.execute(entry_mod.oracle_sql()[name]).df()
    assert canon(got) == canon(exp)

def test_gates_manifest_matches_registry():
    """GATES.json tripwire (VERDICT r7 ask #3): the committed manifest must
    name exactly the registry's gates AND pin each gate's sf0.001 DuckDB
    oracle fingerprint. A module Write that clobbers a registered gate
    (the 6be38ef near-miss), a rename, a shadowing duplicate, or a
    drive-by oracle semantics change all fail HERE with the gate's name.
    Deliberate changes regenerate with: python tools/make_gates_manifest.py"""
    import json

    from tools.make_gates_manifest import OUT, build_manifest

    with open(OUT) as f:
        committed = json.load(f)["gates"]
    rebuilt = build_manifest()

    missing = sorted(set(committed) - set(rebuilt))
    added = sorted(set(rebuilt) - set(committed))
    assert not missing and not added, (
        f"gate registry drifted from GATES.json — gates in manifest but "
        f"GONE from the registry (deleted/renamed/shadowed?): {missing}; "
        f"gates in registry but not in manifest (run "
        f"tools/make_gates_manifest.py): {added}"
    )
    changed = sorted(n for n in rebuilt if rebuilt[n] != committed[n])
    assert not changed, (
        f"oracle fingerprint changed for gates {changed} — if deliberate, "
        f"regenerate with: python tools/make_gates_manifest.py"
    )


def test_bench_registry_partition():
    """HEADLINE ∪ EXCLUDED == registry, disjointly (VERDICT r7 ask #4):
    the deliberately-not-benched set is data with per-gate reasons, not
    prose — a new gate must land in exactly one list."""
    import bench

    bench.check_registry_partition(entry_mod.queries())
    for name, reason in bench.EXCLUDED.items():
        assert reason and isinstance(reason, str), name
