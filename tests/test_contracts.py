"""Data contracts (ops/contracts.py): rule builders, one-pass report,
set-level rules, and row flagging."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ops.contracts import (
    check_contract,
    flag_violations,
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    unique_key,
    validate,
)


@pytest.fixture(scope="module")
def data(spark):
    return spark.createDataFrame(
        [
            (1, "A", 10.0, "x@y.com"),
            (2, "B", -5.0, "bad"),
            (2, "Z", 300.0, None),
            (None, "A", 50.0, "a@b.org"),
        ],
        "id long, code string, amount double, email string",
    )


def _rules():
    # built lazily: Column expressions need an active SparkContext
    return {
        "id_not_null": not_null("id"),
        "code_enum": in_set("code", ["A", "B"]),
        "amount_range": in_range("amount", lo=0.0, hi=100.0),
        "email_shape": matches("email", r"^[^@]+@[^@]+$"),
    }


def test_one_pass_report(data):
    got = {r.rule: r.n_violations for r in check_contract(data, _rules()).collect()}
    assert got == {
        "id_not_null": 1,
        "code_enum": 1,       # Z; NULLs don't violate enum
        "amount_range": 2,    # -5 and 300
        "email_shape": 1,     # "bad"; NULL not a violation
    }


def test_set_rules(spark, data):
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    report = validate(
        data,
        _rules(),
        set_rules=[
            unique_key(data, ["id"], rule="id_unique"),
            foreign_key(data, "id", dim, "k", rule="id_fk"),
        ],
    )
    got = {r.rule: r.n_violations for r in report.collect()}
    assert got["id_unique"] == 1  # id=2 twice -> one extra row
    assert got["id_fk"] == 0      # nulls excluded; 1 and 2 both present


def test_flag_violations(data):
    flagged = {r.email: sorted(r.violated_rules)
               for r in flag_violations(data, _rules()).collect()}
    assert flagged["x@y.com"] == []
    assert flagged["bad"] == ["amount_range", "email_shape"]
    assert flagged[None] == ["amount_range", "code_enum"]


def test_clean_table_is_all_zero(spark):
    clean = spark.createDataFrame([(1, "A")], "id long, code string")
    rules = {"id_not_null": not_null("id"), "code_enum": in_set("code", ["A"])}
    assert all(r.n_violations == 0 for r in check_contract(clean, rules).collect())


def test_dotted_rule_names(spark):
    """Rule names containing dots must survive the alias/reference
    round-trip (previously re-parsed as struct-field access)."""
    from assignment_etl_spark.ops import contracts as C

    df = spark.createDataFrame([(1.0,), (-2.0,), (None,)], "usd double")
    rules = {
        "price.usd_positive": C.in_range("usd", lo=0.0),
        "price.usd_not_null": C.not_null("usd"),
    }
    rep = {r.rule: r.n_violations for r in C.check_contract(df, rules).collect()}
    assert rep == {"price.usd_positive": 1, "price.usd_not_null": 1}
