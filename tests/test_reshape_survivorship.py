"""Unpivot (ops/reshape.py) and golden-record survivorship
(ops/survivorship.py)."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ops.reshape import unpivot
from assignment_etl_spark.ops.survivorship import golden_record


def test_unpivot_basic(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 100.0), (2, 20.0, None)], "k long, a double, b double"
    )
    got = sorted(
        map(tuple, unpivot(df, id_cols=["k"], value_cols=["a", "b"]).collect())
    )
    assert got == [
        (1, "a", 10.0),
        (1, "b", 100.0),
        (2, "a", 20.0),
        (2, "b", None),  # melted nulls kept
    ]


def test_unpivot_casts_to_common_type(spark):
    df = spark.createDataFrame([(1, 2, 3.5)], "k long, i int, d double")
    got = unpivot(df, id_cols=["k"], value_cols=["i", "d"]).collect()
    assert {(r.variable, r.value) for r in got} == {("i", 2.0), ("d", 3.5)}


def test_unpivot_requires_value_cols(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        unpivot(df, id_cols=["k"], value_cols=[])


def _sources(spark):
    # key 1: crm(1) has name but no email; billing(2) has both;
    #        scrape(3) disagrees on name
    rows = [
        (1, 1, "Ada", None),
        (1, 2, None, "ada@x.com"),
        (1, 3, "A. Lovelace", "old@x.com"),
        (2, 2, None, None),
        (2, 3, "Bob", "bob@y.com"),
    ]
    return spark.createDataFrame(
        rows, "k long, priority int, name string, email string"
    )


def test_golden_record_column_level(spark):
    got = {
        r.k: r
        for r in golden_record(
            _sources(spark),
            key="k",
            order_by=["priority"],
            value_cols=["name", "email"],
        ).collect()
    }
    assert got[1].name == "Ada"  # from priority 1
    assert got[1].email == "ada@x.com"  # first NON-NULL: priority 2
    assert got[1].n_sources == 3
    assert got[2].name == "Bob" and got[2].email == "bob@y.com"


def test_golden_record_conflict_flags(spark):
    got = {
        r.k: r
        for r in golden_record(
            _sources(spark),
            key="k",
            order_by=["priority"],
            value_cols=["name", "email"],
            conflict_flags=True,
        ).collect()
    }
    assert got[1].name_n_distinct == 2  # Ada vs A. Lovelace
    assert got[1].email_n_distinct == 2
    assert got[2].name_n_distinct == 1


def test_golden_record_deterministic_with_tiebreak(spark):
    # two sources at the same priority: the unique tie-breaker decides
    rows = [(1, 1, "s1", "X"), (1, 1, "s2", "Y")]
    df = spark.createDataFrame(rows, "k long, priority int, src string, v string")
    got = golden_record(
        df, key="k", order_by=["priority", "src"], value_cols=["v"]
    ).first()
    assert got.v == "X"
