"""Event-sequence pattern matching (ops/sequence.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ops.sequence import (
    contiguous_sequence_count,
    sequence_signature,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 0, m), u, t)
            for i, (u, m, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_contiguous_match_and_overlap(spark):
    # user 1: A B A B A -> pattern [A,B,A] matches at positions 2 and 4
    rows = [(1, m, t) for m, t in enumerate(["A", "B", "A", "B", "A"])]
    out = contiguous_sequence_count(_ev(spark, rows), ["A", "B", "A"]).collect()
    assert [(r.user_id, r.n_matches) for r in out] == [(1, 2)]


def test_contiguous_requires_adjacency(spark):
    # an interleaved event breaks the run
    rows = [(1, m, t) for m, t in enumerate(["A", "x", "B", "A"])]
    assert contiguous_sequence_count(_ev(spark, rows), ["A", "B", "A"]).count() == 0


def test_contiguous_respects_keys(spark):
    # the pattern must not match across different users
    rows = [(1, 0, "A"), (1, 1, "B"), (2, 2, "A")]
    assert contiguous_sequence_count(_ev(spark, rows), ["A", "B", "A"]).count() == 0


def test_within_seconds_bound(spark):
    # A at :00, B at :01, A at :50 -> 49-minute span fails a 30-min bound
    rows = [(1, 0, "A"), (1, 1, "B"), (1, 50, "A")]
    ev = _ev(spark, rows)
    assert contiguous_sequence_count(ev, ["A", "B", "A"]).count() == 1
    assert (
        contiguous_sequence_count(ev, ["A", "B", "A"], within_seconds=30 * 60).count()
        == 0
    )


def test_short_pattern_rejected(spark):
    with pytest.raises(ValueError):
        contiguous_sequence_count(_ev(spark, [(1, 0, "A")]), ["A"])


def test_sequence_signature_orders_and_codes(spark):
    rows = [(1, 2, "B"), (1, 0, "A"), (1, 1, "other"), (2, 0, "B")]
    out = {
        r.user_id: r.signature
        for r in sequence_signature(
            _ev(spark, rows), {"A": "a", "B": "b"}
        ).collect()
    }
    assert out == {1: "axb", 2: "b"}


def test_signature_regex_agrees_with_contiguous(spark):
    rows = [(1, m, t) for m, t in enumerate(["A", "B", "A", "B", "A", "C"])]
    ev = _ev(spark, rows)
    sig = sequence_signature(ev, {"A": "a", "B": "b", "C": "c"})
    # overlapping occurrences of 'aba': regex lookahead counts both
    n = sig.select(
        F.regexp_count("signature", F.lit("(?=aba)")).alias("n")
    ).collect()[0].n
    lag_n = contiguous_sequence_count(ev, ["A", "B", "A"]).collect()[0].n_matches
    assert n == lag_n == 2
