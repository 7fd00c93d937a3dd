"""ext/packing.py: sequence packing layout vs hand-computed intervals,
manifest invariants (all-but-last sequences exactly budget tokens,
token conservation), boundary straddling, zero-token exclusion,
precomputed-count path, guards."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.packing import pack_sequences, sequence_manifest


def _docs(spark):
    # token counts: d1=3, d2=5, d3=4, d4=0 (excluded), d5=2 → stream of 14
    rows = [
        (1, "a b c"),
        (2, "d e f g h"),
        (3, "i j  k\tl"),
        (4, "   "),
        (5, "m n"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_layout_hand_computed(spark):
    got = {
        r.doc_id: (r.n_tokens, r.tok_start, r.seq_first, r.seq_last)
        for r in pack_sequences(_docs(spark), budget=4).collect()
    }
    # budget 4: stream offsets 0..13; seq boundaries at 4, 8, 12
    assert got == {
        1: (3, 0, 0, 0),     # tokens 0-2 → seq 0
        2: (5, 3, 0, 1),     # tokens 3-7 → straddles seqs 0,1
        3: (4, 8, 2, 2),     # tokens 8-11 → exactly seq 2
        5: (2, 12, 3, 3),    # tokens 12-13 → seq 3 (final, partial)
    }  # doc 4 (zero tokens) excluded


def test_manifest_invariants(spark):
    packed = pack_sequences(_docs(spark), budget=4)
    m = {r.seq_id: (r.n_docs, r.n_tokens)
         for r in sequence_manifest(packed, budget=4).collect()}
    assert m == {0: (2, 4), 1: (1, 4), 2: (1, 4), 3: (1, 2)}
    # conservation: manifest tokens == corpus tokens
    assert sum(v[1] for v in m.values()) == 14
    # every sequence but the last is exactly the budget
    last = max(m)
    assert all(m[s][1] == 4 for s in m if s != last)


def test_larger_corpus_invariants_and_count_col(spark):
    df = spark.range(1, 301).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 7, F.lit(23)) + 1).alias("ntok"),
    )
    packed = pack_sequences(
        df, budget=64, token_count_col="ntok", text_col="unused"
    )
    total = df.agg(F.sum("ntok")).collect()[0][0]
    m = sequence_manifest(packed, budget=64).orderBy("seq_id").collect()
    assert sum(r.n_tokens for r in m) == total
    assert all(r.n_tokens == 64 for r in m[:-1])
    assert 0 < m[-1].n_tokens <= 64
    assert [r.seq_id for r in m] == list(range(len(m)))  # no gaps
    # doc spans are contiguous and consistent with the manifest doc counts
    p = packed.collect()
    assert sum(r.seq_last - r.seq_first + 1 for r in p) == sum(
        r.n_docs for r in m
    )


def test_guards(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)
    with pytest.raises(ValueError, match="budget"):
        sequence_manifest(pack_sequences(df, budget=4), budget=0)
