"""Sequence packing: next-fit bound, strict greedy budget, determinism."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.packing import bin_stats, pack_greedy, pack_next_fit

BUDGET = 100


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37 + 5).cast("long").alias("n_tokens"),
    )


def test_next_fit_partitions_all_docs(docs):
    packed = pack_next_fit(docs, BUDGET, n_groups=3)
    assert packed.count() == 500
    assert packed.select("pack_group").distinct().count() == 3
    # every doc keeps its tokens; ids unique
    assert packed.select("doc_id").distinct().count() == 500


def test_next_fit_overshoot_bound(docs):
    packed = pack_next_fit(docs, BUDGET, n_groups=3)
    stats = bin_stats(packed).collect()
    max_doc = 41  # id % 37 + 5 <= 41
    assert all(r.n_tokens <= BUDGET + max_doc for r in stats)
    # all but each group's last bin are filled past the budget boundary
    last = {
        r.pack_group: r.bin
        for r in packed.groupBy("pack_group").agg(F.max("bin").alias("bin")).collect()
    }
    for r in stats:
        if r.bin != last[r.pack_group]:
            assert r.n_tokens + 41 > BUDGET


def test_next_fit_deterministic(docs):
    a = pack_next_fit(docs, BUDGET, n_groups=3)
    b = pack_next_fit(docs.repartition(11), BUDGET, n_groups=3)
    assert a.exceptAll(b).count() == 0


def test_greedy_strict_budget(docs):
    packed = pack_greedy(docs, BUDGET, n_groups=8)
    assert packed.count() == 500
    stats = bin_stats(packed).collect()
    assert all(r.n_tokens <= BUDGET for r in stats)
    assert packed.filter("oversize").count() == 0


def test_greedy_oversize_doc_gets_solo_bin(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 500), (3, 60), (4, 30)], "doc_id long, n_tokens long"
    )
    packed = pack_greedy(df, BUDGET, n_groups=1)
    rows = {r.doc_id: r for r in packed.collect()}
    assert rows[2].oversize
    solo_bin = rows[2].bin
    assert all(r.bin != solo_bin for r in rows.values() if r.doc_id != 2)
    # non-oversize bins respect the budget
    ok = bin_stats(packed).filter(F.col("bin") != solo_bin).collect()
    assert all(r.n_tokens <= BUDGET for r in ok)


def test_greedy_matches_python_model(spark):
    import random

    rng = random.Random(11)
    data = [(i, rng.randint(1, 120)) for i in range(300)]
    df = spark.createDataFrame(data, "doc_id long, n_tokens long")
    packed = pack_greedy(df, BUDGET, n_groups=4)
    got = {
        r.doc_id: (r.pack_group, r.bin, r.bin_pos) for r in packed.collect()
    }

    # independent model: same hash, same order, same next-fit-with-boundary
    from assignment_etl_spark.portable import ADD_B, MULT_A, PRIME_P, XSHIFT

    def h01(x, salt=0):
        h = (x + salt) % PRIME_P
        h = (h * MULT_A + ADD_B) % PRIME_P
        h = h ^ (h >> XSHIFT)
        h = (h * MULT_A + ADD_B) % PRIME_P
        return (h + 1) / (PRIME_P + 1)

    groups: dict[int, list[tuple[float, int, int]]] = {}
    for i, t in data:
        g = int(h01(i) * 4) % 4
        groups.setdefault(g, []).append((h01(i, 1), i, t))
    for g, items in groups.items():
        items.sort()
        b = fill = pos = 0
        for _, i, t in items:
            big = t > BUDGET
            if fill > 0 and (fill + t > BUDGET or big):
                b, fill, pos = b + 1, 0, 0
            assert got[i] == (g, b, pos), f"doc {i}"
            fill += t
            pos += 1
            if big:
                b, fill, pos = b + 1, 0, 0


def test_invalid_budget(docs):
    with pytest.raises(ValueError):
        pack_next_fit(docs, 0)
    with pytest.raises(ValueError):
        pack_greedy(docs, -5)


def test_greedy_int_id_type_preserved(spark):
    df = spark.createDataFrame([(1, 50), (2, 60)], "doc_id int, n_tokens long")
    packed = pack_greedy(df, 100, n_groups=1)
    assert dict(packed.dtypes)["doc_id"] == "int"
    assert packed.count() == 2


# ------------------------------------------------- stream chunking (r7)
from assignment_etl_spark.ext.packing import pack_stream, sequence_manifest


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
        for r in pack_stream(_docs(spark), budget=4).collect()
    }
    # budget 4: stream offsets 0..13; seq boundaries at 4, 8, 12
    assert got == {
        1: (3, 0, 0, 0),     # tokens 0-2 → seq 0
        2: (5, 3, 0, 1),     # tokens 3-7 → straddles seqs 0,1
        3: (4, 8, 2, 2),     # tokens 8-11 → exactly seq 2
        5: (2, 12, 3, 3),    # tokens 12-13 → seq 3 (final, partial)
    }  # doc 4 (zero tokens) excluded


def test_manifest_invariants(spark):
    packed = pack_stream(_docs(spark), budget=4)
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
    packed = pack_stream(
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
        pack_stream(df, budget=0)
    with pytest.raises(ValueError, match="budget"):
        sequence_manifest(pack_stream(df, budget=4), budget=0)
