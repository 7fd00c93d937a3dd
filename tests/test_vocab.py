"""Vocabulary building + integer encoding (ext/vocab.py)."""

import pytest

from assignment_etl_spark.ext.vocab import UNK_ID, build_vocab, encode_docs


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "b a a c"),
            (2, "a b zz"),
            (3, ""),
        ],
        "doc_id long, text string",
    )


def test_build_vocab_ranking(corpus):
    # counts: a=3, b=2, c=1, zz=1 → ids by (freq desc, token asc)
    v = {r.token: (r.token_id, r.n) for r in build_vocab(corpus).collect()}
    assert v == {"a": (1, 3), "b": (2, 2), "c": (3, 1), "zz": (4, 1)}


def test_build_vocab_min_count_and_max_size(corpus):
    v = build_vocab(corpus, min_count=2).collect()
    assert {r.token for r in v} == {"a", "b"}
    v = build_vocab(corpus, max_size=1).collect()
    assert [(r.token, r.token_id) for r in v] == [("a", 1)]


def test_encode_docs_order_and_unk(corpus):
    vocab = build_vocab(corpus, min_count=2)  # a→1, b→2; c/zz unk
    enc = {r.doc_id: r for r in encode_docs(corpus, vocab).collect()}
    assert list(enc[1].token_ids) == [2, 1, 1, UNK_ID]  # "b a a c"
    assert list(enc[2].token_ids) == [1, 2, UNK_ID]     # "a b zz"
    assert enc[1].n_tokens == 4 and enc[1].n_unk == 1
    assert enc[2].n_tokens == 3 and enc[2].n_unk == 1
    assert 3 not in enc  # empty doc -> no row


def test_two_phase_topk_is_lossless(spark):
    """Per-partition pruning must not change the global top-max_size:
    many distinct tokens spread over many partitions, small max_size,
    result must equal the brute-force ranking."""
    from pyspark.sql import functions as F

    docs = (
        spark.range(0, 3000, 1, 16)
        .select(
            F.col("id").alias("doc_id"),
            # token t{k} appears (3000-k) times total across docs
            F.concat(F.lit("t"), (F.col("id") % 500).cast("string")).alias("text"),
        )
    )
    got = build_vocab(docs, max_size=10).collect()
    assert len(got) == 10
    # brute-force expectation: every t{k} for k in 0..499 has n=6; ties
    # break lexically ascending
    expect_tokens = sorted(f"t{k}" for k in range(500))[:10]
    assert [r.token for r in sorted(got, key=lambda r: r.token_id)] == expect_tokens
    assert all(r.n == 6 for r in got)
