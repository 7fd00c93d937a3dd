"""Cross-source overlap matrix (ext/overlap.py): hand-computable
pairwise Jaccard, normalization invariance, and within-source dup
collapse."""

import pytest

from assignment_etl_spark.ext.overlap import source_overlap_matrix


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta", "a"),
        (2, "gamma delta", "a"),
        (3, "epsilon zeta", "a"),
        (4, "ALPHA   beta", "b"),   # dup of 1 modulo case/whitespace
        (5, "eta theta", "b"),
        (6, "gamma delta", "c"),    # dup of 2
        (7, "gamma delta", "c"),    # within-source dup: one fingerprint
        (8, "iota kappa", "c"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pairwise_jaccard(spark, docs):
    got = {
        (r.source_a, r.source_b): r
        for r in source_overlap_matrix(docs).collect()
    }
    # a∩b = {alpha beta}; a has 3 fps, b has 2 → jaccard 1/4
    ab = got[("a", "b")]
    assert (ab.n_a, ab.n_b, ab.n_shared) == (3, 2, 1)
    assert ab.jaccard == 0.25
    # a∩c = {gamma delta}; c's within-source dup collapses to 2 fps
    ac = got[("a", "c")]
    assert (ac.n_a, ac.n_b, ac.n_shared) == (3, 2, 1)
    assert ac.jaccard == 0.25
    # b∩c = ∅ → pair PRESENT with explicit zeros (ADVICE r5: absence must
    # not be ambiguous between "no overlap" and "not computed")
    bc = got[("b", "c")]
    assert (bc.n_a, bc.n_b, bc.n_shared, bc.jaccard) == (2, 2, 0, 0.0)
    # exactly C(3,2) pairs, every source pair covered
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}


def test_no_overlap_emits_zero_pair(spark):
    rows = [(1, "x y", "a"), (2, "z w", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = source_overlap_matrix(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.source_a, r.source_b, r.n_shared, r.jaccard) == ("a", "b", 0, 0.0)


def test_null_text_excluded(spark):
    # xxhash64(NULL) is the SEED, not NULL — unfiltered it would count as
    # a shared "document" across every source; the operator must drop it
    rows = [(1, None, "a"), (2, None, "b"), (3, "x y", "a"), (4, "x y", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = source_overlap_matrix(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_a, r.n_b, r.n_shared, r.jaccard) == (1, 1, 1, 1.0)
