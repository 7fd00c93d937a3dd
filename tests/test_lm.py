"""Bigram LM perplexity filtering (ext/lm.py): hand-computed goldens on a
tiny corpus, degenerate inputs, and the CCNet keep-rule."""

import math

import pytest

from assignment_etl_spark.ext.lm import (
    BACKOFF,
    perplexity_filter,
    score_backoff,
    score_perplexity,
    train_backoff_lm,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat ran"),
            (3, "zq zzy qqz"),
            (4, ""),          # no tokens -> no score row
            (5, "the cat sat"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def lm(corpus):
    return train_bigram_lm(corpus)


def test_count_tables(lm):
    bigrams = {(r.prev, r.token): r.n_bigram for r in lm["bigrams"].collect()}
    # <s> starts every non-empty doc; "the cat" appears in docs 1, 2, 5
    assert bigrams[("<s>", "the")] == 3
    assert bigrams[("the", "cat")] == 3
    assert bigrams[("cat", "sat")] == 2
    assert bigrams[("cat", "ran")] == 1
    contexts = {r.prev: r.n_ctx for r in lm["contexts"].collect()}
    assert contexts["<s>"] == 4 and contexts["cat"] == 3
    assert lm["vocab"].first().vocab_size == 7


def test_hand_computed_perplexity(corpus, lm):
    got = {r.doc_id: r for r in score_perplexity(corpus, lm).collect()}
    # doc 1: p(the|<s>)=4/11, p(cat|the)=4/10, p(sat|cat)=3/10 (alpha=1, V=7)
    lps = [round(math.log2(p), 6) for p in (4 / 11, 4 / 10, 3 / 10)]
    expected = round(2 ** (-sum(lps) / 3), 4)
    assert got[1].ppl == pytest.approx(expected, abs=1e-4)
    assert got[1].n_tokens == 3
    # identical docs score identically; gibberish scores strictly worse
    assert got[5].ppl == got[1].ppl
    assert got[3].ppl > got[2].ppl > got[1].ppl
    # empty doc produces no row
    assert 4 not in got


def test_unseen_tokens_fall_to_alpha_floor(spark, corpus, lm):
    new = spark.createDataFrame([(9, "totally unseen words")], "doc_id long, text string")
    row = score_perplexity(new, lm).first()
    # every bigram unseen, first context <s> seen (n_ctx=4), rest unseen:
    # p = 1/11, 1/7, 1/7
    lps = [round(math.log2(p), 6) for p in (1 / 11, 1 / 7, 1 / 7)]
    assert row.ppl == pytest.approx(round(2 ** (-sum(lps) / 3), 4), abs=1e-4)


def test_perplexity_filter_keeps_fluent(corpus, lm):
    kept = perplexity_filter(corpus, lm, max_ppl=4.0)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2, 5]
    assert set(kept.columns) == set(corpus.columns) | {"ppl"}


def test_backoff_count_tables(corpus):
    blm = train_backoff_lm(corpus)
    tri = {(r.prev2, r.prev1, r.token): r.n3 for r in blm["trigrams"].collect()}
    # "the cat sat" in docs 1 and 5; doc 2 shares the (<s>,the,cat) start
    assert tri[("<s>", "the", "cat")] == 3
    assert tri[("the", "cat", "sat")] == 2
    assert tri[("the", "cat", "ran")] == 1
    tot = blm["totals"].first()
    assert tot.n_tokens == 12 and tot.vocab_size == 7


def test_backoff_branches_hand_computed(spark, corpus):
    blm = train_backoff_lm(corpus)
    # seen trigram path: doc "the cat sat" scores 3/4, 3/3, 2/3
    row = {r.doc_id: r for r in score_backoff(corpus, blm).collect()}[1]
    lps = [round(math.log2(p), 6) for p in (3 / 4, 3 / 3, 2 / 3)]
    assert row.sppl == pytest.approx(round(2 ** (-sum(lps) / 3), 4), abs=1e-4)

    # backoff paths: trigram (<s>,<s>,zq) seen once with ctx3(<s>,<s>)=4
    # (four non-empty docs start there); the second token is unseen at
    # every order -> the add-one unigram floor with two 0.4 hops
    new = spark.createDataFrame([(9, "zq unseenword")], "doc_id long, text string")
    got = score_backoff(new, blm).first()
    p1 = 1 / 4
    p2 = BACKOFF * BACKOFF * (0 + 1.0) / (12 + 7)
    lps = [round(math.log2(p), 6) for p in (p1, p2)]
    assert got.sppl == pytest.approx(round(2 ** (-sum(lps) / 2), 4), abs=1e-4)


def test_backoff_gibberish_scores_worse(corpus):
    blm = train_backoff_lm(corpus)
    scores = {r.doc_id: r.sppl for r in score_backoff(corpus, blm).collect()}
    assert scores[3] > scores[1]


def test_broadcast_off_same_result(corpus, lm):
    a = {(r.doc_id, r.ppl) for r in score_perplexity(corpus, lm, broadcast_lm=True).collect()}
    b = {(r.doc_id, r.ppl) for r in score_perplexity(corpus, lm, broadcast_lm=False).collect()}
    assert a == b


def test_dsir_weights_prefer_target_like(spark):
    from assignment_etl_spark.ext.dsir import dsir_weights

    legal = "the party of the first part agrees to the terms herein"
    chat = "lol ok cool see you later then bye for now"
    raw = spark.createDataFrame(
        [(1, legal), (2, chat), (3, legal + " and the second part"),
         (4, chat + " ok bye")],
        "doc_id long, text string",
    )
    target = raw.filter("doc_id = 1")  # legal-style target domain
    w = {r.doc_id: r for r in dsir_weights(raw, target).collect()}
    assert len(w) == 4
    # legal-style docs score more target-like than chat-style docs
    assert w[3].log2_ratio_per_token > w[2].log2_ratio_per_token
    assert w[3].log2_ratio_per_token > w[4].log2_ratio_per_token
    assert w[1].log2_ratio_per_token > w[2].log2_ratio_per_token


def test_kneser_ney_hand_computed(corpus):
    from assignment_etl_spark.ext.lm import kneser_ney_bigram
    from collections import Counter

    rows = kneser_ney_bigram(corpus).collect()
    # brute-force replay
    texts = ["the cat sat", "the cat ran", "zq zzy qqz", "", "the cat sat"]
    bigrams = Counter()
    for t in texts:
        toks = [w for w in t.split(" ") if w]
        prev = "<s>"
        for w in toks:
            bigrams[(prev, w)] += 1
            prev = w
    ctx_total = Counter(); n1_fwd = Counter(); n1_bwd = Counter()
    for (v, w), c in bigrams.items():
        ctx_total[v] += c; n1_fwd[v] += 1; n1_bwd[w] += 1
    n1_tot = len(bigrams)
    D = 0.75
    assert len(rows) == n1_tot
    for r in rows:
        c = bigrams[(r.prev, r.token)]
        assert (r.n_bigram, r.n_ctx, r.n1_fwd, r.n1_bwd) == (
            c, ctx_total[r.prev], n1_fwd[r.prev], n1_bwd[r.token]
        )
        want = max(c - D, 0.0) / ctx_total[r.prev] + (
            D * n1_fwd[r.prev] / ctx_total[r.prev]
        ) * (n1_bwd[r.token] / n1_tot)
        assert r.p_kn == pytest.approx(want, abs=1e-9)
    # normalization identity: sum over the FULL continuation vocab of
    # P(w|v) == 1 for every context v (unseen pairs contribute only the
    # backoff term, reconstructed here)
    vocab = list(n1_bwd)
    seen = {(r.prev, r.token): r.p_kn for r in rows}
    for v in ctx_total:
        s = 0.0
        for w in vocab:
            if (v, w) in seen:
                s += seen[(v, w)]
            else:
                s += (D * n1_fwd[v] / ctx_total[v]) * (n1_bwd[w] / n1_tot)
        assert s == pytest.approx(1.0, abs=1e-6)


def test_kneser_ney_discount_guard(corpus):
    from assignment_etl_spark.ext.lm import kneser_ney_bigram

    with pytest.raises(ValueError, match="discount"):
        kneser_ney_bigram(corpus, discount=1.0)


def test_good_turing_hand_computed(spark):
    from assignment_etl_spark.ext.lm import good_turing_counts
    from collections import Counter

    corpus = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b c d"), (3, "e")],
        "doc_id long, text string",
    )
    rows = {r.r: r for r in good_turing_counts(corpus).collect()}
    # counts: a=4 b=3 c=2 d=1 e=1 ; N=11
    # N_r: 1->2, 2->1, 3->1, 4->1
    assert {r: rows[r].n_r for r in rows} == {1: 2, 2: 1, 3: 1, 4: 1}
    assert rows[1].r_star == pytest.approx(2 * 1 / 2)       # (1+1)N2/N1
    assert rows[2].r_star == pytest.approx(3 * 1 / 1)       # (2+1)N3/N2
    assert rows[3].r_star == pytest.approx(4 * 1 / 1)
    assert rows[4].r_star is None                            # no N_5 tail
    assert rows[1].p_mass == pytest.approx(2 / 11)
    assert rows[4].p_mass == pytest.approx(4 / 11)
    # GT total-mass identity: sum over observed r of r*·N_r/N plus the
    # unseen mass N_1/N equals... the observed masses of shifted counts:
    # sum(r*·N_r) = sum_{r>=2}(r·N_r) = N - N_1 (exact when no tail cut)
    s = sum(rows[r].r_star * rows[r].n_r for r in rows if rows[r].r_star is not None)
    assert s == pytest.approx(11 - 2)


def test_good_turing_sgt_hand_computed(spark):
    """Simple Good-Turing (r7): gap-corrected Z, LGT log-log fit,
    r*_SGT = (r+1)((r+1)/r)^b — defined at EVERY r, including the tail
    where the raw Turing estimate is NULL."""
    import math

    from assignment_etl_spark.ext.lm import good_turing_counts

    corpus = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b c d"), (3, "e")],
        "doc_id long, text string",
    )
    rows = {r.r: r for r in good_turing_counts(corpus).collect()}
    # observed r: 1,2,3,4 with N_r 2,1,1,1; gap-corrected
    # Z_1 = 2/(0.5*(2-0)) = 2, Z_2 = Z_3 = 1, Z_4 = 1/(0.5*(5-3)) = 1
    xs = [math.log(r) for r in (1, 2, 3, 4)]
    ys = [math.log(z) for z in (2.0, 1.0, 1.0, 1.0)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    b = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    for r in (1, 2, 3, 4):
        want = (r + 1.0) * ((r + 1.0) / r) ** b
        assert rows[r].r_star_sgt == pytest.approx(want, rel=1e-4), r
    # the tail is smoothed even though the raw estimate is NULL there
    assert rows[4].r_star is None and rows[4].r_star_sgt is not None
    # total smoothed mass stays near N (LGT is a fit, not an identity —
    # generous band, this corpus is tiny)
    s = sum(rows[r].r_star_sgt * rows[r].n_r for r in rows)
    assert 0.5 * 11 <= s <= 1.5 * 11


def test_good_turing_sgt_degenerate_single_frequency(spark):
    from assignment_etl_spark.ext.lm import good_turing_counts

    corpus = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )  # every token seen exactly once: one distinct r, no fit
    rows = good_turing_counts(corpus).collect()
    assert len(rows) == 1
    assert rows[0].r_star_sgt is None and rows[0].r_star is None


def test_broadcast_lm_contract(spark, corpus):
    """r12 memory-pressure finding: the LM count tables grow with the
    corpus, so the join strategy must be ADAPTIVE by default — no hint,
    AQE/static planner decides from sizes — with broadcast_lm=True as
    the explicit small-vocab override. Pin the contract with the
    threshold disabled: True still forces broadcast joins (hint beats
    threshold); the default plants no hint, so no broadcast happens."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lm = train_backoff_lm(corpus)
        forced = score_backoff(corpus, lm, broadcast_lm=True)
        adaptive = score_backoff(corpus, lm)
        from assignment_etl_spark import internals

        forced_plan = internals.executed_plan_string(forced)
        adaptive_plan = internals.executed_plan_string(adaptive)
        assert "BroadcastHashJoin" in forced_plan
        # the 1-row totals crossJoin stays broadcast by design; no
        # EQUI-join may broadcast without the explicit override
        assert "BroadcastHashJoin" not in adaptive_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_broadcast_threshold_scales_with_heap():
    """Session factory: the broadcast budget is heap-proportional with a
    64 MB cap — a 64 MB threshold was measured lethal on a 2 g heap
    (hashed relations expand ~5-10× and cannot spill), while the default
    24 g sandbox keeps the historical 64 MB (bench plans unchanged)."""
    from assignment_etl_spark.session import broadcast_threshold_bytes

    assert broadcast_threshold_bytes("24g") == 64 * 2**20
    assert broadcast_threshold_bytes("6g") < 64 * 2**20  # just under cap
    assert broadcast_threshold_bytes("2g") == 2**31 // 100
    assert broadcast_threshold_bytes("512m") == 2**29 // 100
    assert broadcast_threshold_bytes("1048576") == 2**20 // 100
