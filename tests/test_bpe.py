"""BPE trainer (ext/bpe.py): golden agreement with a pure-python
reference implementation, greedy-substitution edge cases, encoding."""

from collections import Counter

from assignment_etl_spark.ext.bpe import encode_words, train_bpe


def _reference_bpe(word_counts, n_merges):
    """Classic dict-based BPE with (count desc, pair asc) tie-break."""
    vocab = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        (lft, rgt), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, lft, rgt, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
                    out.append(lft + rgt)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_matches_reference_implementation(spark):
    texts = [
        "low low low lower lower newest newest newest newest widest",
        "widest widest newest low",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = train_bpe(docs, n_merges=8)
    wc = Counter(w for t in texts for w in t.split())
    want = _reference_bpe(wc, 8)
    assert got == want


def test_greedy_triple_merge(spark):
    # 'aaa': merging (a,a) must produce [aa, a], not [a, aa] or [aa, aa]
    docs = spark.createDataFrame([("aaa aaa bb",)], "text string")
    merges = train_bpe(docs, n_merges=1)
    assert merges[0][1:3] == ("a", "a")
    assert merges[0][3] == 4  # two 'aaa' words contribute 2 adjacent pairs each
    enc = encode_words(
        spark.createDataFrame([("aaa",)], "word string"), merges
    ).first()
    assert enc.pieces == ["aa", "a"]


def test_encode_applies_in_training_order(spark):
    docs = spark.createDataFrame([("abab abab abab",)], "text string")
    merges = train_bpe(docs, n_merges=2)
    enc = encode_words(
        spark.createDataFrame([("ababab",)], "word string"), merges
    ).first()
    # merge1: (a,b)->ab (6 occurrences); merge2: (ab,ab)->abab
    assert merges[0][1:3] == ("a", "b")
    assert enc.pieces == ["abab", "ab"]


def test_early_stop_no_pairs(spark):
    docs = spark.createDataFrame([("a b c",)], "text string")
    merges = train_bpe(docs, n_merges=5)
    assert merges == []  # single-char words: no adjacent pairs at all


def test_deterministic_across_partitionings(spark):
    texts = [f"tok{i % 7} tok{i % 5} shared shared" for i in range(40)]
    d1 = spark.createDataFrame([(t,) for t in texts], "text string").repartition(1)
    d2 = spark.createDataFrame([(t,) for t in texts], "text string").repartition(9)
    assert train_bpe(d1, n_merges=6) == train_bpe(d2, n_merges=6)


def test_batched_path_equals_sequential(spark):
    # the prefix-batched selection (batch_k>1) must return the EXACT
    # merge sequence of one-at-a-time training, in fewer driver rounds
    texts = [
        "low low low lower lower newest newest newest newest widest",
        "widest widest newest low lowest newer news widen widen",
        "the the the them theme theme thematic an and and banana",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    seq_stats, bat_stats = {}, {}
    seq = train_bpe(docs, n_merges=12, batch_k=1, stats=seq_stats)
    bat = train_bpe(docs, n_merges=12, batch_k=4, stats=bat_stats)
    assert bat == seq
    assert seq_stats["rounds"] == len(seq)
    assert bat_stats["rounds"] < seq_stats["rounds"]
    # and against the pure-python reference too
    wc = Counter(w for t in texts for w in t.split())
    assert bat == _reference_bpe(wc, 12)


def test_batched_path_greedy_overlap_and_ties(spark):
    # adversarial: self-pairs, chained symbols, and exact count ties —
    # the batch rule must bail to sequential rather than reorder
    docs = spark.createDataFrame(
        [("aaa aaa bb", ), ("ab ab ba ba", ), ("ccc ccc ccc", )],
        "text string",
    )
    wc = Counter(w for d in docs.collect() for w in d.text.split())
    for n in (1, 3, 6):
        assert train_bpe(docs, n_merges=n, batch_k=4) == _reference_bpe(wc, n)


def test_safe_batch_cumulative_bound():
    """The review counterexample: two accepted merges whose concatenations
    spell the same symbol could jointly grow a pair past a later candidate.
    _safe_batch must (a) never co-batch same-concat merges, (b) apply the
    CUMULATIVE gain bound, not per-merge bounds."""
    from collections import namedtuple

    from assignment_etl_spark.ext.bpe import _safe_batch

    R = namedtuple("R", "lft rgt cnt")
    # a1=(ab,c) and a2=(a,bc) both create a symbol spelled "abc"
    rows = [R("ab", "c", 100), R("a", "bc", 90), R("x", "y", 6)]
    batch = _safe_batch(rows, 3, truncated=False)
    # a2's concat "abc" == a1's concat "abc" -> forbidden; prefix stops at 1
    assert [(r.lft, r.rgt) for r in batch] == [("ab", "c")]

    # cumulative bound: candidate must beat m_max + SUM of U_a, not each
    # U_a separately. Here u for (a,b) counts adjacent pairs (x,a)/(b,y):
    # give each accepted merge an adjacent pair worth 5 so cum_u grows.
    rows2 = [
        R("a", "b", 100),
        R("c", "d", 90),
        R("e", "f", 9),   # must beat cum_u from both prior merges
        R("x", "a", 5),   # adjacent to merge 1 (rgt == 'a')
        R("y", "c", 5),   # adjacent to merge 2 (rgt == 'c')
    ]
    batch2 = _safe_batch(rows2, 3, truncated=False)
    # merge1: u=5 (x,a); merge2: u=5 (y,c); cum_u=10 > cnt(e,f)=9 -> stop
    assert [(r.lft, r.rgt) for r in batch2] == [("a", "b"), ("c", "d")]

    # same shape but a comfortable candidate passes the cumulative bound
    rows3 = [
        R("a", "b", 100),
        R("c", "d", 90),
        R("e", "f", 50),
        R("x", "a", 5),
        R("y", "c", 5),
    ]
    batch3 = _safe_batch(rows3, 3, truncated=False)
    assert [(r.lft, r.rgt) for r in batch3] == [
        ("a", "b"), ("c", "d"), ("e", "f")
    ]


def test_safe_batch_preexisting_concat_spelling():
    """Reviewer counterexample: a PRE-EXISTING symbol spelled exactly
    like the accepted merge's concatenation lets one merge feed the
    conflated pair through THREE channels at once (left-extend,
    right-extend, self-chain) — per-channel bounds must multiply."""
    from collections import namedtuple

    from assignment_etl_spark.ext.bpe import _safe_batch

    R = namedtuple("R", "lft rgt cnt")
    rows = [
        R("l", "r", 100),
        R("e", "f", 70),     # 70 > old bound 20+20; must NOT pass 20+3*20
        R("lr", "l", 20),    # left-extension channel (T,l)
        R("r", "lr", 20),    # right-extension channel (r,T)
        R("r", "l", 20),     # self-chain channel (r,l)
        R("lr", "lr", 20),   # the conflated pair's pre-existing count
    ]
    batch = _safe_batch(rows, 3, truncated=False)
    # post-merge ('lr','lr') can reach 20+20+20+20 = 80 > 70: sequential
    # would pick it next, so the batch must stop after the top-1
    assert [(b.lft, b.rgt) for b in batch] == [("l", "r")]


def test_wordpiece_matches_python_replica(spark):
    """WordPiece picks the LIKELIHOOD argmax cnt/(cl*cr) — verified
    against a pure-Python replay (same tokenization, same tie-breaks),
    and distinct from BPE's raw-count pick on a corpus built so the
    most frequent pair is NOT the most surprising one."""
    from collections import Counter

    from assignment_etl_spark.ext.bpe import encode_words, train_wordpiece

    texts = [
        "aa ab aa ab aa",      # 'a' everywhere: (a,a)/(a,b) frequent but expected
        "zq zq xy",            # rare symbols, perfectly correlated
        "ab aa zq xy zq",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def py_wordpiece(texts, n_merges):
        wf = Counter()
        for t in texts:
            for w in t.lower().split():
                if w:
                    wf[w] += 1
        syms = {w: tuple(w) for w in wf}
        merges = []
        for step in range(1, n_merges + 1):
            pc, uc = Counter(), Counter()
            for w, n in wf.items():
                s = syms[w]
                for t in s:
                    uc[t] += n
                for a, b in zip(s, s[1:]):
                    pc[(a, b)] += n
            if not pc:
                break
            best = min(
                pc.items(),
                key=lambda kv: (-(kv[1] / (uc[kv[0][0]] * uc[kv[0][1]])),
                                kv[0][0], kv[0][1]),
            )
            (l, r), c = best
            merges.append((step, l, r, c))
            for w in syms:
                s, out, i = syms[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = tuple(out)
        return merges

    got = train_wordpiece(docs, n_merges=4)
    want = py_wordpiece(texts, 4)
    assert [(s, l, r, c) for s, l, r, c, _ in got] == want
    # scores are the exact double ratios, descending-ish but NOT the
    # raw-count order: the first pick must be a rare-correlated pair,
    # not the frequent (a,a)
    assert got[0][1] + got[0][2] in ("zq", "xy")
    # encode replays the merge list (score element dropped)
    enc = encode_words(
        spark.createDataFrame([("zq",), ("aa",)], "word string"),
        [(s, l, r, c) for s, l, r, c, _ in got],
    ).collect()
    pieces = {r.word: r.pieces for r in enc}
    assert pieces["zq"] == ["zq"]
