"""Text-analysis operators (ext.text)."""

import pytest
from pyspark.sql import functions as F

from assignment_etl_spark.ext.text import (
    bpe_ish_token_count,
    detect_language,
    fingerprint,
    punct_ratio,
    quality_score,
    text_profile,
    whitespace_token_count,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world  foo"), (2, ""), (3, "   "), (4, None), (5, "one")],
        "i int, text string",
    )
    rows = {
        r.i: (r.ws, r.bpe)
        for r in df.select(
            "i",
            whitespace_token_count(F.col("text")).alias("ws"),
            bpe_ish_token_count(F.col("text")).alias("bpe"),
        ).collect()
    }
    assert rows[1] == (3, 3)
    assert rows[2] == (0, 0)
    assert rows[3] == (0, 0)
    assert rows[4] == (0, 0)
    assert rows[5] == (1, 1)


def test_punct_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "a,b.c!"), (2, "clean text with the and of to is in words")],
        "i int, text string",
    )
    rows = {r.i: r for r in df.select(
        "i",
        punct_ratio(F.col("text")).alias("p"),
        quality_score(F.col("text")).alias("q"),
    ).collect()}
    assert rows[1].p == pytest.approx(3 / 6)
    assert rows[2].p == 0.0
    assert 0.0 < rows[2].q <= 1.0


def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in that house"),
            (2, "der hund und die katze ist nicht ein vogel zu"),
            (3, "le chat est dans la maison et les arbres"),
            (4, "xyzzy qwerty plugh"),
        ],
        "i int, text string",
    )
    got = {r.i: r.lang for r in df.select("i", detect_language(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "  HELLO\tWORLD  "), (4, "different")],
        "i int, text string",
    )
    fps = {r.i: r.fp for r in df.select("i", fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[1]


def test_text_profile_columns(spark):
    df = spark.createDataFrame([(1, "the quick brown fox")], "doc_id int, text string")
    out = text_profile(df)
    for c in [
        "n_tokens_ws",
        "n_tokens_bpe",
        "punct_ratio",
        "quality_score",
        "lang_detected",
        "fingerprint",
    ]:
        assert c in out.columns
    assert out.first().n_tokens_ws == 4


def test_gopher_flags(spark):
    from assignment_etl_spark.ext.text import gopher_flags

    good = " ".join(["word"] * 60)  # 60 words, mean len 4 → passes
    short = "too short"  # < 50 words → fails
    bullety = "\n".join(f"- item {i}" for i in range(20))  # all bullet lines
    dupy = "\n".join(["same line"] * 10)  # 90% duplicate lines
    symbols = " ".join(["#tag"] * 60)  # symbol ratio 1.0 → fails
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, bullety), (4, dupy), (5, symbols)],
        "i int, text string",
    )
    got = {r.i: r.g.asDict() for r in df.select("i", gopher_flags(F.col("text")).alias("g")).collect()}
    assert got[1]["passes"] is True
    assert got[2]["passes"] is False and got[2]["n_words"] == 2
    assert got[3]["bullet_frac"] == 1.0 and got[3]["passes"] is False
    assert got[4]["dup_line_frac"] == 0.9 and got[4]["passes"] is False
    assert got[5]["symbol_ratio"] == 1.0 and got[5]["passes"] is False


def test_hash_split(spark, sf_dir):
    from assignment_etl_spark.ext.text import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = hash_split(docs, {"train": 90, "val": 5, "test": 5})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    assert n == docs.count()  # every row labeled
    assert counts["train"] / n > 0.8  # roughly proportional
    # deterministic: second run assigns identically
    again = {r.doc_id: r.split for r in hash_split(docs, {"train": 90, "val": 5, "test": 5}).collect()}
    first = {r.doc_id: r.split for r in out.collect()}
    assert first == again
    with __import__("pytest").raises(ValueError):
        hash_split(docs, {"train": 50, "val": 5})


def test_pii_scrub(spark):
    from assignment_etl_spark.ext.text import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@sub.example.org thanks"),
            (2, "server at 192.168.1.254 responded"),
            (3, "no pii here at all"),
        ],
        "i int, text string",
    )
    got = {
        r.i: (r.c.email, r.c.ipv4, r.s)
        for r in df.select(
            "i",
            pii_counts(F.col("text")).alias("c"),
            scrub_pii(F.col("text")).alias("s"),
        ).collect()
    }
    assert got[1][0] == 1 and "@" not in got[1][2] and "[PII]" in got[1][2]
    assert got[2][1] == 1 and "192.168" not in got[2][2]
    assert got[3] == (0, 0, "no pii here at all")


def test_chunk_documents_boundaries(spark):
    from pyspark.sql import functions as F

    from assignment_etl_spark.ext.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_chars=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.n_chars))
    # stride 3: starts 1,4,7 -> abcd, defg, ghij; (start 10 excluded: > L-overlap)
    assert by_doc[1] == [(0, "abcd", 4), (1, "defg", 4), (2, "ghij", 4)]
    # short doc -> one (short) chunk; empty doc -> no chunks
    assert by_doc[2] == [(0, "xy", 2)]
    assert 3 not in by_doc
    # dropping each chunk's overlap prefix (after the first) rebuilds the doc
    rebuilt = by_doc[1][0][1] + "".join(t[1][1:] for t in by_doc[1][1:])
    assert rebuilt == "abcdefghij"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_chars=4, overlap=4)


def test_c4_line_filter(spark):
    from assignment_etl_spark.ext.text import c4_line_filter

    docs = spark.createDataFrame(
        [
            # 3 good lines -> kept intact
            (1, "the cat sat down.\nnice day today!\nis it good?"),
            # short line + no-punct line filtered; only 2 survive -> page drop
            (2, "one.\nthe cat sat down.\nno terminal punct here\ngood line stays here."),
            # javascript line removed (case-insensitive)
            (3, "enable JavaScript to view.\nthe cat sat down.\nnice day today!\nis it good?"),
            # page-level drops
            (4, "var x = { a: 1 };\nthe cat sat down.\nnice day today!\nmore text here."),
            (5, "Lorem Ipsum dolor sit.\nthe cat sat down.\nnice day today!\nmore text here."),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in c4_line_filter(docs, min_words=3, min_lines=3).collect()
    }
    assert out[1].page_kept and out[1].n_kept == 3 and out[1].drop_reason is None
    assert out[1].text == "the cat sat down.\nnice day today!\nis it good?"
    assert not out[2].page_kept and out[2].drop_reason == "too_few_lines"
    assert out[2].text == "" and out[2].n_kept == 0 and out[2].n_lines == 4
    # javascript line dropped but page survives with the 3 clean lines
    assert out[3].page_kept and out[3].n_kept == 3
    assert "JavaScript" not in out[3].text
    # page reasons win over line-level outcomes, brace before lorem
    assert out[4].drop_reason == "brace"
    assert out[5].drop_reason == "lorem_ipsum"


def test_c4_line_filter_trims_before_matching(spark):
    from assignment_etl_spark.ext.text import c4_line_filter

    docs = spark.createDataFrame(
        [(1, "the cat sat down.   \n  nice day today!  \nis it good?")],
        "doc_id long, text string",
    )
    row = c4_line_filter(docs).collect()[0]
    # trailing spaces must not defeat the terminal-punctuation rule
    assert row.page_kept and row.n_kept == 3


def test_augment_word_dropout_deterministic(spark):
    from assignment_etl_spark.ext.text import augment_word_dropout

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    a = augment_word_dropout(docs, rate=0.4, salt=1).collect()[0]
    b = augment_word_dropout(docs, rate=0.4, salt=1).collect()[0]
    assert a.text_aug == b.text_aug            # same salt -> same epoch
    assert a.n_tokens == 10 and 0 < a.n_kept < 10
    assert a.text_aug.split(" ") == [t for t in "alpha beta gamma delta epsilon zeta eta theta iota kappa".split() if t in a.text_aug.split(" ")]
    c = augment_word_dropout(docs, rate=0.4, salt=2).collect()[0]
    assert c.text_aug != a.text_aug            # new salt -> new epoch
    z = augment_word_dropout(docs, rate=0.0).collect()[0]
    assert z.text_aug == docs.collect()[0].text and z.n_kept == 10


def test_pmi_collocations(spark):
    from assignment_etl_spark.ext.collocations import pmi_collocations

    # "new york" always adjacent; "the" everywhere -> low PMI with anything
    rows = [(i, "the new york trip was the best the end") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(docs, min_count=5, topk=5).collect()
    pairs = {(r.x, r.y): r.pmi for r in out}
    assert ("new", "york") in pairs
    top = out[0]
    assert (top.x, top.y) != ("the", "new") or top.pmi <= pairs[("new", "york")]
    assert pairs[("new", "york")] == max(pairs.values())
    assert [r.rank for r in out] == list(range(1, len(out) + 1))


def test_curate_corpus_funnel(spark):
    from assignment_etl_spark.ext.curation import curate_corpus

    good = ("the quick brown fox jumps over the lazy dog and runs to the river. " * 8)
    docs = spark.createDataFrame(
        [
            (1, good),                 # survivor (en, long, stopwords)
            (2, good),                 # exact dup of 1 -> duplicate
            (3, "x"),                  # low quality (tiny)
            (4, "el rapido zorro marron salta sobre el perro perezoso y corre " * 10),
            (5, None),                 # NULL text: quality 0.6, lang 'und'
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in curate_corpus(docs, min_quality=0.5, langs=("en",)).collect()}
    assert out[1] in ("train", "val", "test")
    assert out[2] == "duplicate"
    assert out[3] == "low_quality"
    assert out[4] == "wrong_lang"
    # NULL text scores non-NULL quality (0.6) with lang 'und' on BOTH
    # engines, so it drops as wrong_lang — never a split label; the
    # 'unscored' status guards the (currently unreachable) NULL-quality
    # path so a future quality_score change can't silently promote
    # unknown-quality docs to survivors
    assert out[5] == "wrong_lang"


def test_span_corruption_structure(spark):
    from assignment_etl_spark.ext.text import span_corruption

    docs = spark.createDataFrame(
        [(7, " ".join(f"t{i}" for i in range(12)))], "doc_id long, text string"
    )
    r = span_corruption(docs, span_len=3, rate=0.5, salt=9).collect()[0]
    toks = r.text.split(" ")
    assert r.n_tokens == 12 and r.n_masked % 3 == 0
    n_spans = r.n_masked // 3
    # each masked block -> exactly one sentinel in inputs, one in targets
    assert r.inputs.count("<extra_id>") == n_spans
    assert r.targets.count("<extra_id>") == n_spans
    # inputs + masked tokens reconstruct the original multiset
    kept = [t for t in r.inputs.split(" ") if t != "<extra_id>" and t]
    masked = [t for t in r.targets.split(" ") if t != "<extra_id>" and t]
    assert sorted(kept + masked) == sorted(toks)
    assert len(masked) == r.n_masked
    # determinism + epoch change
    again = span_corruption(docs, span_len=3, rate=0.5, salt=9).collect()[0]
    assert again.inputs == r.inputs and again.targets == r.targets
    other = span_corruption(docs, span_len=3, rate=0.5, salt=10).collect()[0]
    assert (other.inputs, other.targets) != (r.inputs, r.targets)


def test_readability_scores(spark):
    from assignment_etl_spark.ext.text import readability_scores

    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "no terminal punctuation here"),
         (3, None)],
        "doc_id long, text string",
    )
    w, snt, sy, fl = readability_scores(docs)
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id", w.alias("w"), snt.alias("s"), sy.alias("sy"), fl.alias("f")
        ).collect()
    }
    assert out[1].w == 6 and out[1].s == 2
    # flesch = 206.835 - 1.015*(6/2) - 84.6*(sy/6)
    assert abs(out[1].f - round(206.835 - 1.015 * 3 - 84.6 * out[1].sy / 6, 4)) < 1e-9
    assert out[2].s == 1            # fragment floor
    assert out[3].f is None
