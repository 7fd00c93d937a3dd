"""Byte-fallback tokenizer certification for the NON-ASCII path (VERDICT
r7 ask #5): the oracle gates certify ASCII only (the testdata corpus is
pure ASCII — docs/ROUND_NOTES.md DuckDB BLOB limitation), so the Unicode
behavior is pinned here against Python-replica goldens — byte_pieces
matches CPython's UTF-8 encoder byte for byte, fallback output
round-trips back to the original text, and the encoders never DROP
content on unseen characters."""

import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from assignment_etl_spark.ext.bpe import (  # noqa: E402
    apply_byte_fallback,
    byte_pieces,
    encode_words,
    train_bpe,
)
from assignment_etl_spark.ext.unigram_lm import (  # noqa: E402
    train_unigram_lm,
    viterbi_encode,
)

UNICODE_WORDS = [
    "héllo",          # latin-1 accents: 2-byte sequences
    "straße",         # sharp s
    "naïve",
    "日本語テスト",     # CJK: 3-byte sequences
    "кириллица",      # cyrillic: 2-byte
    "emoji🙂mixed",   # astral plane: 4-byte (surrogate pair in UTF-16)
    "mixédボth🎉",
]


def py_byte_pieces(w: str) -> list[str]:
    """The Python-replica golden: CPython's UTF-8 encoder."""
    return [f"<0x{b:02X}>" for b in w.encode("utf-8")]


def decode_pieces(pieces: list[str]) -> str:
    """Round-trip: re-assemble <0xXX> runs + literal pieces into text."""
    buf = bytearray()
    for p in pieces:
        if p.startswith("<0x") and p.endswith(">") and len(p) == 6:
            buf.extend(bytes([int(p[3:5], 16)]))
        else:
            buf.extend(p.encode("utf-8"))
    return buf.decode("utf-8")


def test_byte_pieces_matches_python_utf8(spark):
    df = spark.createDataFrame([(w,) for w in UNICODE_WORDS], "w string")
    got = {
        r.w: list(r.bp)
        for r in df.select("w", byte_pieces(F.col("w")).alias("bp")).collect()
    }
    for w in UNICODE_WORDS:
        assert got[w] == py_byte_pieces(w), w


@settings(max_examples=25, deadline=None)
@given(st.text(min_size=1, max_size=40).filter(lambda s: s.strip()))
def test_byte_pieces_roundtrips_any_text(spark, s):
    df = spark.createDataFrame([(s,)], "w string")
    [row] = df.select(byte_pieces(F.col("w")).alias("bp")).collect()
    assert decode_pieces(list(row.bp)) == s


def test_viterbi_byte_fallback_roundtrips_unseen_words(spark):
    """Train a unigram vocab on an ASCII corpus, then encode words the
    trainer never saw (Unicode, overlong): with byte_fallback every word
    gets a NON-NULL segmentation that round-trips; without it the
    exclusions surface as NULL (the documented pre-r8 behavior)."""
    corpus = spark.createDataFrame(
        [(i, "the data the lake the data house") for i in range(4)],
        "doc_id long, text string",
    )
    vocab = train_unigram_lm(corpus, vocab_size=12, n_iters=1)
    words = spark.createDataFrame(
        [("the",), ("data",), ("héllo",), ("日本語テスト",),
         ("overlongwordpastthecap",)],
        "word string",
    )
    out = {
        r.word: (list(r.pieces) if r.pieces is not None else None)
        for r in viterbi_encode(words, vocab, byte_fallback=True).collect()
    }
    for w, ps in out.items():
        assert ps is not None, w
        assert decode_pieces(ps) == w, (w, ps)
    # the unseen words really took the byte path
    assert out["héllo"] == py_byte_pieces("héllo")
    assert out["日本語テスト"] == py_byte_pieces("日本語テスト")

    nofb = {
        r.word: r.pieces
        for r in viterbi_encode(words, vocab, byte_fallback=False).collect()
    }
    assert nofb["héllo"] is None and nofb["overlongwordpastthecap"] is None


def test_bpe_apply_byte_fallback_preserves_order_and_roundtrips(spark):
    """BPE-encode a mixed ASCII/Unicode word table, restrict the vocab to
    the ASCII pieces the trainer produced, and byte-fallback the rest:
    order is preserved in place and the concatenation round-trips."""
    corpus = spark.createDataFrame(
        [(i, "abab abab cdcd") for i in range(4)], "doc_id long, text string"
    )
    merges = train_bpe(corpus, n_merges=2)
    words = spark.createDataFrame(
        [("abab", 3), ("ab日本ab", 1), ("ßcd", 1)], "word string, n long"
    )
    pieces = encode_words(words, merges)
    vocab = spark.createDataFrame(
        [("ab",), ("a",), ("b",), ("c",), ("d",), ("cd",), ("abab",)],
        "piece string",
    )
    got = {
        r.word: list(r.pieces)
        for r in apply_byte_fallback(pieces, vocab).collect()
    }
    for w, ps in got.items():
        assert decode_pieces(ps) == w, (w, ps)
    # in-vocab pieces stay intact; the unseen run decomposes in place
    assert got["ab日本ab"][0] == "ab" and got["ab日本ab"][-1] == "ab"
    assert [p for p in got["ab日本ab"] if p.startswith("<0x")] == py_byte_pieces(
        "日本"
    )
    assert got["ßcd"][-1] in ("cd", "d")  # tail stays symbolic
    assert got["ßcd"][0].startswith("<0x")


def test_apply_byte_fallback_keeps_empty_and_null_distinct(spark):
    """Regression (r9 ADVICE): posexplode emits no rows for [], so an
    unguarded regroup-join rewrote empty piece arrays to NULL —
    conflating "empty segmentation" with the documented NULL exclusion
    sentinel. [] must stay [], NULL must stay NULL."""
    rows = spark.createDataFrame(
        [("empty", []), ("excluded", None), ("plain", ["ab", "ß"])],
        "word string, pieces array<string>",
    )
    vocab = spark.createDataFrame([("ab",)], "piece string")
    got = {
        r.word: (None if r.pieces is None else list(r.pieces))
        for r in apply_byte_fallback(rows, vocab).collect()
    }
    assert got["empty"] == []
    assert got["excluded"] is None
    assert got["plain"] == ["ab", "<0xC3>", "<0x9F>"]


def test_bpe_symbols_handle_unicode_codepoints(spark):
    """The (c)-delimited symbol representation splits on CODE POINTS (Java
    regex '.'), so BMP and astral characters survive encode_words as
    whole pieces — nothing is dropped or split mid-character."""
    words = spark.createDataFrame([("日本🙂x",)], "word string")
    [row] = encode_words(words, []).collect()
    assert list(row.pieces) == ["日", "本", "🙂", "x"]
