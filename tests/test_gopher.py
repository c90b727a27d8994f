"""Gopher repetition-filter unit tests (operators/gopher.py) on hand-built
documents with known signal values — the catalog queries' oracle covers the
corpus-scale parity; these pin the per-signal arithmetic."""

from __future__ import annotations

import pytest

from thymeflow_back_spark.operators.gopher import (
    dup_ngram_coverage,
    repetition_signals,
)


def _by_id(rows):
    return {r["doc_id"]: r for r in (row.asDict() for row in rows)}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            # 1: no repetition at all
            (1, "alpha beta gamma delta epsilon zeta"),
            # 2: one line duplicated (3 lines, 2 distinct)
            (2, "spam spam spam\nham eggs toast\nspam spam spam"),
            # 3: heavy 2-gram repetition, single line
            (3, "go go go go go go"),
            # 4: a duplicated 5-gram covering all five words twice
            (4, "one two three four five one two three four five"),
            # 5: empty-ish (single word, no n-grams possible)
            (5, "solo"),
            # 6: long and clean — every n-gram unique, many words, so even
            # a count-1 top n-gram stays under the Gopher bounds
            (6, " ".join(f"w{i:02d}" for i in range(40))),
        ],
        "doc_id int, text string",
    )


def test_line_signals(spark, docs):
    out = _by_id(repetition_signals(docs, "doc_id", "text").collect())

    assert out[1]["dup_line_frac"] == 0.0
    assert out[1]["dup_line_char_frac"] == 0.0

    # doc 2: 3 lines, 2 distinct -> dup_line_frac = 1/3; the repeated line
    # is 14 chars, all lines 14+14+14=42 chars -> dup chars = 14/42 = 1/3
    assert out[2]["n_lines"] == 3
    assert out[2]["dup_line_frac"] == pytest.approx(1 / 3)
    assert out[2]["dup_line_char_frac"] == pytest.approx(14 / 42)


def test_top_ngram_signals(spark, docs):
    out = _by_id(repetition_signals(docs, "doc_id", "text").collect())

    # doc 3: "go go" occurs 5 times; text is 17 chars single-spaced;
    # top2 numer = 5 * len("go go") = 25 -> 25/17
    assert out[3]["top2gram_frac"] == pytest.approx(25 / 17)
    assert not out[3]["keep_repetition"]

    # doc 1: every 2-gram unique -> top count 1, numer = len("alpha beta")
    # = 10 over 35 single-spaced chars. NOTE 10/35 > 0.20: on very short
    # documents even a unique top 2-gram exceeds the Gopher bound — the
    # paper applies these filters after a minimum-length gate, so short
    # docs legitimately fail keep_repetition here.
    assert out[1]["top2gram_frac"] == pytest.approx(10 / 35)
    assert not out[1]["keep_repetition"]

    # doc 6: long and all-unique -> count-1 top n-grams are a small share
    assert out[6]["top2gram_frac"] < 0.05
    assert out[6]["keep_repetition"]

    # doc 5: no 2-grams at all -> 0.0, and nothing blows up
    assert out[5]["top2gram_frac"] == 0.0
    assert out[5]["keep_repetition"]


def test_dup_ngram_coverage(spark, docs):
    out = _by_id(dup_ngram_coverage(docs, "doc_id", "text").collect())

    # doc 4: the 5-gram "one two three four five" occurs twice, covering
    # every word position -> dup5_frac = 1.0; no duplicated 6-gram exists
    # (positions 1-6 vs nothing) except those spanning the seam: the
    # 6-gram at pos0 ("one..one") occurs once -> dup6_frac = 0
    assert out[4]["dup5_frac"] == pytest.approx(1.0)
    assert out[4]["dup6_frac"] == 0.0
    assert not out[4]["keep_dup_ngrams"]

    # doc 1: nothing repeats
    assert out[1]["dup5_frac"] == 0.0
    assert out[1]["keep_dup_ngrams"]

    # doc 5: shorter than every n -> all zero, keep
    assert all(out[5][f"dup{n}_frac"] == 0.0 for n in range(5, 11))
    assert out[5]["keep_dup_ngrams"]


def test_coverage_counts_each_char_once(spark):
    # "x y z x y z x y z" : 3-word unit repeated 3x. For n=5 the grams
    # starting at 0..4 all occur... positions: 9 words. 5-grams at pos p
    # and p+3 are equal (period 3), so positions 0..8 are all covered ->
    # frac exactly 1.0 even though windows overlap heavily (no double
    # counting).
    df = spark.createDataFrame(
        [(1, "x y z x y z x y z")], "doc_id int, text string"
    )
    out = _by_id(dup_ngram_coverage(df, "doc_id", "text").collect())
    assert out[1]["dup5_frac"] == pytest.approx(1.0)
