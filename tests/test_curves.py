"""LSH recall curve + vocabulary growth (round-8 measurement rows)."""

from __future__ import annotations

from thymeflow_back_spark.queries.catalog import QUERIES


def test_lsh_candidates_superset_of_verified(spark, sf_dir):
    """The raw band-collision pairs must contain every pair the verified
    minhash path emits — minhash_candidate_pairs is the same relation
    minhash_near_dups verifies, so a drift here is a refactor bug."""
    from thymeflow_back_spark.operators.dedup import (
        _by_id,
        doc_shingles,
        minhash_candidate_pairs,
        minhash_near_dups,
    )
    from thymeflow_back_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    docs_sh = _by_id(doc_shingles(docs, "doc_id", "text", 3), "doc_id")
    cands = {
        (r.a_id, r.b_id)
        for r in minhash_candidate_pairs(docs_sh, "doc_id").collect()
    }
    verified = {
        (r.a_id, r.b_id)
        for r in minhash_near_dups(docs, "doc_id", "text", 3, 0.5).collect()
    }
    assert verified and verified <= cands


def test_lsh_recall_curve_shape(spark, sf_dir):
    rows = QUERIES["q_lsh_recall_curve"].spark(spark, sf_dir).collect()
    assert rows, "curve must not be empty"
    by_bucket = {r.bucket: r for r in rows}
    for r in rows:
        assert 0 <= r.n_caught <= r.n_pairs
        assert abs(r.recall - r.n_caught / r.n_pairs) < 1e-12
    # the S-curve's ends: highest-similarity bucket catches more than the
    # lowest one (the planted truncation spread guarantees both ends exist)
    lo, hi = min(by_bucket), max(by_bucket)
    assert hi >= 7 and lo <= 3
    assert by_bucket[hi].recall >= by_bucket[lo].recall


def test_vocab_growth_monotone_and_totals(spark, sf_dir):
    from thymeflow_back_spark.tables import load

    rows = QUERIES["q_vocab_growth"].spark(spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(10))
    for a, b in zip(rows, rows[1:]):
        assert b.cum_tokens > a.cum_tokens
        assert b.cum_types >= a.cum_types

    docs = load(spark, sf_dir, "documents")
    tok = docs.selectExpr(
        "explode(filter(split(text, ' '), t -> t != '')) as tok"
    )
    assert rows[-1].cum_tokens == tok.count()
    assert rows[-1].cum_types == tok.distinct().count()
    assert sum(r.n_docs for r in rows) == docs.count()


def test_phrase_match_positions(spark):
    """Hand-built positional semantics: overlapping occurrences, repeated
    words, phrase crossing absent."""
    from thymeflow_back_spark.operators.fts import (
        phrase_match,
        positional_index,
    )
    import pytest

    rows = [
        (0, "a b a b a"),   # 'a b a' occurs at pos 0 and 2 (overlap ok)
        (1, "a b c"),       # no 'a b a'
        (2, "x a b a y a b a"),  # two occurrences
        (3, "b a a"),       # none
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = positional_index(df, "doc_id", "text")
    got = {
        r.entity_id: r.n_occurrences
        for r in phrase_match(idx, ["a", "b", "a"]).collect()
    }
    assert got == {0: 2, 2: 2}
    # single-word phrase = plain term frequency
    single = {
        r.entity_id: r.n_occurrences
        for r in phrase_match(idx, ["a"]).collect()
    }
    assert single == {0: 3, 1: 1, 2: 4, 3: 2}
    with pytest.raises(ValueError):
        phrase_match(idx, [])


def test_bin_counts_handles_duplicate_scores(spark):
    # regression: the old (score, tie)-keyed regroup collapsed duplicate
    # rows into one group (bin id AND count both wrong); the scalar
    # per-row binning must count every row independently
    from thymeflow_back_spark.operators.evalcurves import bin_counts_by_edges

    edges = spark.createDataFrame([(10.0,), (20.0,)], "__edge double")
    df = spark.createDataFrame(
        [(5.0,)] * 3 + [(15.0,)] * 2 + [(25.0,)] * 4 + [(10.0,)] * 2,
        "s double",
    )
    got = {
        r.bin: r.n for r in bin_counts_by_edges(df, "s", edges).collect()
    }
    # ties at an edge stay in the LOWER bin: the two 10.0 rows join bin 1
    assert got == {1: 5, 2: 2, 3: 4}
