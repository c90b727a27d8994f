"""Sorted-neighborhood dedup (operators/snm.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thymeflow_back_spark.operators.snm import snm_candidates, snm_near_dups
from thymeflow_back_spark.tables import load


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_candidate_volume_is_linear_in_window(spark):
    # n rows, window w: pairs with rank distance 1..w-1 -> n*(w-1) - (w-1)*w/2
    rows = [(i, f"{chr(97 + i)} unique text body {i}") for i in range(10)]
    cands = snm_candidates(_docs(spark, rows), "doc_id", "text", window=4)
    assert cands.count() == 9 + 8 + 7  # distances 1, 2, 3 over 10 rows


def test_skew_immunity_identical_keys(spark):
    # 50 documents with IDENTICAL prefix keys: frequency blocking would
    # produce 50*49/2 pairs; SNM stays at the window bound
    rows = [(i, "same same same same same tail" + str(i)) for i in range(50)]
    cands = snm_candidates(_docs(spark, rows), "doc_id", "text", window=3)
    assert cands.count() == 49 + 48  # never quadratic


def test_window_validation(spark):
    with pytest.raises(ValueError):
        snm_candidates(_docs(spark, [(0, "a")]), "doc_id", "text", window=1)


def test_multi_pass_provenance(spark):
    # a/b share a long TAIL but differ in the first tokens -> only the
    # reversed pass can sort them adjacently; c is unrelated filler
    common = " ".join(f"w{i}" for i in range(20))
    rows = [
        (0, "aaa " + common),
        (1, "zzz " + common),
        (2, "mmm " + " ".join(f"x{i}" for i in range(20))),
    ]
    out = snm_near_dups(
        _docs(spark, rows), "doc_id", "text", window=2, threshold=0.5
    ).collect()
    got = {(r.a_id, r.b_id): (r.in_fwd, r.in_rev) for r in out}
    assert (0, 1) in got
    assert got[(0, 1)][1] == 1  # found by the reverse pass
    # jaccard of the pair is high (shingle sets differ only at the head)
    j = {(r.a_id, r.b_id): r.jaccard for r in out}[(0, 1)]
    assert j > 0.8


def test_snm_recall_vs_exhaustive(spark, sf_dir):
    from thymeflow_back_spark.operators.dedup import (
        jaccard_pairs,
        word_shingles,
    )

    docs = load(spark, sf_dir, "documents")
    true = {
        (r.a_id, r.b_id)
        for r in jaccard_pairs(
            word_shingles(docs, "doc_id", "text", 3), "doc_id", 0.5
        ).collect()
    }
    got = {
        (r.a_id, r.b_id)
        for r in snm_near_dups(
            docs, "doc_id", "text", window=9, threshold=0.5
        ).collect()
    }
    assert true, "sf0.001 corpus should contain near-dup pairs"
    assert got == true  # full recall on this corpus, no false positives


def test_partitioning_invariance(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    outs = []
    for parts in (2, 13):
        outs.append(sorted(
            (r.a_id, r.b_id, r.n_common, r.jaccard, r.in_fwd, r.in_rev)
            for r in snm_near_dups(
                docs.repartition(parts), "doc_id", "text", 9, 0.5
            ).collect()
        ))
    assert outs[0] == outs[1] and outs[0]
