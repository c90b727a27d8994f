"""ER evaluation harness goldens (reference
EntityResolutionEvaluation.scala:24-120): precision/recall/F1 at
thresholds over a labeled pair sample, and the deterministic stratified
annotation sample."""

from __future__ import annotations

import pytest

from thymeflow_back_spark.enrichers.er_eval import annotation_sample, er_evaluation


def test_er_evaluation_curve(spark):
    scored = spark.createDataFrame(
        [
            ("a", "b", 0.95),  # true match, high score
            ("c", "d", 0.85),  # false match, high score
            ("f", "e", 0.40),  # true match, low score (note swapped order)
            ("g", "h", 0.10),  # false match, low score
        ],
        "a_id string, b_id string, probability double",
    )
    labels = spark.createDataFrame(
        [
            ("a", "b", True),
            ("c", "d", False),
            ("e", "f", True),   # canonical order differs from scored
            ("g", "h", False),
            ("x", "y", True),   # never proposed by the matcher → scores 0
        ],
        "a_id string, b_id string, is_match boolean",
    )
    rows = {r.threshold: r for r in er_evaluation(scored, labels, [0.5, 0.9]).collect()}

    r5 = rows[0.5]
    # predicted at 0.5: ab(tp), cd(fp); missed: ef, xy
    assert (r5.tp, r5.fp, r5.fn, r5.n_labeled) == (1, 1, 2, 5)
    assert r5.precision == pytest.approx(0.5)
    assert r5.recall == pytest.approx(1 / 3)
    assert r5.f1 == pytest.approx(2 * 0.5 * (1 / 3) / (0.5 + 1 / 3))

    r9 = rows[0.9]
    assert (r9.tp, r9.fp, r9.fn) == (1, 0, 2)
    assert r9.precision == pytest.approx(1.0)


def test_er_evaluation_empty_prediction_band(spark):
    scored = spark.createDataFrame([], "a_id string, b_id string, probability double")
    labels = spark.createDataFrame(
        [("a", "b", True)], "a_id string, b_id string, is_match boolean"
    )
    [row] = er_evaluation(scored, labels, [0.5]).collect()
    assert (row.tp, row.fp, row.fn) == (0, 0, 1)
    assert row.precision is None  # no predictions → undefined, not 0/0 crash
    assert row.recall == pytest.approx(0.0)


def test_annotation_sample_stratified_and_deterministic(spark):
    pairs = spark.createDataFrame(
        [(f"a{i}", f"b{i}", (i % 10) / 10 + 0.05) for i in range(100)],
        "a_id string, b_id string, probability double",
    )
    s1 = annotation_sample(pairs, per_decile=2).collect()
    s2 = annotation_sample(pairs, per_decile=2).collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]  # deterministic
    by_decile = {}
    for r in s1:
        by_decile.setdefault(r.decile, []).append(r)
    assert set(by_decile) == set(range(10))  # every score band sampled
    assert all(len(v) == 2 for v in by_decile.values())
