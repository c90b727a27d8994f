"""Synchronous label propagation (operators/labelprop.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thymeflow_back_spark.operators.labelprop import (
    propagate_labels,
    rare_shingle_edges,
)


def _edges(spark, pairs):
    both = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src long, dst long")


def _seeds(spark, rows):
    return spark.createDataFrame(rows, "id long, label string")


def _out(df):
    return {(r.id): (r.label, r.round) for r in df.collect()}


def test_propagation_chain_rounds(spark):
    # 0 -- 1 -- 2 -- 3: the label walks one hop per synchronous round
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    s = _seeds(spark, [(0, "a")])
    got = _out(propagate_labels(e, s, 3))
    assert got == {0: ("a", 0), 1: ("a", 1), 2: ("a", 2), 3: ("a", 3)}


def test_majority_and_tie_break(spark):
    # node 9 has two 'b' neighbors and one 'a' -> majority 'b';
    # node 8 sees one 'a' and one 'b' -> tie broken to the smaller label
    e = _edges(spark, [(1, 9), (2, 9), (3, 9), (1, 8), (2, 8)])
    s = _seeds(spark, [(1, "a"), (2, "b"), (3, "b")])
    got = _out(propagate_labels(e, s, 1))
    assert got[9] == ("b", 1)
    assert got[8] == ("a", 1)


def test_seeds_are_clamped(spark):
    # seed 0 ('a') is surrounded by 'b' seeds but never re-labeled
    e = _edges(spark, [(1, 0), (2, 0)])
    s = _seeds(spark, [(0, "a"), (1, "b"), (2, "b")])
    got = _out(propagate_labels(e, s, 2))
    assert got[0] == ("a", 0)


def test_synchronous_not_cascading(spark):
    # 0(a) -- 1 -- 2: after ONE round only node 1 is labeled — a cascading
    # (asynchronous) implementation would already have reached node 2
    e = _edges(spark, [(0, 1), (1, 2)])
    s = _seeds(spark, [(0, "a")])
    got = _out(propagate_labels(e, s, 1))
    assert 2 not in got and got[1] == ("a", 1)


def test_rounds_zero_returns_seeds(spark):
    e = _edges(spark, [(0, 1)])
    s = _seeds(spark, [(0, "a")])
    assert _out(propagate_labels(e, s, 0)) == {0: ("a", 0)}
    with pytest.raises(ValueError):
        propagate_labels(e, s, -1)


def test_partitioning_invariance(spark, sf_dir):
    from thymeflow_back_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    seeds = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id"), F.col("lang").alias("label")
    )
    outs = []
    for parts in (3, 17):
        e = rare_shingle_edges(docs.repartition(parts), "doc_id", "text")
        outs.append(sorted(
            (r.id, r.label, r.round)
            for r in propagate_labels(e, seeds, 2).collect()
        ))
    assert outs[0] == outs[1] and outs[0]


def test_rare_shingle_edges_symmetric_and_capped(spark, sf_dir):
    from thymeflow_back_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    e = rare_shingle_edges(docs, "doc_id", "text", n=4, df_cap=4)
    rows = {(r.src, r.dst) for r in e.collect()}
    assert rows, "graph should not be empty at sf0.001"
    assert all((b, a) in rows for a, b in rows)  # both orientations
    assert all(a != b for a, b in rows)  # no self loops
