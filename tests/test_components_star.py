"""Large-star/small-star connected components (operators/closure.py)."""

from __future__ import annotations

import pytest

from thymeflow_back_spark.operators.closure import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return sorted((r.node, r.component) for r in df.collect())


def test_matches_propagation_on_mixed_graph(spark):
    # a 150-node path (deep diameter), a triangle, and a 2-node edge
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(149)]
        + [(500, 501), (501, 502), (500, 502), (900, 901)],
        "src long, dst long",
    )
    star = _labels(connected_components_star(edges))
    prop = _labels(connected_components(edges, max_iterations=200))
    assert star == prop
    comps = {c for _, c in star}
    assert comps == {0, 500, 900}


def test_logarithmic_rounds_on_long_chain(spark):
    # 200-node path: diameter 199, but the star alternation must converge
    # within 15 rounds (O(log^2 n) — propagation would need ~199)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "src long, dst long"
    )
    out = _labels(connected_components_star(edges, max_rounds=15))
    assert out == [(i, 0) for i in range(200)]


def test_round_cap_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "src long, dst long"
    )
    with pytest.raises(RuntimeError):
        connected_components_star(edges, max_rounds=1)


def test_string_ids_and_self_loops(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "x"), ("x", "y")],
        "src string, dst string",
    )
    out = dict(_labels(connected_components_star(edges)))
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_self_loop_only_node_is_labeled(spark):
    """A node whose ONLY incident edge is a self-loop must still be labeled
    (node, node) — min-label propagation emits it, so the star variant's
    IDENTICAL-output contract requires it too (round-9 advice fix)."""
    edges = spark.createDataFrame(
        [("z", "z"), ("a", "b")], "src string, dst string"
    )
    star = _labels(connected_components_star(edges))
    prop = _labels(connected_components(edges))
    assert star == prop
    assert ("z", "z") in star
    # all-self-loop input: no star rounds run at all, every node labels itself
    only_loops = spark.createDataFrame(
        [("p", "p"), ("q", "q")], "src string, dst string"
    )
    assert _labels(connected_components_star(only_loops)) == [
        ("p", "p"),
        ("q", "q"),
    ]


def test_empty_input(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components_star(edges).count() == 0


def test_partitioning_invariance(spark):
    rows = [(i, i + 1) for i in range(99)] + [(50, 300), (300, 301)]
    outs = []
    for parts in (2, 11):
        edges = spark.createDataFrame(rows, "src long, dst long").repartition(
            parts
        )
        outs.append(_labels(connected_components_star(edges)))
    assert outs[0] == outs[1]


def test_random_graph_sweep_matches_propagation(spark):
    """Seeded randomized sweep (the randomized exact-recall idiom): star
    and propagation must agree on arbitrary graph shapes, not just the
    hand-built fixtures."""
    import random

    rng = random.Random(42)
    cases = []
    for n, m in ((30, 15), (40, 60), (25, 5)):
        cases.append(
            [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        )
    cases.append([(i, i + 1) for i in range(60)])  # deep path
    for rows in cases:
        rows = [(a, b) for a, b in rows if a != b] or [(0, 1)]
        edges = spark.createDataFrame(rows, "src long, dst long")
        star = _labels(connected_components_star(edges))
        prop = _labels(connected_components(edges, max_iterations=100))
        assert star == prop, rows[:10]


def test_local_closure_matches_distributed(spark):
    # transitive_closure_local (the model-sized driver-side escape hatch
    # rdfs.py uses for ontology hierarchies) must return the SAME relation
    # as the distributed fixpoint: reflexive pairs for every endpoint plus
    # every >=1-step reachability pair — including on a cycle and a DAG
    # with diamond re-convergence.
    from thymeflow_back_spark.operators.closure import (
        transitive_closure,
        transitive_closure_local,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),      # 3-cycle
         ("d", "e"), ("d", "f"), ("e", "g"), ("f", "g"),  # diamond
         ("h", "h")],                              # self-loop
        "src string, dst string",
    )
    dist = sorted((r.src, r.dst) for r in transitive_closure(edges).collect())
    local = sorted((r.src, r.dst) for r in transitive_closure_local(edges).collect())
    assert local == dist


def test_local_closure_guards_data_sized_input(spark):
    from thymeflow_back_spark.operators.closure import transitive_closure_local

    edges = spark.createDataFrame(
        [(str(i), str(i + 1)) for i in range(30)], "src string, dst string"
    )
    with pytest.raises(ValueError, match="use transitive_closure"):
        transitive_closure_local(edges, max_rows=10)
