"""AgentMatch full-composite tests: bipartite term matching, normalized
soft-TF-IDF, contact-½ weighting, name-part dedup, part-type filter, and
the end-to-end enricher (reference AgentMatchEnricher.scala:139-340,
EntityResolution.scala:19-140)."""

from __future__ import annotations

import math

import pytest

# AgentMatch ER end-to-end (quick tier keeps the q_agent_name_weights oracle row + operator tests)
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from thymeflow_back_spark.algorithms.er_scoring import (
    deduplicate_name_parts,
    levenshtein_similarity,
    matching_term_indices,
    name_terms_equality_probability,
    names_equality_probability,
    normalized_soft_tfidf,
)
from thymeflow_back_spark.enrichers.agent_match import (
    OUTPUT_GRAPH,
    agent_match_enricher,
    agent_match_pairs,
    agent_name_counts,
    agent_name_weights,
    shared_id_representative,
)
from thymeflow_back_spark.rdf import vocab
from thymeflow_back_spark.rdf.model import QUAD_SCHEMA
from thymeflow_back_spark.rdf.store import Diff, StatementStore


# --- local scoring ------------------------------------------------------------


def test_matching_term_indices_swapped_names():
    # "alice wonders" vs "wondrs alice": bipartite matching aligns across positions
    m = matching_term_indices(["alice", "wonders"], ["wondrs", "alice"])
    by_pair = {(tuple(a), tuple(b)): s for a, b, s in m}
    assert ([0], [1]) in [(list(a), list(b)) for a, b, _ in m] or ((0,), (1,)) in by_pair
    assert by_pair[((0,), (1,))] == 1.0  # alice == alice
    assert by_pair[((1,), (0,))] == pytest.approx(levenshtein_similarity("wonders", "wondrs"))


def test_matching_term_indices_leftover_concat():
    # "anne marie" vs "annemarie": leftover terms concatenate and match
    m = matching_term_indices(["anne", "marie"], ["annemarie"], distance_threshold=0.2)
    # no single term is within 0.2 of "annemarie", but "anne marie" is
    assert m == [([0, 1], [0], pytest.approx(0.9))]


def test_normalized_soft_tfidf_is_mass_ratio():
    # one matched term of idf-mass 2 out of total mass (2+1)+(2) = 5 → 4/5·1.0
    score = normalized_soft_tfidf([2.0, 1.0], [2.0], [([0], [0], 1.0)])
    assert score == pytest.approx(4.0 / 5.0)


def test_names_equality_probability_weighted_average():
    idf = {"alice": 1.0, "wonders": 1.0, "bob": 1.0}
    exact = names_equality_probability([(["alice"], 1.0)], [(["alice"], 1.0)], idf)
    assert exact == pytest.approx(1.0)
    mixed = names_equality_probability(
        [(["alice"], 0.5), (["bob"], 0.5)], [(["alice"], 1.0)], idf
    )
    # (0.5·1.0 + 0.5·0) / 1.0
    assert mixed == pytest.approx(0.5)


def test_deduplicate_name_parts_merges_variants():
    parts = deduplicate_name_parts(
        names=[(["john", "doe"], 0.6), (["doe", "john"], 0.3), (["johnny"], 0.1)],
        typed_parts=[(["john"], vocab.GIVEN_NAME), (["doe"], vocab.FAMILY_NAME)],
        distance_threshold=0.5,
    )
    by_token = {t: (w, ty) for t, w, ty in parts}
    assert set(by_token) == {"john", "doe"}
    assert by_token["john"][1] == [vocab.GIVEN_NAME]
    assert by_token["doe"][1] == [vocab.FAMILY_NAME]
    # john group absorbed johnny's weight; both john groups sum
    assert by_token["john"][0] == pytest.approx(0.6 + 0.3 + 0.1)
    assert by_token["doe"][0] == pytest.approx(0.6 + 0.3)


def test_name_terms_equality_probability_weighted():
    idf = {"john": 1.0, "doe": 1.0}
    p = name_terms_equality_probability([("john", 1.0), ("doe", 1.0)], [("john", 1.0)], idf)
    # matched mass (1+1) / total (2+1)
    assert p == pytest.approx(2.0 / 3.0)


# --- store-level fixtures -----------------------------------------------------


def _q(s, p, o, g="urn:doc:1", otype="iri"):
    return (s, p, o, otype, "http://www.w3.org/2001/XMLSchema#string" if otype == "literal" else None, None, g)


def _store(spark, rows):
    return StatementStore(spark.createDataFrame(rows, QUAD_SCHEMA))


def _agent(rows, iri, names, contact=True, n_msgs=0):
    rows.append(_q(iri, vocab.RDF_TYPE, vocab.AGENT))
    for n in names:
        rows.append(_q(iri, vocab.NAME, n, otype="literal"))
    for i in range(n_msgs):
        rows.append(_q(f"urn:msg:{iri}:{i}", vocab.SENDER, iri))
    return rows


def test_contact_relative_weighting(spark):
    """A contact name with 1 occurrence vs 9 message-name occurrences is
    lifted to ½ of the agent's mass."""
    rows = []
    rows.append(_q("urn:a", vocab.RDF_TYPE, vocab.AGENT))
    rows.append(_q("urn:a", vocab.NAME, "Bob Contact", otype="literal"))
    rows.append(_q("urn:b", vocab.RDF_TYPE, vocab.AGENT))
    rows.append(_q("urn:b", vocab.NAME, "Bobby Msg", otype="literal"))
    for i in range(9):
        rows.append(_q(f"urn:m{i}", vocab.SENDER, "urn:b"))
    # merge a and b via an IFP sameAs so they share one representative
    rows.append(_q("urn:a", vocab.SAME_AS, "urn:b", g="urn:graph:ifpInferencer"))
    store = _store(spark, rows)
    rep_map = shared_id_representative(store)
    counts = agent_name_counts(store, rep_map)
    got = {(r.name, r.is_contact): r.cnt for r in counts.collect()}
    assert got == {("Bob Contact", True): 1, ("Bobby Msg", False): 9}

    weights = {r.name: r.weight for r in agent_name_weights(counts, 0.5).collect()}
    assert weights["Bob Contact"] == pytest.approx(0.5)
    assert weights["Bobby Msg"] == pytest.approx(0.5)
    # without the lift, weights are plain frequencies
    flat = {r.name: r.weight for r in agent_name_weights(counts, None).collect()}
    assert flat["Bob Contact"] == pytest.approx(0.1)
    assert flat["Bobby Msg"] == pytest.approx(0.9)


def test_agent_match_end_to_end_vanilla(spark):
    rows = []
    _agent(rows, "urn:alice1", ["Alice Wonders"])
    _agent(rows, "urn:alice2", ["Wonders Alice"], n_msgs=2)
    _agent(rows, "urn:bob", ["Bob Builder"])
    _agent(rows, "urn:carol", ["Carol Wonders"])
    store = _store(spark, rows)
    pairs = agent_match_pairs(store, threshold=0.9).collect()
    got = {(r.a, r.b) for r in pairs}
    assert ("urn:alice1", "urn:alice2") in got
    assert all("urn:bob" not in p for p in got)
    # carol shares only 'wonders' with alice — idf-weighted mass below 0.9
    assert all("urn:carol" not in p for p in got)


def test_agent_match_different_from_suppression(spark):
    rows = []
    _agent(rows, "urn:a1", ["Dana Scully"])
    _agent(rows, "urn:a2", ["Dana Scully"])
    # background agents so term IDFs are non-zero (with a 2-agent universe
    # every shared term has idf ln(1)=0 — same as the reference's IDF)
    _agent(rows, "urn:bg1", ["Fox Mulder"])
    _agent(rows, "urn:bg2", ["Walter Skinner"])
    rows.append(_q("urn:a1", vocab.DIFFERENT_FROM, "urn:a2"))
    store = _store(spark, rows)
    assert agent_match_pairs(store).count() == 0
    rows2 = [r for r in rows if r[1] != vocab.DIFFERENT_FROM]
    assert agent_match_pairs(_store(spark, rows2)).count() == 1


def test_agent_match_enricher_emits_symmetric_quads(spark):
    rows = []
    _agent(rows, "urn:x", ["Erin Example"])
    _agent(rows, "urn:y", ["Erin Example"])
    _agent(rows, "urn:bg1", ["Fox Mulder"])
    _agent(rows, "urn:bg2", ["Walter Skinner"])
    store = _store(spark, rows)
    diff = agent_match_enricher(store, Diff(store.quads.limit(0), store.quads.limit(0)))
    added = diff.added.collect()
    assert {(r.subject, r.object_value) for r in added} == {("urn:x", "urn:y"), ("urn:y", "urn:x")}
    assert all(r.object_type == "iri" for r in added)
    assert all(r.graph == OUTPUT_GRAPH and r.predicate == vocab.SAME_AS for r in added)


def test_agent_match_dedup_parts_mode(spark):
    rows = []
    _agent(rows, "urn:jd1", ["John Doe", "Doe, John"])
    _agent(rows, "urn:jd2", ["J. Doe", "John Doe"])
    _agent(rows, "urn:bg1", ["Fox Mulder"])
    _agent(rows, "urn:bg2", ["Walter Skinner"])
    rows.append(_q("urn:jd1", vocab.GIVEN_NAME, "John", otype="literal"))
    rows.append(_q("urn:jd1", vocab.FAMILY_NAME, "Doe", otype="literal"))
    store = _store(spark, rows)
    pairs = agent_match_pairs(store, solve_mode="dedup_parts", threshold=0.5).collect()
    assert {(r.a, r.b) for r in pairs} == {("urn:jd1", "urn:jd2")}


def test_solve_part_types_filters_one_sided_agents(spark):
    """An agent whose parts are all type-inferred but lack a family name is
    excluded from matching; agents with unknown parts stay."""
    rows = []
    # corporate domain: alice.smith@acme.com with typed parts → teaches the
    # (acme.com, 2-segment) pattern given/family
    _agent(rows, "urn:t1", ["Alice Smith"])
    rows.append(_q("urn:t1", vocab.GIVEN_NAME, "Alice", otype="literal"))
    rows.append(_q("urn:t1", vocab.FAMILY_NAME, "Smith", otype="literal"))
    rows.append(_q("urn:t1", vocab.EMAIL, "mailto:alice.smith@acme.com"))
    rows.append(_q("mailto:alice.smith@acme.com", vocab.NAME, "alice.smith@acme.com", otype="literal"))
    # given-name-only agent on the same domain/pattern: "Bob" matches pos 0
    # (given) — fully inferred but family evidence missing → filtered
    _agent(rows, "urn:t2", ["Bob"])
    rows.append(_q("urn:t2", vocab.EMAIL, "mailto:bob.jones@acme.com"))
    rows.append(_q("mailto:bob.jones@acme.com", vocab.NAME, "bob.jones@acme.com", otype="literal"))
    _agent(rows, "urn:t3", ["Bob"])  # no email: not fully inferred → kept
    store = _store(spark, rows)

    pairs_all = agent_match_pairs(store, solve_mode="dedup_parts", threshold=0.9)
    assert {(r.a, r.b) for r in pairs_all.collect()} == {("urn:t2", "urn:t3")}
    pairs = agent_match_pairs(store, solve_mode="solve_part_types", threshold=0.9)
    # t2 is filtered, so the bob-bob match disappears
    assert pairs.count() == 0
