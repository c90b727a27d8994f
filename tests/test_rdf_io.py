"""RDF I/O tests: Turtle/TriG/NTriples/NQuads parsing, column-expression
serialization round-trips, the reference ontology file, and the user-graph
TriG persistence path (FileSynchronization parity)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from thymeflow_back_spark.rdf.io import (
    load_graphs_trig,
    load_nquads_lines,
    load_ontology,
    load_rdf,
    parse_rdf,
    save_graphs_trig,
    serialize_nquads,
    serialize_ntriples,
    serialize_trig,
)
from thymeflow_back_spark.rdf.model import QUAD_SCHEMA

REF_ONTOLOGY = "/root/reference/core/src/main/resources/rdfs-ontology.ttl"

TURTLE = """
@prefix schema: <http://schema.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@base <http://example.org/> .

<alice> a schema:Person ;
    schema:name "Alice" , "Alicia"@es ;
    schema:birthDate "1990-01-02"^^xsd:date ;
    schema:height 1.75 ;
    schema:age 35 ;
    schema:knows [ schema:name "Bob \\"B\\" Builder" ] .
"""


def _spo(quads):
    return {(q[0], q[1], q[2]) for q in quads}


def test_parse_turtle_core():
    quads = parse_rdf(TURTLE, default_graph="urn:g")
    spo = _spo(quads)
    alice = "http://example.org/alice"
    assert (alice, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "http://schema.org/Person") in spo
    assert (alice, "http://schema.org/name", "Alice") in spo
    langs = {q[5] for q in quads if q[1] == "http://schema.org/name" and q[0] == alice}
    assert langs == {None, "es"}
    dt = {q[4] for q in quads if q[1] == "http://schema.org/birthDate"}
    assert dt == {"http://www.w3.org/2001/XMLSchema#date"}
    # numeric shorthand literals get xsd types
    assert ("http://www.w3.org/2001/XMLSchema#decimal") in {q[4] for q in quads}
    assert ("http://www.w3.org/2001/XMLSchema#integer") in {q[4] for q in quads}
    # blank node property list: one generated bnode with an escaped-quote name
    bnode_names = {q[2] for q in quads if q[0].startswith("_:")}
    assert 'Bob "B" Builder' in bnode_names
    assert all(q[6] == "urn:g" for q in quads)


def test_parse_trig_graph_blocks():
    trig = """
    @prefix s: <http://schema.org/> .
    <urn:doc:1> { <urn:a> s:name "A" . }
    GRAPH <urn:doc:2> { <urn:b> s:name "B" ; a s:Person . }
    <urn:c> s:name "top" .
    """
    quads = parse_rdf(trig, default_graph="urn:default")
    by_graph = {}
    for q in quads:
        by_graph.setdefault(q[6], set()).add(q[0])
    assert by_graph == {
        "urn:doc:1": {"urn:a"},
        "urn:doc:2": {"urn:b"},
        "urn:default": {"urn:c"},
    }


def test_parse_nquads_and_collection():
    nq = '<urn:s> <urn:p> "v\\n2" <urn:g> .\n<urn:s2> <urn:p> <urn:o> <urn:g2> .'
    quads = parse_rdf(nq, default_graph="urn:x")
    assert {(q[2], q[6]) for q in quads} == {("v\n2", "urn:g"), ("urn:o", "urn:g2")}

    ttl = "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> . <urn:s> <urn:p> ( 1 2 ) ."
    quads = parse_rdf(ttl, default_graph="urn:x")
    firsts = [q[2] for q in quads if q[1].endswith("#first")]
    assert firsts == ["1", "2"]
    rests = [q[2] for q in quads if q[1].endswith("#rest")]
    assert rests[-1].endswith("#nil")


def test_reference_ontology_parses():
    if not os.path.exists(REF_ONTOLOGY):
        return
    with open(REF_ONTOLOGY) as f:
        quads = parse_rdf(f.read(), default_graph="urn:graph:ontology")
    preds = {q[1] for q in quads}
    assert "http://www.w3.org/2000/01/rdf-schema#subClassOf" in preds
    assert "http://www.w3.org/2000/01/rdf-schema#domain" in preds
    subclass = [q for q in quads if q[1].endswith("subClassOf")]
    # schema:Person ⊑ personal:Agent is in the file
    assert ("http://schema.org/Person", "http://thymeflow.com/personal#Agent") in {
        (q[0], q[2]) for q in subclass
    }
    assert len(quads) > 100


def test_ntriples_serialize_parse_roundtrip(spark):
    rows = [
        ("urn:s", "urn:p", 'tricky "quoted"\nline\\path', "literal", "http://www.w3.org/2001/XMLSchema#string", None, "urn:g"),
        ("urn:s", "urn:p2", "urn:o", "iri", None, None, "urn:g"),
        ("_:b1", "urn:p3", "x", "literal", "http://www.w3.org/2001/XMLSchema#string", "fr", "urn:g2"),
        ("urn:s2", "urn:p4", "3.5", "literal", "http://www.w3.org/2001/XMLSchema#double", None, "urn:g2"),
    ]
    df = spark.createDataFrame(rows, QUAD_SCHEMA)
    nq_text = "\n".join(r["line"] for r in serialize_nquads(df).collect())
    back = parse_rdf(nq_text, default_graph="unused")
    assert {tuple(r) for r in back} == set(rows)

    nt_text = "\n".join(r["line"] for r in serialize_ntriples(df).collect())
    back = parse_rdf(nt_text, default_graph="urn:one")
    assert {tuple(r[:6]) for r in back} == {r[:6] for r in rows}


def test_trig_file_roundtrip(spark, tmp_path):
    rows = [
        ("urn:s", "http://schema.org/name", "Aliénor", "literal", "http://www.w3.org/2001/XMLSchema#string", None, "urn:graph:user"),
        ("urn:s", "urn:p", "urn:o", "iri", None, None, "urn:graph:user"),
        ("urn:t", "urn:p", "5", "literal", "http://www.w3.org/2001/XMLSchema#integer", None, "urn:graph:other"),
    ]
    df = spark.createDataFrame(rows, QUAD_SCHEMA)
    path = str(tmp_path / "user.trig")
    save_graphs_trig(df, path)
    back = load_graphs_trig(spark, path)
    assert {tuple(r) for r in back.collect()} == set(rows)


def test_load_rdf_distributed_and_ontology(spark, tmp_path):
    (tmp_path / "a.ttl").write_text(
        '@prefix s: <http://schema.org/> . <urn:x> s:name "X" .'
    )
    (tmp_path / "b.nt").write_text('<urn:y> <http://schema.org/name> "Y" .')
    quads = load_rdf(spark, str(tmp_path))
    got = {(r.subject, r.object_value) for r in quads.collect()}
    assert got == {("urn:x", "X"), ("urn:y", "Y")}
    # per-document graphs differ per source file
    assert quads.select("graph").distinct().count() == 2

    if os.path.exists(REF_ONTOLOGY):
        onto = load_ontology(spark, REF_ONTOLOGY)
        assert onto.filter(F.col("graph") == "urn:graph:ontology").count() == onto.count()
        assert onto.count() > 100


def test_loaded_ontology_drives_rdfs_chaining(spark):
    """The startup path: ontology file → store → RDFS forward chainer
    derives supertypes for instance data (reference loads rdfs-ontology.ttl
    at repository init and wires it into the inferencer sail)."""
    if not os.path.exists(REF_ONTOLOGY):
        return
    from thymeflow_back_spark.enrichers.rdfs import rdfs_enricher
    from thymeflow_back_spark.rdf.store import Diff, StatementStore

    onto = load_ontology(spark, REF_ONTOLOGY)
    inst = spark.createDataFrame(
        [
            (
                "urn:alice",
                "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                "http://schema.org/Person",
                "iri",
                None,
                None,
                "urn:doc:1",
            )
        ],
        QUAD_SCHEMA,
    )
    store = StatementStore(onto.unionByName(inst))
    diff = rdfs_enricher(store, Diff(added=inst, removed=inst.limit(0)))
    derived = {(r.subject, r.object_value) for r in diff.added.collect()}
    assert ("urn:alice", "http://thymeflow.com/personal#Agent") in derived
    assert ("urn:alice", "http://schema.org/Thing") in derived


def test_load_nquads_lines(spark, tmp_path):
    lines = [f'<urn:s{i}> <urn:p> "v{i}" <urn:g{i % 3}> .' for i in range(100)]
    p = tmp_path / "bulk.nq"
    p.write_text("# comment\n" + "\n".join(lines) + "\n")
    df = load_nquads_lines(spark, str(p))
    assert df.count() == 100
    assert df.select("graph").distinct().count() == 3
