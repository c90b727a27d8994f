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


# --- RDF/XML + TriX (Rio bundle parity: rio-rdfxml / rio-trix) ---------------


def test_rdfxml_basic_and_typed_nodes():
    from thymeflow_back_spark.rdf.io import parse_rdfxml

    text = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://ex.org/" xml:base="http://base.org/">
      <rdf:Description rdf:about="http://ex.org/alice">
        <ex:name>Alice</ex:name>
        <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
        <ex:label xml:lang="en">the alice</ex:label>
        <ex:knows rdf:resource="http://ex.org/bob"/>
      </rdf:Description>
      <ex:Robot rdf:ID="r2d2">
        <ex:name>R2D2</ex:name>
      </ex:Robot>
    </rdf:RDF>"""
    quads = parse_rdfxml(text, "g")
    by_pred = {}
    for s, p, o, ot, dt, lang, g in quads:
        by_pred.setdefault(p, []).append((s, o, ot, dt, lang))
        assert g == "g"
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    xsd = "http://www.w3.org/2001/XMLSchema#"
    assert by_pred["http://ex.org/name"] == [
        ("http://ex.org/alice", "Alice", "literal", xsd + "string", None),
        ("http://base.org/#r2d2", "R2D2", "literal", xsd + "string", None),
    ]
    assert by_pred["http://ex.org/age"] == [
        ("http://ex.org/alice", "30", "literal", xsd + "integer", None)
    ]
    assert by_pred["http://ex.org/label"][0][4] == "en"
    assert by_pred["http://ex.org/knows"] == [
        ("http://ex.org/alice", "http://ex.org/bob", "iri", None, None)
    ]
    assert by_pred[rdf + "type"] == [
        ("http://base.org/#r2d2", "http://ex.org/Robot", "iri", None, None)
    ]


def test_rdfxml_nested_parse_types_and_li():
    from thymeflow_back_spark.rdf.io import parse_rdfxml

    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    text = f"""<rdf:RDF xmlns:rdf="{rdf}" xmlns:ex="http://ex.org/">
      <rdf:Description rdf:about="http://ex.org/a">
        <ex:address rdf:parseType="Resource">
          <ex:city>Paris</ex:city>
        </ex:address>
        <ex:friend><rdf:Description rdf:about="http://ex.org/b"/></ex:friend>
        <ex:bag>
          <rdf:Bag>
            <rdf:li>one</rdf:li>
            <rdf:li>two</rdf:li>
          </rdf:Bag>
        </ex:bag>
        <ex:list rdf:parseType="Collection">
          <rdf:Description rdf:about="http://ex.org/x"/>
          <rdf:Description rdf:about="http://ex.org/y"/>
        </ex:list>
      </rdf:Description>
    </rdf:RDF>"""
    quads = parse_rdfxml(text, "g")
    spo = {(q[0], q[1], q[2]) for q in quads}
    # parseType=Resource: anonymous node holding the city literal
    addr = [q[2] for q in quads if q[1] == "http://ex.org/address"]
    assert len(addr) == 1 and addr[0].startswith("_:")
    assert any(s == addr[0] and p == "http://ex.org/city" and o == "Paris" for s, p, o in spo)
    # nested node element
    assert ("http://ex.org/a", "http://ex.org/friend", "http://ex.org/b") in spo
    # rdf:li expands to rdf:_1 / rdf:_2 on the Bag node
    bag = [q[2] for q in quads if q[1] == "http://ex.org/bag"][0]
    assert any(s == bag and p == rdf + "_1" and o == "one" for s, p, o in spo)
    assert any(s == bag and p == rdf + "_2" and o == "two" for s, p, o in spo)
    # Collection: first/rest chain ending in nil
    firsts = [(q[0], q[2]) for q in quads if q[1] == rdf + "first"]
    assert [o for _, o in firsts] == ["http://ex.org/x", "http://ex.org/y"]
    rests = [q[2] for q in quads if q[1] == rdf + "rest"]
    assert rests[-1] == rdf + "nil"


def test_trix_graphs_and_terms():
    from thymeflow_back_spark.rdf.io import parse_trix

    text = """<?xml version="1.0"?>
    <TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"
          xmlns:xml="http://www.w3.org/XML/1998/namespace">
      <graph>
        <uri>http://g.org/one</uri>
        <triple>
          <uri>http://ex.org/s</uri>
          <uri>http://ex.org/p</uri>
          <plainLiteral xml:lang="fr">bonjour</plainLiteral>
        </triple>
        <triple>
          <id>b1</id>
          <uri>http://ex.org/p</uri>
          <typedLiteral datatype="http://www.w3.org/2001/XMLSchema#integer">5</typedLiteral>
        </triple>
      </graph>
      <graph>
        <triple>
          <uri>http://ex.org/s2</uri>
          <uri>http://ex.org/q</uri>
          <uri>http://ex.org/o2</uri>
        </triple>
      </graph>
    </TriX>"""
    quads = parse_trix(text, "urn:default")
    assert quads[0] == (
        "http://ex.org/s", "http://ex.org/p", "bonjour", "literal",
        "http://www.w3.org/2001/XMLSchema#string", "fr", "http://g.org/one",
    )
    assert quads[1] == (
        "_:b1", "http://ex.org/p", "5", "literal",
        "http://www.w3.org/2001/XMLSchema#integer", None, "http://g.org/one",
    )
    assert quads[2] == (
        "http://ex.org/s2", "http://ex.org/q", "http://ex.org/o2", "iri",
        None, None, "urn:default",
    )


def test_rdfxml_roundtrip_through_ntriples(spark):
    """RDF/XML parse → quads DF → N-Triples serialize → TriG-superset
    reparse: the two parsers agree on the triple set."""
    from thymeflow_back_spark.rdf.io import parse_rdf, parse_rdfxml, serialize_ntriples
    from thymeflow_back_spark.rdf.model import make_quads

    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    text = f"""<rdf:RDF xmlns:rdf="{rdf}" xmlns:ex="http://ex.org/">
      <ex:Person rdf:about="http://ex.org/alice">
        <ex:name>Alice</ex:name>
        <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
        <ex:knows rdf:resource="http://ex.org/bob"/>
      </ex:Person>
    </rdf:RDF>"""
    quads = parse_rdfxml(text, "urn:g")
    df = make_quads(spark, quads)
    nt = "\n".join(r.line for r in serialize_ntriples(df).collect())
    reparsed = parse_rdf(nt, "urn:g")
    strip = lambda qs: {(s, p, o, ot) for s, p, o, ot, _, _, _ in qs}
    assert strip(reparsed) == strip(quads)


def test_rdf_file_dispatch_by_extension(tmp_path, spark):
    from thymeflow_back_spark.rdf.io import load_rdf

    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    (tmp_path / "a.rdf").write_text(
        f'<rdf:RDF xmlns:rdf="{rdf}" xmlns:ex="http://ex.org/">'
        '<rdf:Description rdf:about="http://ex.org/s"><ex:p>v1</ex:p></rdf:Description>'
        "</rdf:RDF>"
    )
    (tmp_path / "b.trix").write_text(
        '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"><graph><triple>'
        "<uri>http://ex.org/s2</uri><uri>http://ex.org/p2</uri><uri>http://ex.org/o2</uri>"
        "</triple></graph></TriX>"
    )
    (tmp_path / "c.ttl").write_text("<http://ex.org/s3> <http://ex.org/p3> 7 .")
    out = load_rdf(spark, str(tmp_path)).collect()
    subjects = {r.subject for r in out}
    assert subjects == {"http://ex.org/s", "http://ex.org/s2", "http://ex.org/s3"}


def test_rdfxml_lang_inherits_from_ancestors():
    from thymeflow_back_spark.rdf.io import parse_rdfxml

    text = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://ex.org/" xml:lang="fr">
      <rdf:Description rdf:about="http://ex.org/s" xml:lang="en">
        <ex:label>hello</ex:label>
        <ex:other xml:lang="">plain</ex:other>
        <ex:own xml:lang="de">hallo</ex:own>
      </rdf:Description>
      <rdf:Description rdf:about="http://ex.org/t">
        <ex:label>bonjour</ex:label>
      </rdf:Description>
    </rdf:RDF>"""
    quads = parse_rdfxml(text, default_graph="g")
    by_val = {q[2]: q[5] for q in quads}
    assert by_val["hello"] == "en"  # inherited from the node element
    assert by_val["plain"] is None  # xml:lang="" cancels inheritance
    assert by_val["hallo"] == "de"  # own attribute wins
    assert by_val["bonjour"] == "fr"  # inherited from rdf:RDF


def test_trix_pretty_printed_whitespace_stripped():
    from thymeflow_back_spark.rdf.io import parse_trix

    text = """<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
      <graph>
        <uri>
          http://ex.org/g
        </uri>
        <triple>
          <uri>
            http://ex.org/s
          </uri>
          <uri> http://ex.org/p </uri>
          <plainLiteral>  keep my spaces  </plainLiteral>
        </triple>
      </graph>
    </TriX>"""
    [(s, p, o, otype, _, _, g)] = parse_trix(text, default_graph="d")
    assert (s, p, g) == ("http://ex.org/s", "http://ex.org/p", "http://ex.org/g")
    assert o == "  keep my spaces  "  # literal whitespace is significant


def test_rdfxml_relative_iri_resolution():
    """rdf:about/rdf:resource relative references resolve per RFC 3986
    against xml:base — not by string concatenation (round-4 review:
    'alice' against base http://e.org/data.rdf is http://e.org/alice)."""
    from thymeflow_back_spark.rdf.io import parse_rdfxml

    text = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://ex.org/" xml:base="http://e.org/data.rdf">
      <rdf:Description rdf:about="alice">
        <ex:knows rdf:resource="bob"/>
        <ex:self rdf:resource=""/>
        <ex:part rdf:resource="#left"/>
      </rdf:Description>
    </rdf:RDF>"""
    quads = parse_rdfxml(text, "g")
    triples = {(s, p, o) for s, p, o, *_ in quads}
    assert ("http://e.org/alice", "http://ex.org/knows", "http://e.org/bob") in triples
    assert ("http://e.org/alice", "http://ex.org/self", "http://e.org/data.rdf") in triples
    assert ("http://e.org/alice", "http://ex.org/part", "http://e.org/data.rdf#left") in triples


def test_rdfxml_non_hierarchical_base_falls_back_to_concat():
    """urljoin can't resolve against urn:/tag: bases (returns the raw
    relative reference) — the parser must fall back to concatenation so
    subjects stay absolute (round-4 review finding)."""
    from thymeflow_back_spark.rdf.io import parse_rdfxml

    text = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://ex.org/" xml:base="urn:example:base:">
      <rdf:Description rdf:about="alice">
        <ex:name>Alice</ex:name>
      </rdf:Description>
    </rdf:RDF>"""
    [(s, p, o, *_)] = parse_rdfxml(text, "g")
    assert s == "urn:example:base:alice"


def test_rdfxml_serialize_roundtrip(spark):
    """serialize_rdfxml emits per-triple self-contained elements that
    parse_rdfxml reads back to the identical quad set (Rio rdfxml writer
    parity — the write half)."""
    from thymeflow_back_spark.rdf.io import parse_rdfxml, rdfxml_string
    from thymeflow_back_spark.rdf.model import QUAD_SCHEMA

    quads = [
        ("http://e.org/a", "http://ex.org/name", "Ada & <co>", "literal",
         "http://www.w3.org/2001/XMLSchema#string", None, "g"),
        ("http://e.org/a", "http://ex.org/label", "grüß", "literal",
         "http://www.w3.org/2001/XMLSchema#string", "de", "g"),
        ("http://e.org/a", "http://ex.org/age", "36", "literal",
         "http://www.w3.org/2001/XMLSchema#integer", None, "g"),
        ("http://e.org/a", "http://ex.org/knows", "http://e.org/b", "iri", None, None, "g"),
        ("_:x", "http://ex.org/prop#p", "_:y", "bnode", None, None, "g"),
    ]
    df = spark.createDataFrame(quads, QUAD_SCHEMA)
    text = rdfxml_string(df)
    back = parse_rdfxml(text, "g")
    norm = {
        (s, p, o, ot, None if (ot != "literal") else dt, lg)
        for s, p, o, ot, dt, lg, _ in back
    }
    want = {
        (s, p, o, ot, None if (ot != "literal") else dt, lg)
        for s, p, o, ot, dt, lg, _ in quads
    }
    assert norm == want


# --- review-fix regressions ---------------------------------------------------


def test_rdfxml_serialize_urn_predicate_roundtrips(spark):
    """urn: predicates (no '/' or '#') must split at the last ':' so the
    emitted element is a valid NCName — the store's own urn:personal:
    vocabulary was producing unparseable XML."""
    from thymeflow_back_spark.rdf.io import parse_rdfxml, rdfxml_string
    from thymeflow_back_spark.rdf.model import make_quads

    quads = make_quads(
        spark,
        [("urn:x:s", "urn:personal:sameAs", "urn:x:o", "iri", None, None, "g:x")],
    )
    xml = rdfxml_string(quads)
    back = parse_rdfxml(xml, default_graph="g:x")
    assert [(q[0], q[1], q[2]) for q in back] == [("urn:x:s", "urn:personal:sameAs", "urn:x:o")]


def test_rdf_file_base_resolution_per_document():
    """rdf:ID / relative rdf:about resolve against the document location, so
    '#me' from two different files yields two distinct absolute subjects."""
    from thymeflow_back_spark.rdf.io import rdf_file_to_quads

    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:s="http://schema.org/">'
        '<rdf:Description rdf:about="#me"><s:name>X</s:name></rdf:Description>'
        "</rdf:RDF>"
    )
    a = rdf_file_to_quads(doc.encode(), "/data/a.owl")
    b = rdf_file_to_quads(doc.encode(), "/data/b.owl")
    sa, sb = a[0][0], b[0][0]
    assert sa != sb
    assert sa.startswith("file:///data/a.owl") and sb.startswith("file:///data/b.owl")


def test_trix_bnode_named_graph():
    from thymeflow_back_spark.rdf.io import parse_trix

    text = """<?xml version="1.0"?>
    <TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
      <graph>
        <id>b1</id>
        <triple>
          <uri>urn:s</uri><uri>urn:p</uri><plainLiteral>v</plainLiteral>
        </triple>
      </graph>
    </TriX>"""
    quads = parse_trix(text, default_graph="g:d")
    assert len(quads) == 1
    assert quads[0][6] == "_:b1"


# --- RDF-JSON (rio-rdfjson parity, build.sbt:69) ------------------------------


def test_rdfjson_roundtrip(spark):
    """rdfjson_string emits the W3C RDF-JSON shape that parse_rdfjson reads
    back to the identical statement set (graphs flatten — the format is
    triple-scoped, like RDF4J's RDFJSONWriter)."""
    from thymeflow_back_spark.rdf.io import XSD_STRING, parse_rdfjson, rdfjson_string
    from thymeflow_back_spark.rdf.model import QUAD_SCHEMA

    quads = [
        ("http://e.org/a", "http://ex.org/name", 'Ada "quoted" \\ bs', "literal",
         XSD_STRING, None, "g"),
        ("http://e.org/a", "http://ex.org/label", "grüß", "literal",
         XSD_STRING, "de", "g"),
        ("http://e.org/a", "http://ex.org/age", "36", "literal",
         "http://www.w3.org/2001/XMLSchema#integer", None, "g"),
        ("http://e.org/a", "http://ex.org/knows", "http://e.org/b", "iri", None, None, "g"),
        ("_:x", "http://ex.org/p", "_:y", "bnode", None, None, "g2"),
    ]
    df = spark.createDataFrame(quads, QUAD_SCHEMA)
    text = rdfjson_string(df)
    back = parse_rdfjson(text, "g")
    norm = {(s, p, o, ot, dt if ot == "literal" else None, lg) for s, p, o, ot, dt, lg, _ in back}
    want = {(s, p, o, ot, dt if ot == "literal" else None, lg) for s, p, o, ot, dt, lg, _ in quads}
    assert norm == want


def test_rdfjson_parse_forms_and_errors():
    from pytest import raises

    from thymeflow_back_spark.rdf.io import RdfParseError, XSD_STRING, parse_rdfjson

    text = """{
      "http://e.org/s": {
        "http://e.org/p": [
          {"value": "plain", "type": "literal"},
          {"value": "b0", "type": "bnode"},
          {"value": "_:b1", "type": "bnode"}
        ]
      }
    }"""
    quads = parse_rdfjson(text, "g:d")
    assert ("http://e.org/s", "http://e.org/p", "plain", "literal", XSD_STRING, None, "g:d") in quads
    # bare bnode ids normalize to the _: prefix; prefixed ones pass through
    objs = {q[2] for q in quads if q[3] == "bnode"}
    assert objs == {"_:b0", "_:b1"}
    assert all(q[6] == "g:d" for q in quads)
    for bad in ('["not an object"]', '{"s": ["not an object"]}',
                '{"s": {"p": {"not": "array"}}}', '{"s": {"p": [{"value": "v", "type": "nope"}]}}',
                "not json at all"):
        with raises(RdfParseError):
            parse_rdfjson(bad, "g:d")


def test_rdfjson_file_dispatch_and_per_graph_serialize(spark):
    from thymeflow_back_spark.rdf.io import rdf_file_to_quads, serialize_rdfjson
    from thymeflow_back_spark.rdf.model import QUAD_SCHEMA

    doc = '{"urn:s": {"urn:p": [{"value": "v", "type": "literal"}]}}'
    quads = rdf_file_to_quads(doc.encode(), "/data/x.rj")
    assert [(q[0], q[1], q[2]) for q in quads] == [("urn:s", "urn:p", "v")]
    assert quads[0][6] != ""  # per-document graph minted from the path

    df = spark.createDataFrame(
        [("urn:s", "urn:p", "v", "literal",
          "http://www.w3.org/2001/XMLSchema#string", None, g) for g in ("g1", "g2")],
        QUAD_SCHEMA,
    )
    rows = {r.graph: r.text for r in serialize_rdfjson(df).collect()}
    assert set(rows) == {"g1", "g2"}
    import json
    assert json.loads(rows["g1"]) == {"urn:s": {"urn:p": [{"value": "v", "type": "literal"}]}}
