"""Enrichment pipeline + streaming tests: IFP inference across documents,
RDFS forward chaining, and the foreachBatch streaming drive."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from thymeflow_back_spark.enrichers import EnrichmentPipeline, ifp_enricher, rdfs_enricher
from thymeflow_back_spark.enrichers.ifp import OUTPUT_GRAPH as IFP_GRAPH
from thymeflow_back_spark.enrichers.rdfs import SUB_CLASS_OF, SUB_PROPERTY_OF, DOMAIN
from thymeflow_back_spark.rdf import vocab
from thymeflow_back_spark.rdf.model import QUAD_SCHEMA, make_quads
from thymeflow_back_spark.rdf.store import StatementStore
from thymeflow_back_spark.streaming import quad_stream, run_pipeline_stream


def iri_q(s, p, o, g):
    return (s, p, o, "iri", None, None, g)


def test_ifp_across_documents(spark):
    store = StatementStore(make_quads(spark, []))
    pipe = EnrichmentPipeline(store, [ifp_enricher])
    doc1 = make_quads(spark, [iri_q("agent:a", vocab.EMAIL, "mailto:x@y.z", "g:doc1")])
    pipe.ingest_document("g:doc1", doc1)
    # same email in a second document → sameAs both ways in the IFP graph
    doc2 = make_quads(spark, [iri_q("agent:b", vocab.EMAIL, "mailto:x@y.z", "g:doc2")])
    diff = pipe.ingest_document("g:doc2", doc2)
    inferred = {
        (r.subject, r.object_value)
        for r in pipe.store.quads.filter(F.col("graph") == IFP_GRAPH).collect()
    }
    assert ("agent:a", "agent:b") in inferred and ("agent:b", "agent:a") in inferred
    assert diff.added.filter(F.col("predicate") == vocab.SAME_AS).count() == 2


def test_ifp_respects_differentfrom(spark):
    base = make_quads(
        spark,
        [
            iri_q("agent:a", vocab.EMAIL, "mailto:x@y.z", "g:doc1"),
            iri_q("agent:a", vocab.DIFFERENT_FROM, "agent:b", "g:user"),
        ],
    )
    pipe = EnrichmentPipeline(StatementStore(base), [ifp_enricher])
    doc2 = make_quads(spark, [iri_q("agent:b", vocab.EMAIL, "mailto:x@y.z", "g:doc2")])
    pipe.ingest_document("g:doc2", doc2)
    assert pipe.store.quads.filter(F.col("predicate") == vocab.SAME_AS).count() == 0


def test_rdfs_forward_chaining(spark):
    ontology = make_quads(
        spark,
        [
            iri_q("c:Person", SUB_CLASS_OF, "c:Agent", "g:ontology"),
            iri_q("c:Agent", SUB_CLASS_OF, "c:Thing", "g:ontology"),
            iri_q("p:givenName", SUB_PROPERTY_OF, "p:name", "g:ontology"),
            iri_q("p:name", DOMAIN, "c:Named", "g:ontology"),
        ],
    )
    pipe = EnrichmentPipeline(StatementStore(ontology), [rdfs_enricher])
    doc = make_quads(
        spark,
        [
            iri_q("x", vocab.RDF_TYPE, "c:Person", "g:doc"),
            ("x", "p:givenName", "Ada", "literal", None, None, "g:doc"),
        ],
    )
    pipe.ingest_document("g:doc", doc)
    got = {
        (r.subject, r.predicate, r.object_value)
        for r in pipe.store.quads.filter(F.col("graph") == "urn:graph:rdfsInferencer").collect()
    }
    assert ("x", vocab.RDF_TYPE, "c:Agent") in got  # subclass
    assert ("x", vocab.RDF_TYPE, "c:Thing") in got  # transitive subclass
    assert ("x", "p:name", "Ada") in got  # subproperty
    assert ("x", vocab.RDF_TYPE, "c:Named") in got  # domain of inferred prop


def test_streaming_pipeline_drive(spark, tmp_path):
    staging = tmp_path / "staging"
    checkpoint = tmp_path / "ckpt"
    staging.mkdir()
    doc = make_quads(spark, [iri_q("agent:a", vocab.EMAIL, "mailto:s@t.u", "g:s1")])
    doc.write.mode("append").parquet(str(staging))
    doc2 = make_quads(spark, [iri_q("agent:b", vocab.EMAIL, "mailto:s@t.u", "g:s2")])
    doc2.write.mode("append").parquet(str(staging))

    pipe = EnrichmentPipeline(StatementStore(make_quads(spark, [])), [ifp_enricher])
    query = run_pipeline_stream(
        pipe, quad_stream(spark, str(staging)), str(checkpoint), trigger={"availableNow": True}
    )
    query.awaitTermination(120)
    sameas = pipe.store.quads.filter(F.col("predicate") == vocab.SAME_AS).count()
    assert sameas == 2
