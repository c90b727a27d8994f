"""Inverse-functional-property identity inference.

Parity with reference InverseFunctionalPropertyInferencer.scala:37-53:
agents sharing an email/telephone/url OBJECT value are inferred sameAs
(symmetric pairs), writing into the enricher's own graph. Incremental
discipline: join DIFF-side subjects against the whole store — never
store×store — so each batch's cost is proportional to the batch.
An asserted differentFrom suppresses the inference (the reference's
isDifferentFrom guard, AbstractEnricher.scala:17-21).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..rdf import vocab
from ..rdf.model import QUAD_COLUMNS
from ..rdf.store import Diff, StatementStore

IFP_PREDICATES = (vocab.EMAIL, vocab.TELEPHONE, vocab.URL)
OUTPUT_GRAPH = "urn:graph:ifpInferencer"


def _sameas_quads(pairs):
    """(a, b) pairs → symmetric sameAs quads in the enricher graph."""
    fwd = pairs.select(
        F.col("a").alias("subject"),
        F.lit(vocab.SAME_AS).alias("predicate"),
        F.col("b").alias("object_value"),
    )
    bwd = pairs.select(
        F.col("b").alias("subject"),
        F.lit(vocab.SAME_AS).alias("predicate"),
        F.col("a").alias("object_value"),
    )
    return (
        fwd.unionByName(bwd)
        .withColumn("object_type", F.lit("iri"))
        .withColumn("object_datatype", F.lit(None).cast("string"))
        .withColumn("object_lang", F.lit(None).cast("string"))
        .withColumn("graph", F.lit(OUTPUT_GRAPH))
        .select(*QUAD_COLUMNS)
        .dropDuplicates(list(QUAD_COLUMNS))
    )


def ifp_enricher(store: StatementStore, diff: Diff) -> Diff:
    added_ifp = diff.added.filter(
        (F.col("predicate").isin(*IFP_PREDICATES)) & (F.col("object_type") == "iri")
    ).select("subject", "predicate", "object_value")
    store_ifp = store.quads.filter(
        (F.col("predicate").isin(*IFP_PREDICATES)) & (F.col("object_type") == "iri")
    ).select("subject", "predicate", "object_value")

    pairs = (
        added_ifp.alias("d")
        .join(
            store_ifp.alias("s"),
            (F.col("d.predicate") == F.col("s.predicate"))
            & (F.col("d.object_value") == F.col("s.object_value"))
            & (F.col("d.subject") != F.col("s.subject")),
        )
        .select(
            F.least(F.col("d.subject"), F.col("s.subject")).alias("a"),
            F.greatest(F.col("d.subject"), F.col("s.subject")).alias("b"),
        )
        .dropDuplicates(["a", "b"])
    )
    # differentFrom suppression (both orientations collapse to (least, greatest))
    different = store.quads.filter(F.col("predicate") == vocab.DIFFERENT_FROM).select(
        F.least(F.col("subject"), F.col("object_value")).alias("a"),
        F.greatest(F.col("subject"), F.col("object_value")).alias("b"),
    )
    pairs = pairs.join(different, on=["a", "b"], how="left_anti")

    added = _sameas_quads(pairs)
    # only new inferences (not already in the store)
    added = added.join(
        store.quads.select(*QUAD_COLUMNS), on=list(QUAD_COLUMNS), how="left_anti"
    )
    removed = store.quads.filter(F.lit(False))  # IFP inferences are monotone per batch
    return Diff(added, removed)
