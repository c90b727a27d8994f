"""EnrichmentPipeline: document ingestion → ordered enricher chain.

Parity with reference Pipeline.scala:37-42 + Thymeflow.scala:56-63: each
ingested document produces a diff; enrichers run in order, each seeing the
store state left by its predecessors; their inferences are applied to the
store and appended to the flowing diff. ``ingest_quads`` accepts a batch of
mixed-graph quads (the foreachBatch entry point for streaming).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rdf.store import Diff, StatementStore

Enricher = Callable[[StatementStore, Diff], Diff]


class EnrichmentPipeline:
    def __init__(self, store: StatementStore, enrichers: Sequence[Enricher] = ()):
        self.store = store
        self.enrichers = list(enrichers)

    def ingest_document(self, graph: str, statements: DataFrame) -> Diff:
        """Replace one document graph, run the enricher chain, return the
        total effective diff."""
        return self.ingest_quads(
            statements.withColumn("graph", F.lit(graph)), graphs=[graph]
        )

    def ingest_quads(self, quads: DataFrame, graphs: list[str] | None = None) -> Diff:
        """Batch entry point: replace ALL document graphs present in the
        batch with one vectorized set-difference (StatementStore.
        add_documents), then run the enricher chain ONCE over the combined
        diff. A micro-batch of n re-delivered documents costs O(1) Spark
        job chains, not O(n) — this is the foreachBatch entry point for
        Structured Streaming."""
        store, diff = self.store.add_documents(quads, graphs=graphs)
        store = store.materialize()
        for enricher in self.enrichers:
            extra = enricher(store, diff)
            store = store.apply_diff(extra).materialize()
            diff = diff.union(extra)
        self.store = store
        return diff
