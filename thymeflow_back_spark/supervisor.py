"""Supervisor: service-account-source registry + synchronizer orchestration.

Parity with reference Supervisor.scala:42-116 and the §1.4 metadata model:

- ``add_service_account`` commits the Service → Account → Source tree as
  quads in ``personal:serviceGraph`` (Supervisor.scala:63-94) and hands
  each source a deterministic IRI.
- ``sync_source`` / ``sync_all`` drive the registered synchronizers
  (snapshot state kept per source), link every delivered document graph to
  its source with ``personal:documentOf``
  (FileSynchronizer.scala:263-272, EmailSynchronizer.scala:644-659), and
  run the enricher chain over each sync's effective diff — the
  ``source → repositoryInsertion → enricher-flow`` pipeline of
  Pipeline.scala:37-42, with Spark jobs in place of Akka stages.

The metadata tree is tiny (graphs are data-scale, the tree is
accounts-scale), so it rides in the same quads table under the reserved
graph — queries against it are ordinary pattern scans.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .enrichers.pipeline import Enricher
from .rdf import vocab
from .rdf.model import QUAD_SCHEMA
from .rdf.store import Diff, StatementStore
from .sources.common import mint


def _meta_quads(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(
        [(s, p, o, otype, None, None, vocab.SERVICE_GRAPH) for s, p, o, otype in rows],
        QUAD_SCHEMA,
    )


@dataclass
class _Source:
    iri: str
    synchronizer: object
    snapshot: DataFrame | None = None


@dataclass
class Supervisor:
    spark: SparkSession
    store: StatementStore
    enrichers: list = field(default_factory=list)

    def __post_init__(self):
        self._sources: dict[str, _Source] = {}

    # -- registration (AddServiceAccount, Supervisor.scala:111-116)

    def add_service_account(
        self, service_name: str, account_name: str, sources: dict[str, object]
    ) -> dict[str, str]:
        """Register an account and its synchronizers; commit the metadata
        tree; return {source_name: source_iri}."""
        service = mint("service", service_name)
        account = mint("account", f"{service_name}:{account_name}")
        rows = [
            (service, vocab.RDF_TYPE, vocab.SERVICE, "iri"),
            (service, vocab.NAME, service_name, "literal"),
            (account, vocab.RDF_TYPE, vocab.SERVICE_ACCOUNT, "iri"),
            (account, vocab.NAME, account_name, "literal"),
            (account, vocab.ACCOUNT_OF, service, "iri"),
        ]
        iris: dict[str, str] = {}
        for name, synchronizer in sources.items():
            source = mint("source", f"{service_name}:{account_name}:{name}")
            iris[name] = source
            rows += [
                (source, vocab.RDF_TYPE, vocab.SERVICE_SOURCE, "iri"),
                (source, vocab.NAME, name, "literal"),
                (source, vocab.SOURCE_OF, account, "iri"),
            ]
            self._sources[source] = _Source(iri=source, synchronizer=synchronizer)
        self.store = self.store.apply_diff(
            Diff(added=_meta_quads(self.spark, rows), removed=self.store.quads.limit(0))
        ).materialize()
        return iris

    # -- synchronization

    def _document_of(self, diff: Diff, source_iri: str) -> Diff:
        """personal:documentOf metadata for every document graph the sync
        delivered (added) and metadata retraction for graphs it emptied."""
        added_g = diff.added.select("graph").distinct()
        meta_added = added_g.select(
            F.col("graph").alias("subject"),
            F.lit(vocab.DOCUMENT_OF).alias("predicate"),
            F.lit(source_iri).alias("object_value"),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit(vocab.SERVICE_GRAPH).alias("graph"),
        )
        # graphs that lost every quad (document removed by the source):
        # retract their documentOf link
        gone = (
            diff.removed.select("graph")
            .distinct()
            .join(self.store.quads.select("graph").distinct(), "graph", "left_anti")
        )
        meta_removed = gone.select(
            F.col("graph").alias("subject"),
            F.lit(vocab.DOCUMENT_OF).alias("predicate"),
            F.lit(source_iri).alias("object_value"),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
            F.lit(vocab.SERVICE_GRAPH).alias("graph"),
        )
        return Diff(added=meta_added, removed=meta_removed)

    def sync_source(self, source_iri: str) -> Diff:
        """One incremental pass for one source: synchronize, link document
        metadata, then run the enricher chain over the effective diff."""
        reg = self._sources[source_iri]
        sync = reg.synchronizer
        if hasattr(sync, "current_snapshot"):  # snapshot-CDC synchronizers
            previous = (
                reg.snapshot
                if reg.snapshot is not None
                else sync.current_snapshot().limit(0)
            )
            self.store, diff, reg.snapshot = sync.sync(self.store, previous)
        else:  # one-document synchronizers (Facebook)
            self.store, diff = sync.sync(self.store)

        meta = self._document_of(diff, source_iri)
        self.store = self.store.apply_diff(meta).materialize()
        diff = diff.union(meta)

        for enricher in self.enrichers:
            extra = enricher(self.store, diff)
            self.store = self.store.apply_diff(extra).materialize()
            diff = diff.union(extra)
        return diff

    def sync_all(self) -> dict[str, Diff]:
        return {iri: self.sync_source(iri) for iri in list(self._sources)}

    # -- metadata queries (DataServicesService.scala:25-49 shape)

    def documents_per_source(self) -> DataFrame:
        """(source, source_name, n_documents) from the metadata tree."""
        meta = self.store.quads.filter(F.col("graph") == vocab.SERVICE_GRAPH)
        docs = meta.filter(F.col("predicate") == vocab.DOCUMENT_OF).select(
            F.col("subject").alias("document"), F.col("object_value").alias("source")
        )
        names = meta.filter(F.col("predicate") == vocab.NAME).select(
            F.col("subject").alias("source"), F.col("object_value").alias("source_name")
        )
        return (
            docs.groupBy("source")
            .agg(F.count("*").alias("n_documents"))
            .join(F.broadcast(names), "source", "left")
            .select("source", "source_name", "n_documents")
        )
