"""Enrichers: incremental inference stages over statement diffs.

Reference architecture (SURVEY.md §3.2): each enricher consumes the
StatementSetDiff flowing out of document ingestion, reads the store, and
writes its inferences into its own named graph. Here an enricher is a pure
function ``(store, diff) -> Diff`` — the returned diff is applied to the
store by the pipeline and appended to the flowing diff, preserving the
reference's stage-chaining semantics with exactly-once application.
"""

from .ifp import ifp_enricher
from .rdfs import rdfs_enricher
from .pipeline import EnrichmentPipeline

__all__ = ["ifp_enricher", "rdfs_enricher", "EnrichmentPipeline"]
