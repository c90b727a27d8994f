"""Sources: file-system scan + format converters producing quad DataFrames.

The reference's synchronizer/converter registry (SURVEY.md §2.1) maps to:
``scan_files`` (binaryFile scan + extension dispatch, zip expansion) feeding
per-format converters (email/vCard/iCal/location-history), each a pure
``bytes → quad rows`` function executed inside mapInPandas. Every converted
artifact becomes one named graph (document semantics), so re-ingestion is an
idempotent graph replacement via StatementStore.add_document.
"""

from .files import scan_files, convert_to_quads

__all__ = ["scan_files", "convert_to_quads"]
