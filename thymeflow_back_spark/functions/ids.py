"""Deterministic ID minting.

Reference: UUIDConverter mints content-derived deterministic IRIs
(utils/UUIDConverter.scala:12-40) so re-synchronizing the same artifact
yields the same resource IRI. Spark-side: name-based UUID (v5-style) from
the sha1 of a namespace+content string — pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uuid5_iri(namespace: str, content: Column, prefix: str = "urn:uuid:") -> Column:
    """Deterministic v5-style UUID IRI from (namespace, content).

    Layout follows RFC 4122 name-based UUIDs (sha1, version nibble 5) built
    from hex slices — stable across engines and runs.
    """
    h = F.sha1(F.concat(F.lit(namespace), F.lit(":"), content))
    return F.concat(
        F.lit(prefix),
        F.substring(h, 1, 8),
        F.lit("-"),
        F.substring(h, 9, 4),
        F.lit("-5"),
        F.substring(h, 14, 3),
        F.lit("-"),
        F.substring(h, 17, 4),
        F.lit("-"),
        F.substring(h, 21, 12),
    )
