"""Deterministic Bloom-filter semi-join reduction.

The 100 TB pattern: a fact-table shuffle join against a filtered dimension
moves the whole fact table even when only a sliver of it will survive the
join. A Bloom filter built on the dimension keys and broadcast to the fact
scan drops most non-matching rows BEFORE the shuffle — Spark's own runtime
row-group filtering does this opportunistically, but its filter is
engine-private and nondeterministic across runs; this one is a pure
function of the key set (md5-derived hash family), so the reduced row set
is reproducible anywhere, including the SQL oracle.

Layout: m = 1024 words x 63 usable bits (the sign bit stays clear so the
whole filter lives in BIGINTs on any engine); k = 4 hash functions
``h32("bf<j>:" || key)``; word = (h DIV 63) % 1024, bit = h % 63. Build is
one groupBy(word) bit_or aggregate over k rows per key — the filter is
~8 KB however large the dimension. Probe explodes each fact row into its
k (word, mask) probes, joins the BROADCAST word table, and keeps rows
whose k probes all hit. False positives pass (they are then removed by
the real join — standard semi-join reduction), false negatives never
happen, and both engines agree on the exact surviving set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import h32

BLOOM_WORDS = 1024
BLOOM_BITS = 63  # per word; bit 63 (sign) never set
BLOOM_K = 4


def _probes(key: Column) -> list[tuple[Column, Column]]:
    """The k (word, mask) addresses of ``key``."""
    out = []
    for j in range(BLOOM_K):
        h = h32(F.concat(F.lit(f"bf{j}:"), key.cast("string")))
        word = ((h / BLOOM_BITS).cast("bigint") % BLOOM_WORDS).alias("word")
        mask = F.pow(F.lit(2.0), (h % BLOOM_BITS).cast("int")).cast("bigint").alias("mask")
        out.append((word, mask))
    return out


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Bloom filter of the key column: rows (word, bits) — <= 1024 of them."""
    k = F.col(key_col)
    probes = F.array(
        *[F.struct(w.alias("word"), m.alias("mask")) for w, m in _probes(k)]
    )
    return (
        keys.select(F.explode(probes).alias("p"))
        .groupBy(F.col("p.word").alias("word"))
        .agg(F.expr("bit_or(p.mask)").alias("bits"))
    )


def bloom_probe(facts: DataFrame, key_col: str, bloom: DataFrame) -> DataFrame:
    """Rows of ``facts`` whose key passes the filter (no false negatives).

    k chained BROADCAST joins against the <= 1024-row word table — the
    fact side streams through map-side hash lookups with ZERO shuffle and
    row multiplicity preserved (an explode/regroup probe would shuffle
    the whole fact table, which is exactly what the filter exists to
    avoid). A missing word row means no key ever set a bit there, so the
    probe bit is 0 and the row drops.
    """
    out = facts
    for j, (w, m) in enumerate(_probes(F.col(key_col))):
        b = bloom.select(F.col("word").alias(f"__w{j}"), F.col("bits").alias(f"__b{j}"))
        out = (
            out.withColumn(f"__word{j}", w)
            .withColumn(f"__mask{j}", m)
            .join(F.broadcast(b), F.col(f"__word{j}") == F.col(f"__w{j}"), "left")
            .filter(
                F.coalesce(F.col(f"__b{j}"), F.lit(0)).bitwiseAND(F.col(f"__mask{j}"))
                != 0
            )
            .drop(f"__word{j}", f"__mask{j}", f"__w{j}", f"__b{j}")
        )
    return out
