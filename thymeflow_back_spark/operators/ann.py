"""Approximate nearest neighbors: SRP-LSH (signed random projections).

The scale path for similarity search (operators/similarity.py is the exact
baseline): each vector gets a b-bit signature (sign of dot products with b
pseudo-random hyperplanes), signatures are banded, candidates meet only
inside band buckets, and true cosine is computed for candidates alone.
P(signature bits agree) = 1 − θ/π per bit, so near-identical vectors share
band buckets with high probability.

Hyperplanes are md5-derived (deterministic, seedless, reproducible in SQL
if ever needed as an oracle), materialized once per query as a broadcast
literal array — no shuffle for the signature pass.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import as_double_array, dot

N_PLANES = 16
BANDS = 4
ROWS_PER_BAND = N_PLANES // BANDS


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random component in [-1, 1)."""
    h = int(hashlib.md5(f"srp:{plane}:{dim}".encode()).hexdigest()[:8], 16)
    return h / 2_147_483_648.0 - 1.0


def _sql_double(v: float) -> str:
    """Exact double literal as SQL text: CAST of the repr round-trips to
    the identical IEEE value Double.parseDouble gives F.lit."""
    return f"CAST('{v!r}' AS DOUBLE)"


def srp_signature_sql(vec_sql: str, dims: int, n_planes: int = N_PLANES) -> str:
    """b-bit signature as SQL text over an ARRAY<DOUBLE> expression: bit
    p = sign(plane_p · vec).

    Emitted as one SQL string instead of a pyspark Column tree: building
    n_planes × dims literal plane components through Column operators
    costs one py4j round-trip per node (~1.65 s of pure driver time per
    build, measured at 16×64) and that price was paid on EVERY query
    construction; the string build is free and the JVM parse is
    milliseconds. Arithmetic is unchanged — same left-to-right
    aggregate/zip_with dot, same >= 0 sign rule, same bigint bit sum —
    so signatures are bit-identical. ``vec_sql`` should reference an
    already-cast ARRAY<DOUBLE> column (callers project it once) so the
    float→double cast is not re-evaluated per plane."""
    terms = []
    for p in range(n_planes):
        plane = (
            "array("
            + ",".join(_sql_double(_plane_component(p, d)) for d in range(dims))
            + ")"
        )
        dotp = (
            f"aggregate(zip_with({plane}, {vec_sql}, (x, y) -> x * y), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        terms.append(
            f"(CASE WHEN {dotp} >= 0 THEN CAST({1 << p} AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END)"
        )
    return " + ".join(terms)


def srp_candidate_pairs(
    df: DataFrame, id_col: str, vec_col: str, dims: int, n_planes: int = N_PLANES, bands: int = BANDS
) -> DataFrame:
    """Candidate pairs (a_id < b_id) sharing at least one signature band.

    The (id, sig) relation is PINNED and band rows come from ONE map-side
    explode (the simhash_pairs discipline): the former per-band union made
    the corpus-wide signature aggregate a bands-consumer subtree, and
    column pruning rewrites each self-join side's projection independently
    so ReusedExchange never fires — the 16-plane signature expression
    appeared 10× in the physical plan and the signature pass ran up to
    8× per query (4 bands × 2 sides). The pin sits on the narrow one-
    row-per-vector sigs relation; the explode + bkey arithmetic re-derives
    map-side from the cache for each side. Band/bkey values, join keys and
    the output dedup are unchanged, so the candidate set is identical."""
    from .cachereg import pin

    rows = n_planes // bands
    mask = (1 << rows) - 1
    sigs = pin(
        df.select(
            F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("__v")
        ).select("id", F.expr(srp_signature_sql("__v", dims, n_planes)).alias("sig"))
    )
    exploded = sigs.select(
        "id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).selectExpr("id", "band", f"shiftright(sig, band * {rows}) & {mask} as bkey")
    a = exploded.select(F.col("id").alias("a_id"), "band", "bkey")
    b = exploded.select(F.col("id").alias("b_id"), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )


def srp_near_dup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    threshold: float,
    n_planes: int = N_PLANES,
    bands: int = BANDS,
) -> DataFrame:
    """ANN near-dup: SRP candidates verified with exact cosine ≥ threshold."""
    from .similarity import norm

    cands = srp_candidate_pairs(df, id_col, vec_col, dims, n_planes, bands)
    vecs = df.select(
        F.col(id_col).alias("id"),
        as_double_array(F.col(vec_col)).alias("v"),
        norm(as_double_array(F.col(vec_col))).alias("n"),
    )
    av = vecs.select(F.col("id").alias("a_id"), F.col("v").alias("a_v"), F.col("n").alias("a_n"))
    bv = vecs.select(F.col("id").alias("b_id"), F.col("v").alias("b_v"), F.col("n").alias("b_n"))
    return (
        cands.join(av, "a_id")
        .join(bv, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(dot(F.col("a_v"), F.col("b_v")) / (F.col("a_n") * F.col("b_n")), 9).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
