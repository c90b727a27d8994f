"""Johnson-Lindenstrauss sign projection — DIMENSION reduction for ANN.

The quantization ladder (operators/quantize.py SQ8, pq.py, ivfpq.py)
shrinks PRECISION; the other axis is shrinking DIMENSION. A random ±1
sign matrix is the classic JL construction (Achlioptas 2003, "Database-
friendly random projections"): p_j = Σ_i v_i · s(j,i) with s ∈ {±1}
preserves pairwise inner products in expectation with error O(1/√d_out),
so a 64-dim embedding searched at 16 dims does 4× less arithmetic and
4× less scan per candidate — the cheap pre-filter stage in front of an
exact (or PQ) rerank.

Determinism discipline (what makes this oracle-checkable): the sign
matrix is CONTENT-ADDRESSED — s(j,i) = +1 iff the first hex digit of
md5("<salt>:<j>:<i>") is 0-7 — no RNG state, any engine (or any Python
process) derives the identical matrix. The matrix is computed ONCE at
plan-build time and embedded as literals: md5 inside the row expression
would hash d_in × d_out tiny strings PER ROW, a per-row cost that scales
with the corpus for a matrix that never changes. Each output coordinate
is the ordered left-to-right fold the repo uses for every dot product
(similarity.dot / DuckDB list_dot_product), giving bit-identical
projections cross-engine.

Scale shape: the projection is a pure per-row codegen expression over
~d_in·d_out literal coefficients (16×64 doubles ≈ 1 KB of plan) — no
shuffle, no Python, no broadcast.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import as_double_array, dot


def jl_sign(salt: str, j: int, i: int) -> float:
    """±1.0 from the content-addressed md5 coin for output dim j, input
    dim i — identical to the SQL `md5('<salt>:<j>:<i>')` derivation."""
    coin = hashlib.md5(f"{salt}:{j}:{i}".encode()).hexdigest()[0]
    return 1.0 if coin <= "7" else -1.0


def jl_sign_matrix(salt: str, d_in: int, d_out: int) -> list[list[float]]:
    """d_out rows of d_in ±1 coefficients."""
    return [[jl_sign(salt, j, i) for i in range(d_in)] for j in range(d_out)]


def jl_project(
    df: DataFrame,
    vec_col: str,
    d_in: int,
    d_out: int,
    out_col: str = "vec_jl",
    salt: str = "jl",
) -> DataFrame:
    """Append the d_out-dim sign projection of `vec_col` (array<double>).

    p[j] = ordered-fold dot(v, signs_j) — one codegen'd expression per
    row, zero shuffles. `d_in` must equal the actual array length: the
    zip_with inside the fold NULL-pads a shorter side, which would
    silently propagate NULL into the projection — so the expression
    FAILS FAST (raise_error) on any row whose vector length differs,
    surfacing a dimension mismatch as an error instead of corrupting
    downstream recall with NULL projections."""
    from .similarity import sql_double_array_2d

    signs = jl_sign_matrix(salt, d_in, d_out)
    v = as_double_array(F.col(vec_col))
    # the sign matrix rides as ONE 2-d literal (single F.expr parse, ~10
    # py4j calls) instead of d_out×d_in F.lit nodes (~1.5 s of driver
    # time per construction at 16×64); each projection is the same
    # ordered dot(v, signs_j) fold, so values are bit-identical
    proj = F.transform(
        F.expr(sql_double_array_2d(signs)), lambda row: dot(v, row)
    )
    guarded = F.when(F.size(F.col(vec_col)) == F.lit(d_in), proj).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"jl_project: {vec_col} has length "),
                F.size(F.col(vec_col)).cast("string"),
                F.lit(f", expected d_in={d_in}"),
            )
        )
    )
    return df.withColumn(out_col, guarded)


def jl_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    d_in: int,
    d_out: int,
    shortlist: int,
    k_results: int,
    salt: str = "jl",
) -> DataFrame:
    """JL shortlist + EXACT rerank: (q_id, vec_id, score, rank).

    The two-stage serving pattern with the DIMENSION rung as stage one
    (the precision-rung sibling is operators/pq.pq_rerank_topk): cosine
    top-``shortlist`` in the d_out-dim projected space — d_in/d_out times
    less arithmetic and scan per candidate — then only the shortlisted
    rows read their raw d_in-dim vectors for an exact cosine top-k.

    Scale shape: the projection is per-row codegen (zero shuffles); the
    shortlist pass is the broadcast-probe streaming scan of cosine_topk;
    the rerank side is queries x shortlist rows — BROADCAST against the
    corpus, so raw vectors are touched by ONE streaming scan and only
    shortlisted rows do a d_in-dim dot.
    """
    from pyspark.sql.window import Window

    from .similarity import SCORE_DECIMALS, cosine_topk, norm

    if shortlist < k_results:
        raise ValueError(
            f"shortlist ({shortlist}) must be >= k_results ({k_results}): "
            "the rerank can only reorder candidates the JL pass surfaced"
        )
    pc = jl_project(corpus, vec_col, d_in, d_out, salt=salt).select(
        F.col(id_col), F.col("vec_jl").alias("__pv")
    )
    pq = jl_project(queries, vec_col, d_in, d_out, salt=salt).select(
        F.col(id_col), F.col("vec_jl").alias("__pv")
    )
    short = cosine_topk(pc, pq, id_col, "__pv", shortlist).select("q_id", "c_id")
    qv = queries.select(
        F.col(id_col).alias("q_id"), as_double_array(F.col(vec_col)).alias("q_vec")
    )
    pairs = short.join(F.broadcast(qv), "q_id").withColumnRenamed("c_id", "vec_id")
    cv = corpus.select(
        F.col(id_col).alias("vec_id"), as_double_array(F.col(vec_col)).alias("c_vec")
    )
    ex = cv.join(F.broadcast(pairs), "vec_id").select(
        "q_id",
        "vec_id",
        F.round(
            dot(F.col("q_vec"), F.col("c_vec"))
            / (norm(F.col("q_vec")) * norm(F.col("c_vec"))),
            SCORE_DECIMALS,
        ).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return ex.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k_results
    )
