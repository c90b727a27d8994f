"""IVF-PQ: product-quantized residuals over the IVF coarse quantizer.

The canonical billion-scale ANN layout (FAISS IVFPQ; Jégou et al. 2011
§IV): a coarse quantizer routes each vector to a cell, and PQ encodes the
RESIDUAL v - centroid(cell) — residual magnitudes are much smaller than
raw vectors, so the same code budget quantizes far more precisely. At
100 TB the index is (cell, m codes) per vector — bytes, not KBs — cells
partition-prune the probe (operators/ivf.ivf_write_index's layout), and
candidates cost m table lookups each, never a d-dim dot.

Composition of proven parts: the coarse step IS operators/ivf.py
(content-addressed seeds + exact-sum Lloyd refinement + broadcast-matrix
assignment); the code step IS operators/pq.py over residual vectors; ADC
search is pq's broadcast lookup-join shape with the table keyed by
(query, PROBED CELL) since each cell has its own residual frame.

Determinism note — why the residual codebooks take ZERO Lloyd rounds:
IVF's Lloyd refinement is exact because raw float32-origin values sum
exactly in any order (24-bit mantissas, bounded exponents). Residuals
subtract a Lloyd MEAN (full 53-bit mantissa), so residual values occupy
the whole double grid and their sums become order-dependent — a Lloyd
round over residuals would produce engine- and partitioning-dependent
codebooks. Content-addressed seed residuals (the k smallest-md5(id)
vectors' residuals, sliced per subspace) involve no aggregation at all,
so the entire index is a pure function of the data. Every remaining
arithmetic step is single-op IEEE (subtract, product, chained sums), and
ADC sums are chained in subspace order — bit-reproducible anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .ivf import _centroid_lit, ivf_assign, refine_centroids, seed_centroids
from .pq import _cc, _dot_lit, _scores_expr, _self_dot, _sub, pq_codebooks
from .similarity import SCORE_DECIMALS, as_double_array


def _residual(vec: Column, cents: list[list[float]], cell: Column) -> Column:
    """v - centroid[cell], elementwise (exact single-op IEEE subtracts)."""
    cents_lit = F.array(*[_centroid_lit(c) for c in cents])
    return F.zip_with(vec, F.element_at(cents_lit, cell + 1), lambda a, b: a - b)


def ivfpq_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    m: int,
    k: int,
    refine_iters: int = 1,
):
    """(cents, books, codes): the coarse centroids, the residual codebooks
    (seed-only — see module note), and the encoded corpus
    (c_id, cell, code0..code{m-1})."""
    cents = seed_centroids(corpus, id_col, vec_col, n_cells)
    if refine_iters:
        cents = refine_centroids(corpus, id_col, vec_col, cents, refine_iters)
    inv = ivf_assign(corpus, id_col, vec_col, cents)  # (c_id, cell, c_vec)
    resid = inv.select(
        "c_id", "cell", _residual(F.col("c_vec"), cents, F.col("cell")).alias("r")
    )
    books = pq_codebooks(resid, "c_id", "r", m=m, k=k, iterations=0)
    sub_d = len(books[0][0])
    hoisted = resid.select(
        "c_id",
        "cell",
        *[_sub(F.col("r"), j, sub_d).alias(f"x{j}") for j in range(m)],
    ).select(
        "c_id",
        "cell",
        *[F.col(f"x{j}") for j in range(m)],
        *[_self_dot(F.col(f"x{j}"), sub_d).alias(f"xx{j}") for j in range(m)],
    )
    scored = hoisted.select(
        "c_id", "cell", *[_scores_expr(j, books[j]).alias(f"scores{j}") for j in range(m)]
    )
    codes = scored.select(
        "c_id",
        "cell",
        *[
            (F.array_position(F.col(f"scores{j}"), F.array_min(F.col(f"scores{j}"))) - 1)
            .cast("int")
            .alias(f"code{j}")
            for j in range(m)
        ],
    )
    return cents, books, codes


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k_results: int,
    n_cells: int,
    n_probe: int,
    m: int,
    k: int,
    refine_iters: int = 1,
) -> DataFrame:
    """Per-query ADC top-k over the probed cells: (q_id, c_id, adc_dist, rank).

    Probe rule matches ivf_topk (n_probe cells by centroid dot, cell index
    on ties). The ADC table is (q_id, cell, code, term) per subspace —
    queries × n_probe × k rows, broadcast; candidates are the probed
    cells' code rows joining m tables map-side with zero shuffle, then a
    per-query top-k window. Self-matches are excluded (ivf_topk parity).
    """
    cents, books, codes = ivfpq_index(
        corpus, id_col, vec_col, n_cells, m, k, refine_iters
    )
    sub_d = len(books[0][0])
    qv = queries.select(
        F.col(id_col).alias("q_id"), as_double_array(F.col(vec_col)).alias("q_v")
    )
    cell_scores = F.array(
        *[
            _dot_lit(F.col("q_v"), c)
            for c in cents
        ]
    )
    wprobe = Window.partitionBy("q_id").orderBy(F.desc("cscore"), F.asc("cell"))
    probe = (
        qv.select(
            "q_id",
            "q_v",
            F.posexplode(cell_scores).alias("cell", "cscore"),
        )
        .withColumn("prn", F.row_number().over(wprobe))
        .filter(F.col("prn") <= n_probe)
        .select("q_id", "q_v", "cell")
    )
    qres = probe.select(
        "q_id", "cell", _residual(F.col("q_v"), cents, F.col("cell")).alias("r")
    )
    qh = qres.select(
        "q_id",
        "cell",
        *[_sub(F.col("r"), j, sub_d).alias(f"x{j}") for j in range(m)],
    ).select(
        "q_id",
        "cell",
        *[F.col(f"x{j}") for j in range(m)],
        *[_self_dot(F.col(f"x{j}"), sub_d).alias(f"xx{j}") for j in range(m)],
    )
    pairs = codes.withColumnRenamed("c_id", "vec_id").join(
        F.broadcast(probe.select("q_id", "cell")), "cell"
    ).filter(F.col("vec_id") != F.col("q_id"))
    for j in range(m):
        qx, qxx = F.col(f"x{j}"), F.col(f"xx{j}")
        entries = F.array(
            *[
                F.struct(
                    F.lit(code).alias("code"),
                    ((qxx + F.lit(_cc(c))) - 2 * _dot_lit(qx, c)).alias("term"),
                )
                for code, c in enumerate(books[j])
            ]
        )
        dtab = qh.select("q_id", "cell", F.explode(entries).alias("e")).select(
            "q_id",
            "cell",
            F.col("e.code").alias(f"code{j}"),
            F.col("e.term").alias(f"__t{j}"),
        )
        pairs = pairs.join(F.broadcast(dtab), ["q_id", "cell", f"code{j}"])
    adc = F.col("__t0")
    for j in range(1, m):
        adc = adc + F.col(f"__t{j}")
    w = Window.partitionBy("q_id").orderBy("adc_dist", "vec_id")
    return (
        pairs.withColumn("adc_dist", F.round(adc, SCORE_DECIMALS))
        .select("q_id", "vec_id", "cell", "adc_dist")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_results)
    )
