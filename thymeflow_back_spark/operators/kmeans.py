"""Distributed Lloyd k-means with EXACT integer arithmetic.

Clustering-based curation (cluster-balanced sampling, SemDeDup-style
pruning, diversity audits) needs k-means over the embedding column — but a
naive float implementation is not reproducible across engines or even
across partitionings (float sums depend on order). This one is bit-exact
by construction:

- vectors are quantized once: x = floor(v * scale) as BIGINT (floor of a
  double is deterministic; the quantization is part of the operator's
  definition, not an approximation of it),
- a centroid is carried as its exact integer per-dim SUM s and member
  count n (never the float mean),
- the distance key compares ||x - s/n||^2 via the exact integer
  A = sum_d (n*x_d - s_d)^2 divided by n^2 ONCE in double — an exact
  BIGINT cast to double then divided, which IEEE-rounds identically in
  every engine. Ties break toward the smaller cell id.

Seeds are content-addressed (first k vector ids by md5, the IVF idiom at
operators/ivf.py), so the whole trajectory is a pure function of the data.

Scale audit (documented bound): |x| <= scale * |v|_max, and the integer
A-term needs (n * |x| + |s|)^2 * d < 2^63 — at scale 1e4, |v| < 0.6,
d = 64 that holds to n ~ 2e4 members per cluster; raise/lower ``scale``
to trade precision against headroom. Per-round driver state is the k x d
centroid table (bounded, like the BPE/k-center round loops); since that
table lives on the driver anyway, each round inlines it as LITERALS —
assignment is a zero-join codegen projection and the centroid update one
map-side-combined k-row aggregate, so the corpus is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _quantized(df: DataFrame, id_col: str, vec_col: str, scale: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__vid"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda v: F.floor(v * scale).cast("long"),
        ).alias("__xi"),
    )


def _seed_cells(x: DataFrame, k: int) -> list[tuple[int, int, list[int]]]:
    """First k vectors by md5(id) as (cell, n=1, sums) centroid seeds.
    orderBy + limit is a TakeOrdered (per-partition partial top-k merged
    on the driver) — NOT a global single-partition window, so seeding
    scales to any corpus size."""
    rows = (
        x.select(F.md5(F.col("__vid").cast("string")).alias("__h"), "__xi")
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    return [
        (cell, 1, [int(v) for v in r["__xi"]]) for cell, r in enumerate(rows)
    ]


def _sql_long_array(vals: list[int]) -> str:
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def _assign_cell_sql(cents: list[tuple[int, int, list[int]]]) -> str:
    """SQL text: nearest-centroid cell id for the ``__xi`` array.

    The centroid stats live on the DRIVER between rounds, so instead of the
    former broadcast (cell, n, dim, s) table — which joined every exploded
    (vec, dim) row against all k cells, a |vecs|·d·k-row shuffle-aggregate
    per round (guide §2.3/§2.4) — the k centroids are inlined as LITERALS
    and the whole argmin evaluates inside whole-stage codegen with ZERO
    joins and ZERO extra shuffles. Arithmetic is bit-identical to the
    join formulation: A_j = Σ_d (n_j·x_d − s_jd)² in BIGINT (integer sums
    are order-free), f_j = cast(A_j as double) / (n_j²) with n_j² the same
    BIGINT product, and the (f, cell) struct min keeps the tie-break
    toward the smaller cell id.

    Emitted as ONE SQL string parsed JVM-side: building the same tree out
    of pyspark Column operators costs thousands of py4j round-trips
    (~2 s of pure driver time per build, measured) — the string build is
    free and the ANTLR parse is milliseconds."""
    structs = []
    for cell, n, svec in cents:
        n, n2 = int(n), int(n) * int(n)
        a = (
            f"aggregate(zip_with(__xi, {_sql_long_array(svec)}, "
            f"(xi, si) -> ({n}L * xi - si) * ({n}L * xi - si)), "
            "0L, (acc, t) -> acc + t)"
        )
        structs.append(
            f"named_struct('f', CAST({a} AS DOUBLE) / {n2}L, 'cell', {cell})"
        )
    return f"array_min(array({','.join(structs)})).cell"


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
    scale: int = 10_000,
) -> tuple[DataFrame, list[tuple[int, int, list[int]]]]:
    """Run ``iters`` assignment rounds of exact-integer Lloyd.

    Returns (assignment DataFrame with columns [id_col, cell], final
    centroid stats [(cell, n, s_dims)] AFTER a last mean update over the
    returned assignment). Each round collects only the k x d centroid
    table to the driver (bounded state); assignments stay distributed.
    An empty cluster falls back to its seed vector with n = 1 (the IVF
    COALESCE(seed) rule).

    Round shape (optimization round 11): assignment is a pure projection
    over the pinned quantized corpus (``_assign_cell`` literals — no
    joins), and the centroid update is ONE map-side-combined aggregate
    keyed by cell with d per-dimension BIGINT sums + a count (k rows
    collected). The corpus is scanned once per round and never shuffled —
    only the k-row aggregate crosses the exchange — versus the former
    posexplode + dim-join + two shuffle aggregates per round.
    """
    from .cachereg import pin

    # pinned: every Lloyd round reads the quantized corpus (assignment
    # projection + centroid update), and the stats pass reads it again —
    # the rebuilt identical plan hits Spark's CacheManager
    x = pin(_quantized(df, id_col, vec_col, scale))

    seeds = _seed_cells(x, k)
    if not seeds:
        raise ValueError("kmeans_fit: empty input")
    d = len(seeds[0][2])
    cents = seeds

    assign = None
    for _ in range(iters):
        cell_sql = _assign_cell_sql(cents)
        assign = x.selectExpr("__vid", f"{cell_sql} AS cell")
        # one aggregate keyed by cell: d exact per-dim BIGINT member sums
        # + the member count (k rows collected — the bounded per-round
        # driver state). Partial aggregation runs map-side, so only k
        # rows per task reach the exchange.
        rows = (
            x.selectExpr(f"{cell_sql} AS cell", "__xi")
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.expr(f"sum(__xi[{i}]) AS s{i}") for i in range(d)],
            )
            .collect()
        )
        upd = {
            int(r["cell"]): (int(r["n"]), [int(r[f"s{i}"]) for i in range(d)])
            for r in rows
        }
        cents = [
            (cell, upd[cell][0], upd[cell][1]) if cell in upd else (cell, 1, svec0)
            for cell, _, svec0 in seeds
        ]

    final = assign.select(F.col("__vid").alias(id_col), "cell")
    return final, cents


def kmeans_cluster_stats(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int,
    iters: int,
    scale: int = 10_000,
) -> DataFrame:
    """Per-cluster report after ``iters`` exact Lloyd rounds: size,
    majority label (ties toward the smaller label), and inertia — the
    mean-free sum of squared distances of members to their cluster's
    FINAL mean, computed as exact-BIGINT A-terms summed in DECIMAL(38,0)
    and divided by n^2 * scale^2 once in double (bit-exact across
    engines)."""
    from pyspark.sql import Window

    assign, cents = kmeans_fit(df, id_col, vec_col, k, iters, scale)
    x = _quantized(df, id_col, vec_col, scale)

    # FINAL centroid stats as literal lookup arrays indexed by cell id
    # (cells are 0..k-1 by construction; element_at is 1-based) — the
    # same zero-join discipline as the fit rounds: the former broadcast
    # (cell, n, dim, s) table joined every exploded (vec, dim) row, then
    # re-aggregated per vector; now A is one in-row BIGINT fold. SQL-text
    # built for the same py4j reason as _assign_cell_sql.
    n_arr = _sql_long_array([n for _, n, _ in cents])
    s_arr = (
        "array("
        + ",".join(_sql_long_array(svec) for _, _, svec in cents)
        + ")"
    )
    n_sql = f"element_at({n_arr}, cell + 1)"
    a_sql = (
        f"aggregate(zip_with(__xi, element_at({s_arr}, cell + 1), "
        f"(xi, si) -> ({n_sql} * xi - si) * ({n_sql} * xi - si)), "
        "0L, (acc, t) -> acc + t)"
    )
    a = assign.select(F.col(id_col).alias("__vid"), "cell")
    per_vec = a.join(x, "__vid").selectExpr(
        "__vid",
        "cell",
        f"CAST({a_sql} AS DECIMAL(38,0)) AS A",
        f"{n_sql} AS n",
    )
    sizes = per_vec.groupBy("cell").agg(
        F.count("*").alias("size"),
        F.sum("A").alias("sumA"),
        F.max("n").alias("n"),
    )

    labels = a.join(
        df.select(F.col(id_col).alias("__vid"), F.col(label_col).alias("label")),
        "__vid",
    )
    w = Window.partitionBy("cell").orderBy(F.desc("cnt"), F.asc("label"))
    maj = (
        labels.groupBy("cell", "label")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cell", F.col("label").alias("majority_label"), F.col("cnt").alias("majority_n"))
    )

    return sizes.join(maj, "cell").select(
        F.col("cell").alias("cluster"),
        "size",
        "majority_label",
        "majority_n",
        (
            F.col("sumA").cast("double")
            / (F.col("n") * F.col("n"))
            / float(scale) ** 2
        ).alias("inertia"),
    )
