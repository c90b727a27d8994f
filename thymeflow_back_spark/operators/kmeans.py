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
centroid table (bounded, like the BPE/k-center round loops); everything
else is map-side joins keyed by (vec, dim) and aggregates keyed by cell.
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
    """
    from .cachereg import pin

    spark = df.sparkSession
    # pinned: every Lloyd round reads the quantized corpus twice (distance
    # join + centroid update), and the stats pass reads it again — the
    # rebuilt identical plan hits Spark's CacheManager
    x = pin(_quantized(df, id_col, vec_col, scale))
    xd = x.select(
        "__vid", F.posexplode("__xi").alias("dim", "x")
    )

    seeds = _seed_cells(x, k)
    if not seeds:
        raise ValueError("kmeans_fit: empty input")
    cents = seeds

    def cent_df(c: list[tuple[int, int, list[int]]]) -> DataFrame:
        rows = [
            (cell, n, dim, s)
            for cell, n, svec in c
            for dim, s in enumerate(svec)
        ]
        return spark.createDataFrame(rows, "cell int, n long, dim int, s long")

    assign = None
    for _ in range(iters):
        cd = F.broadcast(cent_df(cents))
        f = (
            xd.join(cd, "dim")
            .groupBy("__vid", "cell")
            .agg(
                F.sum(
                    (F.col("n") * F.col("x") - F.col("s"))
                    * (F.col("n") * F.col("x") - F.col("s"))
                ).alias("A"),
                F.max("n").alias("n"),
            )
            .select(
                "__vid",
                "cell",
                (F.col("A").cast("double") / (F.col("n") * F.col("n"))).alias(
                    "f"
                ),
            )
        )
        assign = (
            f.groupBy("__vid")
            .agg(F.min(F.struct("f", "cell")).alias("m"))
            .select("__vid", F.col("m.cell").alias("cell"))
        )
        # one aggregate keyed by (cell, dim): s = exact member sum, and
        # count(*) = member count n (each member contributes one row per
        # dim). k x d rows collected — the bounded per-round driver state.
        rows = (
            assign.join(xd, "__vid")
            .groupBy("cell", "dim")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        upd: dict[int, tuple[int, dict[int, int]]] = {}
        for r in rows:
            n, dims = upd.setdefault(int(r["cell"]), (int(r["n"]), {}))
            dims[int(r["dim"])] = int(r["s"])
        cents = [
            (cell, upd[cell][0], [upd[cell][1][d] for d in range(len(svec0))])
            if cell in upd
            else (cell, 1, svec0)
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
    spark = df.sparkSession
    x = _quantized(df, id_col, vec_col, scale)
    xd = x.select("__vid", F.posexplode("__xi").alias("dim", "x"))

    cd = F.broadcast(
        spark.createDataFrame(
            [
                (cell, n, dim, s)
                for cell, n, svec in cents
                for dim, s in enumerate(svec)
            ],
            "cell int, n long, dim int, s long",
        )
    )
    a = assign.select(F.col(id_col).alias("__vid"), "cell")
    per_vec = (
        a.join(xd, "__vid")
        .join(cd, ["cell", "dim"])
        .groupBy("__vid", "cell")
        .agg(
            F.sum(
                (F.col("n") * F.col("x") - F.col("s"))
                * (F.col("n") * F.col("x") - F.col("s"))
            )
            .cast("decimal(38,0)")
            .alias("A"),
            F.max("n").alias("n"),
        )
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
