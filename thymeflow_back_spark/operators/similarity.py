"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline: broadcast the (small) query
set against the corpus — a map-side cross product with no shuffle except the
final per-query top-k. The dot product stays JVM-side via zip_with/aggregate
(left-to-right summation, deterministic). Scores are rounded to 9 decimals
before ranking so results are reproducible across engines regardless of
float summation order.

Scale path (100 TB): the same top_k_per_group tail works behind any blocking
scheme; swap the broadcast cross join for an LSH/IVF candidate join when the
query set is large. (Random-hyperplane LSH is planned with md5-derived
hyperplanes so it stays oracle-reproducible.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCORE_DECIMALS = 9


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def sql_double_array_2d(rows: list[list[float]]) -> str:
    """``array<array<double>>`` literal as ONE SQL string.

    Building k×d literal components through pyspark Column operators
    costs one py4j round-trip per node (~1.5-2 s of pure DRIVER time at
    16×64, measured in round 11) and is paid on every query
    construction; the string build is free and the JVM parse takes
    milliseconds. ``CAST('<repr>' AS DOUBLE)`` round-trips the exact
    IEEE value ``F.lit`` would produce, so downstream arithmetic is
    bit-identical."""
    return (
        "array("
        + ",".join(
            "array("
            + ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in row)
            + ")"
            for row in rows
        )
        + ")"
    )


def dot(a: Column, b: Column) -> Column:
    """Left-to-right ordered dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_id_col: str = "q_id",
) -> DataFrame:
    """Exact cosine top-k: (q_id, c_id, score, rank), self-matches excluded.

    ``queries`` must be small enough to broadcast (it is the per-query probe
    set; the corpus side streams).
    """
    from .skew import spread_small_input

    q = queries.select(
        F.col(id_col).alias(query_id_col), as_double_array(F.col(vec_col)).alias("q_vec")
    )
    # the corpus side carries the per-row vector math — spread it across
    # the session's cores if the scan under-parallelizes (no-op at scale)
    c = spread_small_input(corpus).select(
        F.col(id_col).alias("c_id"), as_double_array(F.col(vec_col)).alias("c_vec")
    )
    score = F.round(
        dot(F.col("q_vec"), F.col("c_vec")) / (norm(F.col("q_vec")) * norm(F.col("c_vec"))),
        SCORE_DECIMALS,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(query_id_col) != F.col("c_id"))
        .select(query_id_col, "c_id", score.alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int,
    query_id_col: str = "q_id",
) -> DataFrame:
    """k-NN majority-vote labeling: (q_id, pred_label, n_votes, vote_share).

    The embedding-space auto-labeling primitive of a curation pipeline
    (propagate a small set of human/model labels to the corpus by nearest
    neighbors — the FineWeb-Edu-style classifier stand-in when the corpus
    already carries reference labels). Exact semantics: top-``k`` cosine
    neighbors (rounded-score ranking, ties to smallest id), then the label
    with the most votes, ties to the smallest label.

    Plan: cosine_topk's broadcast probe scan; the vote is a groupBy over
    q×k rows (tiny by construction) joined back to corpus labels — AQE
    broadcasts the neighbor side, so the label join never shuffles the
    corpus. Vote share is one exact division by the literal k.
    """
    nn = cosine_topk(corpus, queries, id_col, vec_col, k, query_id_col)
    labels = corpus.select(F.col(id_col).alias("c_id"), F.col(label_col).alias("__lbl"))
    votes = (
        nn.join(labels, "c_id")
        .groupBy(query_id_col, "__lbl")
        .agg(F.count("*").alias("n_votes"))
    )
    return (
        votes.groupBy(query_id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("n_votes").alias("n"),
                    (-F.col("__lbl")).cast("bigint").alias("neglbl"),
                )
            ).alias("m")
        )
        .select(
            query_id_col,
            (-F.col("m.neglbl")).alias("pred_label"),
            F.col("m.n").alias("n_votes"),
            (F.col("m.n") / F.lit(float(k))).alias("vote_share"),
        )
    )


def mmr_topk(
    corpus: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    pool: int = 12,
    lam: float = 0.7,
    query_id_col: str = "q_id",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998) for ONE query: greedily pick the candidate maximizing
    ``lam·rel(q,d) − (1−lam)·max_{s∈selected} sim(d,s)`` — relevant
    results that are not near-duplicates of each other, the standard
    rerank behind retrieval UIs and RAG context builders.

    Output: (step, c_id, rel, mmr) — 1-based selection order; step 1's
    mmr is ``lam·rel`` (empty diversity term).

    Scale shape: the greedy runs over a RELEVANCE POOL (top-``pool`` by
    exact cosine — one broadcast-probe corpus scan, the cosine_topk
    plan), never the corpus; the pool collects to the driver (``pool``
    rows × d doubles, bounded by construction — the kcenter_parallel
    bounded-collect contract) and the O(k·pool) greedy runs there. All
    similarities round to SCORE_DECIMALS before any comparison and ties
    break by id, so selection is bit-stable across engines (the
    q_cosine_topk discipline; the SQL oracle replays the same rounds)."""
    # ONE query only: the driver-side rel/vecs greedy state below is keyed
    # by c_id alone, so pools from multiple query rows would collide
    # (last-write-wins garbage). The query relation is tiny by contract —
    # counting it here costs nothing next to the collect below.
    n_q = query.count()
    if n_q != 1:
        raise ValueError(
            f"mmr_topk reranks for exactly one query row, got {n_q}; "
            "loop per query (or window by q_id upstream) for multi-query"
        )
    top = cosine_topk(corpus, query, id_col, vec_col, pool, query_id_col)
    cand = top.join(
        corpus.select(
            F.col(id_col).alias("c_id"), as_double_array(F.col(vec_col)).alias("__v")
        ),
        "c_id",
    ).select("c_id", "score", "__v")
    rows = cand.collect()  # bounded: pool rows
    vecs = {r["c_id"]: list(r["__v"]) for r in rows}
    rel = {r["c_id"]: float(r["score"]) for r in rows}

    def _dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    import math

    def _sim(a, b):
        va, vb = vecs[a], vecs[b]
        return round(
            _dot(va, vb) / (math.sqrt(_dot(va, va)) * math.sqrt(_dot(vb, vb))),
            SCORE_DECIMALS,
        )

    selected: list[tuple[int, int, float, float]] = []
    chosen: list = []
    remaining = sorted(vecs)
    for step in range(1, min(k, len(remaining)) + 1):
        best = None
        for c in remaining:
            if c in chosen:
                continue
            ms = max((_sim(c, s) for s in chosen), default=0.0)
            score = lam * rel[c] - (1.0 - lam) * ms
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c, score)
        _, c, score = best
        chosen.append(c)
        selected.append((step, c, rel[c], score))
    # c_id keeps the corpus id type (string ids work, not just bigint)
    id_type = dict(corpus.dtypes)[id_col]
    return corpus.sparkSession.createDataFrame(
        selected, f"step int, c_id {id_type}, rel double, mmr double"
    )
