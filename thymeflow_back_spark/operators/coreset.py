"""Diversity sampling over embedding columns: greedy k-center (coreset seed).

Gonzalez (1985) farthest-first traversal — the classic 2-approximation for
the k-center objective, and the standard "pick a maximally diverse subset"
primitive of training-data curation (coreset selection, visual dedup
seeding, k-means++-style initialization without randomness).

Distributed shape: the selection loop runs k-1 rounds; each round is ONE
embarrassingly-parallel scan computing every point's distance to its
nearest chosen center (the chosen centers are plan-time array literals —
at most k·d doubles shipped inside the plan, nothing broadcast-joined) and
a single MAX(struct) aggregate whose result — one row — is collected.
Driver state is k vectors; executor memory is O(d) per row. The same
precedent as the IVF/BPE driver loops (ivf.py collects k×d means per
Lloyd round, bpe.py one row per merge): the COLLECTED data is tiny and
bounded by construction, the scans are fully distributed.

Determinism: squared L2 distances are computed as dot(x,x) − 2·dot(x,c) +
dot(c,c) with the left-to-right ordered fold (similarity.dot) and ROUNDED
to 9 decimals before the argmax, ties broken by smallest id — the same
cross-engine float discipline as cosine_topk, so the DuckDB oracle replays
the exact selection sequence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import SCORE_DECIMALS, as_double_array, dot, sql_double_array_2d


def kcenter_sample(df: DataFrame, id_col: str, vec_col: str, k: int) -> DataFrame:
    """Greedy k-center selection: (rank, id, dist) for k diverse rows.

    rank 1 is the deterministic seed (smallest id, dist 0.0); rank r > 1 is
    the point FARTHEST from the already-chosen set (rounded squared L2,
    ties to smallest id), with ``dist`` its distance-to-set at selection
    time — a non-increasing sequence whose last value is the coverage
    radius of the selected set.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    vecs = df.select(
        F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("v")
    )
    seed = vecs.orderBy("id").limit(1).collect()
    if not seed:
        raise ValueError("kcenter_sample: empty input")
    chosen: list[tuple[int, float, list[float]]] = [
        (seed[0]["id"], 0.0, list(seed[0]["v"]))
    ]
    for _ in range(1, k):
        centers = [v for _, _, v in chosen]
        ids = [i for i, _, _ in chosen]
        # centers ship as ONE array<array<double>> SQL literal
        # (sql_double_array_2d round-trips the exact IEEE doubles F.lit
        # would produce) and the per-row distance is one array_min over a
        # transform — the former per-center F.lit trees cost one py4j
        # round-trip per node (O(k²·d) over the selection loop) and a
        # k-term LEAST tree; min over the identical d2 doubles is
        # unchanged, so the selection sequence is bit-identical.
        picked = (
            vecs.filter(~F.col("id").isin(ids))
            .select(
                F.max(
                    F.struct(
                        _centers_min_dist(F.col("v"), centers).alias("mind"),
                        (-F.col("id")).alias("negid"),
                        F.col("v").alias("v"),
                    )
                ).alias("m")
            )
            .collect()[0]["m"]
        )
        if picked is None:
            break  # fewer than k distinct rows
        chosen.append((-picked["negid"], float(picked["mind"]), list(picked["v"])))
    rows = [(r + 1, i, d) for r, (i, d, _) in enumerate(chosen)]
    return df.sparkSession.createDataFrame(
        rows, f"rank int, {id_col} bigint, dist double"
    )


def _min_dist_over(v: Column, centers_col: Column) -> Column:
    """round-9 squared L2 distance to the nearest element of an
    array<array<double>> centers column — the ONE arithmetic definition
    both center-shipping modes share, so their results are bit-equal."""
    d2 = lambda c: dot(v, v) - F.lit(2.0) * dot(v, c) + dot(c, c)  # noqa: E731
    return F.round(F.array_min(F.transform(centers_col, d2)), SCORE_DECIMALS)


def _centers_min_dist(v: Column, centers: list[list[float]]) -> Column:
    """:func:`_min_dist_over` with the center list shipped as ONE
    array-of-arrays plan literal (k*d doubles) so the per-row work is a
    single array_min over a transform — the plan stays linear in k, not a
    k-term LEAST tree. The literal is emitted as one SQL string
    (sql_double_array_2d — exact IEEE round-trip, so arithmetic is
    bit-identical) instead of k·d F.lit Column nodes, which cost one
    py4j round-trip each and were rebuilt per selection round."""
    return _min_dist_over(v, F.expr(sql_double_array_2d(centers)))


# k*d doubles above this ship as a broadcast one-row relation instead of
# plan literals: analysis/serialization of a 10^5-literal expression tree
# costs more per round than broadcasting the same doubles as DATA, and
# very large plans can hit codegen/plan-size limits. Below it, literals
# win (no join node at all). The arithmetic is identical either way.
CENTER_LITERAL_MAX = 65536


def kcenter_parallel(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    batch: int,
    centers_mode: str = "auto",
) -> DataFrame:
    """Batched farthest-first (oversampled Gonzalez): k diverse rows in
    ceil((k-1)/batch) distributed rounds instead of k-1.

    Each round is ONE scan: every unchosen point's (rounded) squared-L2
    distance to the PRE-ROUND center set, then the ``batch`` farthest
    points join at once (TakeOrdered — per-partition top-b merge, no
    global sort), ties to smallest id. Within a round the picks are
    mutually blind — the standard oversampling trade (k-means|| makes the
    same one, Bahmani et al. 2012): b-fold fewer driver rounds for a
    slightly less spread batch. ``batch=1`` reproduces
    :func:`kcenter_sample`'s exact greedy sequence.

    Output: (rnd, id, dist) — rnd 0 is the deterministic seed (smallest
    id); ``dist`` is the distance to the pre-round set at selection time.
    Scale: rounds collect batch rows each (batch*d doubles of driver
    state); for k in the thousands pick batch ~ k/10 so the job count
    stays constant while each scan remains embarrassingly parallel.

    ``centers_mode`` picks how the pre-round center set ships to
    executors — the RESULTS are bit-identical (same arithmetic column,
    :func:`_min_dist_over`; asserted equal in tests):

    - ``"literal"`` — one array-of-arrays plan literal (k*d doubles).
      No join node; right while k*d stays plan-sized.
    - ``"broadcast"`` — a ONE-ROW broadcast relation crossJoined in
      (BroadcastNestedLoopJoin of a single row — bounded by
      construction, the pq.py codebook idiom). Still a single scan with
      a per-row local array_min: no shuffle, no per-pair blow-up.
    - ``"auto"`` (default) — literal until k*d exceeds
      ``CENTER_LITERAL_MAX``, broadcast after.
    """
    if k < 1 or batch < 1:
        raise ValueError("k and batch must be >= 1")
    if centers_mode not in ("auto", "literal", "broadcast"):
        raise ValueError(f"unknown centers_mode {centers_mode!r}")
    vecs = df.select(
        F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("v")
    )
    seed = vecs.orderBy("id").limit(1).collect()
    if not seed:
        raise ValueError("kcenter_parallel: empty input")
    chosen: list[tuple[int, int, float, list[float]]] = [
        (0, seed[0]["id"], 0.0, list(seed[0]["v"]))
    ]
    rnd = 0
    while len(chosen) < k:
        rnd += 1
        b = min(batch, k - len(chosen))
        centers = [v for _, _, _, v in chosen]
        ids = [i for _, i, _, _ in chosen]
        pool = vecs.filter(~F.col("id").isin(ids))
        use_bcast = centers_mode == "broadcast" or (
            centers_mode == "auto"
            and len(centers) * len(centers[0]) > CENTER_LITERAL_MAX
        )
        if use_bcast:
            cdf = df.sparkSession.createDataFrame(
                [(centers,)], "centers array<array<double>>"
            )
            scored = pool.crossJoin(F.broadcast(cdf)).select(
                "id", "v", _min_dist_over(F.col("v"), F.col("centers")).alias("mind")
            )
        else:
            scored = pool.select(
                "id", "v", _centers_min_dist(F.col("v"), centers).alias("mind")
            )
        picked = (
            scored.orderBy(F.desc("mind"), F.asc("id"))
            .limit(b)
            .collect()
        )
        for r in picked:
            chosen.append((rnd, r["id"], float(r["mind"]), list(r["v"])))
        if len(picked) < b:
            break  # fewer than k distinct rows
    rows = [(r, i, d) for r, i, d, _ in chosen]
    return df.sparkSession.createDataFrame(
        rows, f"rnd int, {id_col} bigint, dist double"
    )


def coverage_radius(
    df: DataFrame, id_col: str, vec_col: str, centers: list[list[float]]
) -> float:
    """max over all rows of the (rounded) squared-L2 distance to the
    nearest center — the k-center objective value, one distributed scan."""
    vecs = df.select(as_double_array(F.col(vec_col)).alias("v"))
    row = vecs.select(
        F.max(_centers_min_dist(F.col("v"), centers)).alias("r")
    ).collect()[0]
    if row["r"] is None:
        # MAX over zero rows (or all-null vectors) is NULL; mirror
        # kcenter_parallel's empty-seed guard instead of float(None)
        raise ValueError("coverage_radius: empty input")
    return float(row["r"])
