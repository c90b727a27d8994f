"""Threshold-sweep evaluation curves for filter calibration.

A curation pipeline tunes every gate (quality score, LM score, classifier
margin) by sweeping the threshold and reading precision/recall against a
reference label. Computing the full PR curve naively sorts the corpus by
score on one task; this operator aggregates per DISTINCT SCORE first — one
ordinary groupBy shuffle over the corpus — and runs the cumulative pass
over the score-group summary relation only (|distinct scores| rows, never
corpus-sized), using the deterministic distributed prefix sum
(operators/packing.py) so no unpartitioned window ever sees an unbounded
relation.

All outputs are exact: cumulative counts are bigint sums, precision /
recall are single bigint/bigint divisions — bit-identical on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .packing import distributed_prefix_sum, distributed_prefix_sums


def pr_curve(df: DataFrame, score_col: str, label_pred: Column) -> DataFrame:
    """PR curve swept over every distinct score threshold, descending.

    One row per distinct score s: (score, cum_n, cum_pos, prec, recall)
    where cum_n / cum_pos count rows with score >= s (the "keep everything
    scoring at least s" policy), prec = cum_pos / cum_n and recall =
    cum_pos / total positives. ``score_col`` must be numeric (the sweep
    orders thresholds descending via the negated score); ``label_pred``
    is a boolean Column marking positives.
    """
    labeled = df.select(
        F.col(score_col).alias("score"),
        F.when(label_pred, F.lit(1)).otherwise(F.lit(0)).alias("__pos"),
    )
    groups = labeled.groupBy("score").agg(
        F.count("*").alias("__n_at"), F.sum("__pos").alias("__pos_at")
    )
    g = groups.withColumn("__negscore", -F.col("score"))
    # both running sums share ONE range exchange over the score groups
    g = distributed_prefix_sums(
        g, "__negscore", {"cum_n": "__n_at", "cum_pos": "__pos_at"}
    )
    totals = labeled.agg(F.sum("__pos").alias("__total_pos"))
    return (
        g.crossJoin(F.broadcast(totals))
        .select(
            "score",
            F.col("cum_n").cast("bigint").alias("cum_n"),
            F.col("cum_pos").cast("bigint").alias("cum_pos"),
            (F.col("cum_pos") / F.col("cum_n")).alias("prec"),
            (F.col("cum_pos") / F.col("__total_pos")).alias("recall"),
        )
    )


def grouped_score_tertiles(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tie_col: str,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-group head/middle/tail thirds by DESCENDING score — the CCNet
    split ("CCNet", Wenzek et al. 2020 §3: per-language perplexity
    tertiles; a higher log-score = lower perplexity = head).

    Adds ``bucket_col`` ∈ {'head','middle','tail'} to every row: rank r
    of n within the group (score descending, ``tie_col`` ascending) maps
    to head iff r <= ceil(n/3), middle iff r <= ceil(2n/3), else tail —
    exact integer arithmetic, identical in both engines.

    Scale shape: the rank comes from :func:`robust.grouped_rank`
    (distributed prefix sum over a range exchange — no per-group
    single-task sort, so one giant language cannot serialize the pass);
    (group, score, tie) must be globally unique (tie_col a key)."""
    from .robust import grouped_rank

    r = grouped_rank(
        df.withColumn("__negscore", -F.col(score_col)),
        group_col,
        ["__negscore", tie_col],
        rank_col="__rn",
        n_col="__n",
    )
    bucket = (
        F.when(F.col("__rn") <= F.expr("(__n + 2) div 3"), F.lit("head"))
        .when(F.col("__rn") <= F.expr("(2 * __n + 2) div 3"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return r.withColumn(bucket_col, bucket).drop("__negscore", "__rn", "__n")


def quantile_edges(
    df: DataFrame, score_col: str, tie_col: str, n_bins: int = 10
) -> DataFrame:
    """The cohort's exact ``n_bins``-quantile edges, one column
    ``__edge`` with ``n_bins − 1`` rows: lower-quantile SELECTION at
    rank max(1, k·n div n_bins) — values that exist in the data, so both
    engines agree bitwise. Rank via the distributed prefix sum (no
    single-task sort); ``tie_col`` must make (score, tie) a key."""
    from .robust import grouped_rank

    spark = df.sparkSession
    ranked = grouped_rank(
        df.select(
            F.col(score_col).alias("__s"), F.col(tie_col).alias("__tie")
        ).withColumn("__g", F.lit(0)),
        "__g",
        ["__s", "__tie"],
        rank_col="__rn",
        n_col="__n",
    )
    ks = spark.range(1, n_bins).select(F.col("id").alias("__k"))
    return ranked.join(
        F.broadcast(ks),
        F.col("__rn") == F.expr(f"greatest(1, (__k * __n) div {n_bins})"),
    ).select(F.col("__s").alias("__edge"))


def bin_counts_by_edges(
    df: DataFrame, score_col: str, edges: DataFrame
) -> DataFrame:
    """Histogram a cohort over quantile edges: (bin, n) with
    bin = 1 + #edges strictly below the score (ties at an edge stay in
    the lower bin — the :func:`quantile_edges` convention). The edge
    relation folds to ONE broadcast array row and the bin is a scalar
    per-row expression (``aggregate`` over the array), so no uniqueness
    precondition exists on the input rows — duplicate scores bin
    independently and correctly (unlike a (score, tie)-keyed regroup,
    which would collapse duplicates and corrupt both the bin id and the
    count). Counts are exact integers, so per-cohort histograms MERGE
    across micro-batches (the property streaming/drift_stream.py builds
    on — each micro-batch bins independently, whatever its key shape)."""
    edge_arr = edges.agg(
        F.sort_array(F.collect_list("__edge")).alias("__edges")
    )
    bin_expr = F.lit(1) + F.aggregate(
        "__edges",
        F.lit(0),
        lambda acc, e: acc
        + F.when(F.col("__s") > e, F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        df.select(F.col(score_col).alias("__s"))
        .crossJoin(F.broadcast(edge_arr))
        .select(bin_expr.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def psi_from_histograms(
    spark,
    ref_hist: DataFrame,
    cur_hist: DataFrame,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin PSI terms from two (bin, n) histograms: (bin, ref_n,
    cur_n, psi_term) over ALL bins 1..n_bins (absent bins are zero;
    Laplace +1 smoothing keeps terms finite; ln once per bin, rounded
    to the house score grid)."""
    allbins = spark.range(1, n_bins + 1).select(F.col("id").alias("bin"))
    cnts = (
        allbins.join(
            ref_hist.select("bin", F.col("n").alias("ref_n")), "bin", "left"
        )
        .join(cur_hist.select("bin", F.col("n").alias("cur_n")), "bin", "left")
        .select(
            "bin",
            F.coalesce("ref_n", F.lit(0)).cast("bigint").alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).cast("bigint").alias("cur_n"),
        )
    )
    tots = cnts.agg(
        F.sum("ref_n").alias("__refN"), F.sum("cur_n").alias("__curN")
    )
    p = (F.col("ref_n") + F.lit(1)).cast("double") / (
        F.col("__refN") + F.lit(n_bins)
    ).cast("double")
    q = (F.col("cur_n") + F.lit(1)).cast("double") / (
        F.col("__curN") + F.lit(n_bins)
    ).cast("double")
    return cnts.crossJoin(F.broadcast(tots)).select(
        "bin",
        "ref_n",
        "cur_n",
        F.round((p - q) * F.log(p / q), 9).alias("psi_term"),
    )


def score_drift_psi(
    df: DataFrame,
    is_ref: Column,
    score_col: str,
    tie_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population-stability-index drift monitor between a REFERENCE
    cohort and the CURRENT cohort under one frozen score — the standard
    model-monitoring statistic (PSI = Σ_bins (p−q)·ln(p/q); < 0.1 stable,
    > 0.25 drifted).

    Bins are the reference cohort's exact ``n_bins``-quantile edges
    (lower-quantile SELECTION at rank max(1, k·n div n_bins) — a value
    that exists in the data, so both engines agree bitwise; ties at an
    edge stay in the lower bin). Shares are Laplace-smoothed (+1 per
    bin) so empty bins stay finite. Returns one row per bin 1..n_bins:
    (bin, ref_n, cur_n, psi_term) — exact integer counts, ln once per
    bin, psi_term a pure IEEE expression of them.

    Scale shape: scores collapse to a per-cohort bin histogram; the only
    rank pass is :func:`robust.grouped_rank` over the reference cohort
    (distributed prefix sum, no single-task sort); the edge relation is
    ``n_bins − 1`` rows broadcast to one binning pass. Composed from
    :func:`quantile_edges` / :func:`bin_counts_by_edges` /
    :func:`psi_from_histograms` — the streaming monitor
    (streaming/drift_stream.py) reuses the same pieces, so streamed PSI
    is bit-identical to this batch form."""
    spark = df.sparkSession
    labeled = df.select(
        F.col(score_col).alias("__s"),
        F.col(tie_col).alias("__tie"),
        is_ref.alias("__ref"),
    )
    from .cachereg import pin

    ref = labeled.filter(F.col("__ref"))
    cur = labeled.filter(~F.col("__ref"))
    # pin the n_bins-1 edge rows: both cohort histograms consume them,
    # and without the pin EACH binning pass re-runs the whole reference
    # rank pipeline (measured ~1.7 s per recompute at sf0.1)
    edges = pin(quantile_edges(ref, "__s", "__tie", n_bins))
    ref_hist = bin_counts_by_edges(ref, "__s", edges)
    cur_hist = bin_counts_by_edges(cur, "__s", edges)
    return psi_from_histograms(spark, ref_hist, cur_hist, n_bins)


def roc_auc(df: DataFrame, score_col: str, label_pred: Column) -> DataFrame:
    """EXACT ROC-AUC (Mann-Whitney U with average-rank tie handling), one row.

    AUC = (Σ_pos avgrank − n_pos(n_pos+1)/2) / (n_pos · n_neg) with ranks
    ascending in score. Everything stays integer until the final division:
    doubling the identity gives 2·avgrank over a tie group [a..b] =
    a + b = 2·cum_n − n_at + 1, so u2 = Σ_groups pos_at·(2·cum_n − n_at
    + 1) − n_pos(n_pos+1) is an exact bigint and auc = u2 / (2·n_pos·n_neg)
    is a single engine-identical division.

    Same scale shape as :func:`pr_curve`: per-score aggregation over the
    corpus, then ONE distributed prefix sum over the score-group summary.
    Returns (n, n_pos, n_neg, u2, auc).

    Overflow discipline: the rank-sum accumulates as decimal(38,0) — each
    term is ≈ pos_at·2n and their sum ≈ 2·n_pos·n, which passes 2^63
    around n ≈ 3×10⁹ rows, i.e. well inside the advertised scale; a
    bigint SUM would wrap silently there. ``auc`` divides the exact
    decimal as doubles (bit-identical to the oracle's exact-int/double
    division whenever u2 < 2^53, and correctly rounded beyond). The
    ``u2`` *output column* stays bigint for oracle parity — it is exact
    while 2·n_pos·n_neg < 2^63; the internal arithmetic never wraps
    either way.
    """
    labeled = df.select(
        F.col(score_col).alias("score"),
        F.when(label_pred, F.lit(1)).otherwise(F.lit(0)).alias("__pos"),
    )
    groups = labeled.groupBy("score").agg(
        F.count("*").alias("__n_at"), F.sum("__pos").alias("__pos_at")
    )
    g = distributed_prefix_sum(groups, "score", "__n_at", "cum_n")
    contrib = g.agg(
        F.sum(
            (
                F.col("__pos_at")
                * (F.lit(2) * F.col("cum_n") - F.col("__n_at") + F.lit(1))
            ).cast("decimal(38,0)")
        ).alias("__ranksum2"),
        F.sum("__n_at").alias("n"),
        F.sum("__pos_at").alias("n_pos"),
    )
    u2 = F.col("__ranksum2") - (F.col("n_pos") * (F.col("n_pos") + 1)).cast(
        "decimal(38,0)"
    )
    return contrib.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        (F.col("n") - F.col("n_pos")).cast("bigint").alias("n_neg"),
        u2.cast("bigint").alias("u2"),
        (
            u2.cast("double")
            / (
                F.lit(2).cast("double")
                * F.col("n_pos").cast("double")
                * (F.col("n") - F.col("n_pos")).cast("double")
            )
        ).alias("auc"),
    )
