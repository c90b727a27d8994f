"""Unit tests for the serving/eval operators: k-NN labeling, RRF fusion,
and the PR-curve threshold sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from thymeflow_back_spark.operators.evalcurves import pr_curve
from thymeflow_back_spark.operators.fusion import RRF_SCALE, rrf_fuse
from thymeflow_back_spark.operators.similarity import knn_classify


def test_knn_classify_majority_and_tie_break(spark):
    # probe at origin-ish; 3 neighbors labeled 2, 2 labeled 1 -> majority 2
    corpus_rows = [
        (10, [1.0, 0.0], 2),
        (11, [0.9, 0.1], 2),
        (12, [0.8, 0.2], 2),
        (13, [0.0, 1.0], 1),
        (14, [0.1, 0.9], 1),
        (15, [0.05, 1.0], 1),
    ]
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id bigint, embedding array<float>, label int"
    )
    probe = spark.createDataFrame(
        [(0, [1.0, 0.05])], "vec_id bigint, embedding array<float>"
    )
    out = knn_classify(corpus, probe, "vec_id", "embedding", "label", 5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["pred_label"] == 2 and r["n_votes"] == 3 and abs(r["vote_share"] - 0.6) < 1e-12

    # exact 3-3 split within k=6 -> smaller label wins
    out2 = knn_classify(corpus, probe, "vec_id", "embedding", "label", 6).collect()[0]
    assert out2["n_votes"] == 3 and out2["pred_label"] == 1


def test_rrf_fuse_matches_reference_formula(spark):
    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id bigint, rank int")
    sem = spark.createDataFrame([(3, 1), (2, 2), (9, 3)], "id bigint, rank int")
    out = {r["id"]: r for r in rrf_fuse([lex, sem], "id", 10).collect()}

    def c(rank):
        return RRF_SCALE // (60 + rank)

    assert out[2]["rrf_score"] == (c(2) + c(2)) / float(RRF_SCALE)
    assert out[3]["rrf_score"] == (c(3) + c(1)) / float(RRF_SCALE)
    assert out[1]["n_lists"] == 1 and out[2]["n_lists"] == 2
    # c(1)+c(3) > c(2)+c(2): the rank-1 hit dominates the balanced pair
    ranks = {r["id"]: r["fused_rank"] for r in out.values()}
    assert ranks[3] == 1 and ranks[2] == 2
    # fused_rank is dense 1..n in score order
    assert sorted(ranks.values()) == [1, 2, 3, 4]


def test_pr_curve_exact_counts(spark):
    rows = [(i, 100 - i, i % 2 == 0) for i in range(10)]  # scores 91..100
    df = spark.createDataFrame(rows, "id bigint, score bigint, is_pos boolean")
    out = {r["score"]: r for r in pr_curve(df, "score", F.col("is_pos")).collect()}
    assert len(out) == 10
    # highest threshold: only the score-100 row (id 0, positive)
    top = out[100]
    assert (top["cum_n"], top["cum_pos"]) == (1, 1)
    assert top["prec"] == 1.0 and top["recall"] == 1.0 / 5.0
    # lowest threshold keeps everything
    bot = out[91]
    assert (bot["cum_n"], bot["cum_pos"]) == (10, 5)
    assert bot["prec"] == 0.5 and bot["recall"] == 1.0
    # cum_n strictly increases as the threshold drops
    ordered = [out[s]["cum_n"] for s in sorted(out, reverse=True)]
    assert ordered == sorted(ordered) and len(set(ordered)) == 10


def test_roc_auc_matches_pair_counting(spark):
    from thymeflow_back_spark.operators.evalcurves import roc_auc

    # ties included: scores with mixed labels at the same value
    rows = [
        (1, 10, True), (2, 10, False), (3, 8, True), (4, 8, True),
        (5, 8, False), (6, 5, False), (7, 5, True), (8, 3, False),
        (9, 2, False), (10, 1, True),
    ]
    df = spark.createDataFrame(rows, "id bigint, score bigint, is_pos boolean")
    r = roc_auc(df, "score", F.col("is_pos")).collect()[0]
    pos = [s for _, s, p in rows if p]
    neg = [s for _, s, p in rows if not p]
    # pair counting: wins + half-ties
    u2 = sum(2 if p > q else (1 if p == q else 0) for p in pos for q in neg)
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    assert r["u2"] == u2
    assert r["auc"] == u2 / (2.0 * len(pos) * len(neg))


def test_balanced_bins_beat_hash_assignment_on_heavy_tail(spark):
    from thymeflow_back_spark.operators.binning import balanced_bin_summary, balanced_bins
    from thymeflow_back_spark.operators.sampling import hash_uniform

    # heavy-tailed weights: a few giants, many small docs
    rows = [(i, 10_000 if i < 4 else 10 + (i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, w bigint")
    k = 4
    summary = balanced_bin_summary(df, "id", "w", k).collect()
    totals = sorted(r["total_weight"] for r in summary)
    assert len(summary) == k
    # LPT round-robin: each giant lands in its own bin; spread stays tiny
    assert all(r["max_weight"] == 10_000 for r in summary)
    assert totals[-1] - totals[0] <= 20  # within a couple of small docs
    # hash assignment on the same data is far worse
    hashed = (
        df.withColumn("bin", (hash_uniform(F.col("id"), "b") * k).cast("int"))
        .groupBy("bin").agg(F.sum("w").alias("t")).collect()
    )
    h_totals = sorted(r["t"] for r in hashed)
    assert h_totals[-1] - h_totals[0] > totals[-1] - totals[0]
    # assignment is a pure function of (key, weight) set
    a = sorted(map(tuple, balanced_bins(df, "id", "w", k).collect()))
    b = sorted(map(tuple, balanced_bins(df, "id", "w", k).collect()))
    assert a == b
