"""Stupid-backoff trigram LM scoring (Brants et al. 2007).

"Large Language Models in Machine Translation" §4: an unnormalized
backoff score that needs no discounting —

    S(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)            if c(w1 w2 w3) > 0
                  = α · c(w2 w3) / c(w2)               elif c(w2 w3) > 0
                  = α² · (c(w3) + 1) / (N + 1)         otherwise
    α = 0.4

(the unigram floor is add-one so an out-of-vocabulary token scores a
defined value instead of −∞; Brants' own floor assumes in-vocabulary).
A document's score is Σ log S over its trigram positions — the CCNet-
style perplexity filter signal, with TRAIN/SCORE separation so backoff
actually fires (a corpus scored by its own counts always hits the
trigram level).

Float discipline (the dsir.py idiom): ln() runs once per DISTINCT
n-gram type — the count tables carry their quantized micro-nat logs —
and ln α enters as ONE precomputed integer literal shared with the SQL
oracle (no cross-engine ln(0.4) at all). A document's score_q is an
order-free BIGINT sum of quantized per-position terms:

    trigram hit:  lnq c123 − lnq c12
    bigram hit:   LNQ_ALPHA + lnq c23 − lnq c2
    uni floor:    2·LNQ_ALPHA + lnq(c3 + 1) − lnq(N + 1)

Scale: three count aggregates over the train corpus (map-side combined;
the vocabulary is never shuffled to the driver); scoring is one eval
scan left-joined against the count relations on their n-gram keys
(sort-merge at scale, broadcast when the model is small); one per-doc
fold. Docs with < 3 tokens have no trigrams and are excluded, mirroring
text.bigram_lm_scores.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LM_SCALE = 1_000_000  # micro-nat grid (dsir.py LOGW_SCALE)
LM_ALPHA = 0.4
# ln(0.4) quantized ONCE here and shipped to both engines as an integer
# literal — the backoff penalty can never diverge by a libm ulp
LNQ_ALPHA = round(math.log(LM_ALPHA) * LM_SCALE)


def _lnq(col) -> F.Column:
    return F.round(F.log(col) * F.lit(LM_SCALE), 0).cast("bigint")


def _positions(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """One row per n-gram POSITION: (id, w1..wn)."""
    toks = f"filter(split({text_col}, ' '), t -> t != '')"
    fields = ", ".join(f"__toks[i + {j}] as w{j + 1}" for j in range(n))
    return df.selectExpr(id_col, f"{toks} as __toks").selectExpr(
        id_col,
        f"explode(transform("
        f" if(size(__toks) >= {n}, sequence(0, size(__toks) - {n}),"
        f"    cast(array() as array<int>)),"
        f" i -> struct({fields}))) as g",
    ).select(F.col(id_col), "g.*")


def backoff_lm_counts(
    train: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(tri, bi, uni, totals) count tables with quantized logs:
    tri = (w1,w2,w3,lnq3), bi = (w1,w2,lnq2), uni = (w1,cnt1,lnq1p) with
    lnq1p = lnq(cnt+1), totals = ONE row (lnq_n1 = lnq(N+1))."""
    tri = (
        _positions(train, id_col, text_col, 3)
        .groupBy("w1", "w2", "w3")
        .agg(_lnq(F.count("*")).alias("lnq3"))
    )
    bi = (
        _positions(train, id_col, text_col, 2)
        .groupBy("w1", "w2")
        .agg(_lnq(F.count("*")).alias("lnq2"))
    )
    uni_counts = (
        _positions(train, id_col, text_col, 1)
        .groupBy("w1")
        .agg(F.count("*").alias("cnt1"))
    )
    uni = uni_counts.select(
        "w1", "cnt1", _lnq(F.col("cnt1") + F.lit(1)).alias("lnq1p"),
        _lnq(F.col("cnt1")).alias("lnq1"),
    )
    totals = uni_counts.agg(
        _lnq(F.sum("cnt1") + F.lit(1)).alias("lnq_n1")
    )
    return tri, bi, uni, totals


def backoff_lm_scores(
    train: DataFrame,
    score: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document stupid-backoff trigram log-score of ``score`` docs
    under counts from ``train``: (id, n_trigrams, n_tri, n_bi, n_uni,
    score_q, avg_logscore). score_q is the order-free micro-nat BIGINT
    sum; avg_logscore = score_q / (n_trigrams · 1e6) is one final
    division."""
    tri, bi, uni, totals = backoff_lm_counts(train, id_col, text_col)
    pos = _positions(score, id_col, text_col, 3)
    j = (
        pos.join(tri, ["w1", "w2", "w3"], "left")
        .join(
            bi.select(
                F.col("w1").alias("__c1"),
                F.col("w2").alias("__c2"),
                F.col("lnq2").alias("__ctx"),
            ),
            (F.col("w1") == F.col("__c1")) & (F.col("w2") == F.col("__c2")),
            "left",
        )
        .join(
            bi.select(
                F.col("w1").alias("__b2"),
                F.col("w2").alias("__b3"),
                F.col("lnq2").alias("__lnq23"),
            ),
            (F.col("w2") == F.col("__b2")) & (F.col("w3") == F.col("__b3")),
            "left",
        )
        .join(
            uni.select(F.col("w1").alias("__u2"), F.col("lnq1").alias("__lnq_c2")),
            F.col("w2") == F.col("__u2"),
            "left",
        )
        .join(
            uni.select(F.col("w1").alias("__u3"), F.col("lnq1p").alias("__lnq_c3p")),
            F.col("w3") == F.col("__u3"),
            "left",
        )
        .crossJoin(F.broadcast(totals))
    )
    term = (
        F.when(F.col("lnq3").isNotNull(), F.col("lnq3") - F.col("__ctx"))
        .when(
            F.col("__lnq23").isNotNull(),
            F.lit(LNQ_ALPHA) + F.col("__lnq23") - F.col("__lnq_c2"),
        )
        .otherwise(
            F.lit(2 * LNQ_ALPHA)
            + F.coalesce(F.col("__lnq_c3p"), F.lit(0))
            - F.col("lnq_n1")
        )
    )
    level = (
        F.when(F.col("lnq3").isNotNull(), F.lit("tri"))
        .when(F.col("__lnq23").isNotNull(), F.lit("bi"))
        .otherwise(F.lit("uni"))
    )
    return (
        j.select(F.col(id_col), term.alias("__t"), level.alias("__l"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_trigrams"),
            F.count_if(F.col("__l") == "tri").alias("n_tri"),
            F.count_if(F.col("__l") == "bi").alias("n_bi"),
            F.count_if(F.col("__l") == "uni").alias("n_uni"),
            F.sum("__t").alias("score_q"),
        )
        .withColumn(
            "avg_logscore",
            F.col("score_q").cast("double")
            / (F.col("n_trigrams") * F.lit(LM_SCALE)).cast("double"),
        )
    )
