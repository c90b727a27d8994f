"""DSIR-style data selection: hashed-n-gram importance resampling.

Public formulation: Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling" (DSIR) — estimate how target-like each raw
document is from bag-of-hashed-n-gram statistics of a target subset vs the
raw corpus, then resample the raw corpus with inclusion odds proportional
to the importance weight. This module keeps the estimator EXACT-arithmetic
(integer bucket counts, one final division) so the weights — and therefore
the selected set — are bit-identical on any engine and any cluster layout;
the resample step reuses the deterministic Efraimidis-Spirakis top-n
(operators/sampling.py), so the whole pipeline is reproducible end to end.

Scale notes (the 100 TB story):
- Bigram occurrences explode map-side from the document scan; the feature
  space is then immediately collapsed to ``n_buckets`` hashed buckets, so
  the only full-width aggregation is a groupBy over a few hundred keys —
  partial (map-side) combine makes the shuffle O(partitions × n_buckets).
- Both corpus-side and target-side bucket counts come from ONE pass
  (count + conditional count per bucket), not two scans of the corpus.
- The bucket table is tiny by construction and broadcast back to the
  occurrence stream; the per-document mass fold is the one data-sized
  shuffle (groupBy id).
- No Python UDFs anywhere; everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_uniform

DSIR_SALT = "dsir"


def _bucket(col_a: Column, col_b: Column, n_buckets: int) -> Column:
    """Hashed-bigram bucket id: first 8 md5 hex chars mod n_buckets."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(" ", F.lit(DSIR_SALT + ":"), col_a, col_b)), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (h % n_buckets).alias("bucket")


def bigram_bucket_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    n_buckets: int,
) -> DataFrame:
    """One row per bigram OCCURRENCE: (id, bucket, is_target).

    Pure narrow projection — the explode is map-side, the bucket hash is a
    scalar expression, and target membership rides along so downstream
    needs no join back to the document table.
    """
    toks = f"filter(split({text_col}, ' '), t -> t != '')"
    pairs = df.select(
        F.col(id_col),
        target_pred.alias("is_target"),
        F.expr(
            f"transform("
            f" if(size({toks}) >= 2, sequence(0, size({toks}) - 2),"
            f"    cast(array() as array<int>)),"
            f" i -> struct({toks}[i] as a, {toks}[i + 1] as b))"
        ).alias("__bgs"),
    ).select(
        F.col(id_col),
        "is_target",
        F.explode("__bgs").alias("bg"),
    )
    return pairs.select(
        F.col(id_col),
        "is_target",
        _bucket(F.col("bg.a"), F.col("bg.b"), n_buckets),
    )


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-document importance weight: (id, n_bigrams, t_mass, r_mass, weight).

    weight = (t_mass + 1) / (r_mass + 1), where t_mass / r_mass sum the
    target-side / corpus-side occurrence counts of the document's hashed
    bigram buckets. NOTE: this is a COUNT-MASS HEURISTIC *inspired by*
    DSIR — a ratio of summed bucket counts, linearly dominated by the
    document's hottest buckets — not the paper's importance weight, which
    is a log-ratio of hashed n-gram language-model probabilities (a sum of
    per-occurrence log ratios). For the paper-faithful estimator use
    :func:`dsir_logratio_weights`; this form is kept because its
    arithmetic is exact-integer until one final division (bit-identical on
    any engine/layout) and it needs no transcendental calls. Add-one keeps
    the weight defined and positive for documents whose buckets never
    occur in the target. Documents with fewer than 2 tokens have no
    bigrams and are excluded, mirroring bigram_lm_scores.
    """
    occ = bigram_bucket_rows(df, id_col, text_col, target_pred, n_buckets)
    counts = occ.groupBy("bucket").agg(
        F.count("*").alias("r_cnt"),
        F.count_if(F.col("is_target")).alias("t_cnt"),
    )
    return (
        occ.join(F.broadcast(counts), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("t_cnt").alias("t_mass"),
            F.sum("r_cnt").alias("r_mass"),
        )
        .withColumn(
            "weight",
            (F.col("t_mass") + F.lit(1)).cast("double")
            / (F.col("r_mass") + F.lit(1)).cast("double"),
        )
    )


LOGW_SCALE = 1_000_000  # quantization grid for log-weights: micro-nats


def dsir_logratio_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    n_buckets: int = 256,
) -> DataFrame:
    """Paper-faithful DSIR importance weight (Xie et al. 2023, §2.2):
    (id, n_bigrams, logw_q, logw).

    log w(x) = Σ_j f_j(x) · [ln p_t(j) − ln p_r(j)] over hashed bigram
    buckets j, with add-one-smoothed hashed-LM probabilities
    p_t(j) = (t_cnt_j + 1) / (T + B) and p_r(j) = (r_cnt_j + 1) / (R + B)
    (T / R = total target / raw bigram occurrences, B = n_buckets). Unlike
    :func:`dsir_weights` — a count-mass heuristic — this is the paper's
    log-ratio of bag-of-hashed-n-gram language models: each occurrence
    contributes its bucket's log probability ratio, so no single hot
    bucket linearly dominates the score.

    Engine/layout determinism: the transcendental work happens ONCE per
    bucket (B rows) — lr(j) = ln(t_cnt+1) − ln(r_cnt+1) + ln(R+B) −
    ln(T+B) — then quantizes to integer micro-nats (round(1e6·lr) as
    bigint). A document's logw_q is an order-free BIGINT SUM of its
    occurrences' quantized terms, so float summation order never enters;
    logw = logw_q / 1e6 is one final division. (A 1-ulp ln() divergence
    between engines moves lr·1e6 by ~1e-8 of the rounding grid — the same
    integer-quantized-contribution discipline as hybrid RRF fusion.)

    Scale: identical shuffle shape to :func:`dsir_weights`; the only
    addition is a one-row totals aggregate folded into the broadcast
    bucket table before the join back to the occurrence stream.
    """
    occ = bigram_bucket_rows(df, id_col, text_col, target_pred, n_buckets)
    counts = occ.groupBy("bucket").agg(
        F.count("*").alias("r_cnt"),
        F.count_if(F.col("is_target")).alias("t_cnt"),
    )
    totals = counts.agg(
        F.sum("r_cnt").alias("__r_tot"), F.sum("t_cnt").alias("__t_tot")
    )
    lr = (
        F.log(F.col("t_cnt") + F.lit(1))
        - F.log(F.col("r_cnt") + F.lit(1))
        + F.log(F.col("__r_tot") + F.lit(n_buckets))
        - F.log(F.col("__t_tot") + F.lit(n_buckets))
    )
    bucket_lr = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(lr * F.lit(LOGW_SCALE), 0).cast("bigint").alias("__lr_q"),
    )
    return (
        occ.join(F.broadcast(bucket_lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("__lr_q").alias("logw_q"),
        )
        .withColumn(
            "logw", F.col("logw_q").cast("double") / F.lit(float(LOGW_SCALE))
        )
    )


def dsir_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    n: int,
    n_buckets: int = 256,
    salt: str = DSIR_SALT,
) -> DataFrame:
    """Select ``n`` documents, inclusion odds ∝ the DSIR importance weight.

    Efraimidis-Spirakis A-ES on the deterministic keyed uniform (the
    q_sample_weighted machinery): es_key = u^(1/weight); the n largest
    es_keys are the sample — one pass, no reservoir state, reproducible
    across engines and cluster layouts. Returns (id, n_bigrams, t_mass,
    r_mass, weight) for the selected documents.
    """
    w = dsir_weights(df, id_col, text_col, target_pred, n_buckets)
    u = hash_uniform(F.col(id_col), salt)
    es_key = F.pow(u, F.lit(1.0) / F.col("weight"))
    return (
        w.withColumn("__es_key", es_key)
        .orderBy(F.desc("__es_key"), F.col(id_col))
        .limit(n)
        .drop("__es_key")
    )
