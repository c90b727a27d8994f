"""Entity-resolution evaluation harness: precision/recall at thresholds +
annotation sampling.

Parity with reference EntityResolutionEvaluation.scala:24-120 and the
AgentMatchEnricher evaluation outputs (AgentMatchEnricher.scala:292-325):
labeled pair samples are scored against the matcher's pair probabilities
and summarized as precision/recall/F1 per candidate threshold; fresh
annotation samples are drawn deterministically, stratified by score
decile, so annotators see the whole score range rather than only
confident pairs.

Everything is aggregation over the (small) labeled set joined to the
scored pairs — one broadcast threshold cross-join, one shuffle. No
collect; the curves come back as a DataFrame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _canon(df: DataFrame, a: str, b: str) -> DataFrame:
    """Order-normalize pair keys so (x,y) and (y,x) meet."""
    return df.withColumn("__a", F.least(F.col(a), F.col(b))).withColumn(
        "__b", F.greatest(F.col(a), F.col(b))
    )


def er_evaluation(
    scored_pairs: DataFrame,
    labels: DataFrame,
    thresholds: Sequence[float],
    prob_col: str = "probability",
    a_col: str = "a_id",
    b_col: str = "b_id",
    label_col: str = "is_match",
) -> DataFrame:
    """Precision/recall/F1 over the labeled set, per threshold.

    A labeled pair absent from ``scored_pairs`` scores 0 (the matcher did
    not propose it — it counts against recall, exactly the reference's
    treatment of unmatched sample pairs).

    Returns (threshold, n_labeled, tp, fp, fn, precision, recall, f1),
    ordered by threshold.
    """
    spark = scored_pairs.sparkSession
    scored = (
        _canon(scored_pairs, a_col, b_col)
        .groupBy("__a", "__b")
        .agg(F.max(prob_col).alias("__p"))
    )
    labeled = (
        _canon(labels, a_col, b_col)
        .select("__a", "__b", F.col(label_col).cast("boolean").alias("__y"))
        .dropDuplicates(["__a", "__b"])
        .join(scored, ["__a", "__b"], "left")
        .withColumn("__p", F.coalesce("__p", F.lit(0.0)))
    )
    th = spark.createDataFrame([(float(t),) for t in thresholds], "threshold double")
    crossed = labeled.crossJoin(F.broadcast(th))
    pred = F.col("__p") >= F.col("threshold")
    agg = crossed.groupBy("threshold").agg(
        F.count("*").alias("n_labeled"),
        F.sum((pred & F.col("__y")).cast("long")).alias("tp"),
        F.sum((pred & ~F.col("__y")).cast("long")).alias("fp"),
        F.sum(((~pred) & F.col("__y")).cast("long")).alias("fn"),
    )
    precision = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp")))
    recall = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn")))
    out = agg.withColumn("precision", precision).withColumn("recall", recall)
    f1 = F.when(
        F.col("precision").isNotNull()
        & F.col("recall").isNotNull()
        & (F.col("precision") + F.col("recall") > 0),
        2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
    )
    return out.withColumn("f1", f1).orderBy("threshold")


def annotation_sample(
    scored_pairs: DataFrame,
    per_decile: int,
    prob_col: str = "probability",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Deterministic stratified annotation sample: up to ``per_decile``
    pairs per score decile, picked by content hash (stable across runs —
    the reference writes sample CSVs for later labeling; determinism is
    what makes re-generated samples line up with stored labels)."""
    decile = F.least(F.floor(F.col(prob_col) * 10), F.lit(9)).alias("decile")
    ranked = (
        scored_pairs.select(a_col, b_col, prob_col)
        .withColumn("decile", decile)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("decile").orderBy(
                    F.md5(F.concat_ws("|", a_col, b_col)), F.col(a_col)
                )
            ),
        )
    )
    return (
        ranked.filter(F.col("rk") <= per_decile)
        .select(a_col, b_col, prob_col, "decile")
        .orderBy("decile", a_col, b_col)
    )
