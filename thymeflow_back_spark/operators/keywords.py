"""Per-document keyphrase extraction by TF-DF salience.

The "what is this document about" primitive of a corpus pipeline (dataset
cards, cluster labeling, topic routing): for each document, the top-k
word n-grams ranked by tf * N / df — term frequency weighted by inverse
document frequency. Two deliberate departures from the textbook tf-idf:

- the idf factor is the RAW ratio N/df, not log(N/df): log() is not
  correctly-rounded in IEEE 754 and engines disagree in the last ulp,
  while (tf * N) is exact BIGINT arithmetic and the single double
  division is correctly rounded — so the score (and thus the ranking) is
  bit-identical on any engine. log is monotone in N/df, so for a FIXED tf
  the ranking is unchanged; across tf values the weighting differs from
  the classic formula, which is fine for a relevance *ordering* primitive
  and essential for a hash-checked one.
- terms above a document-frequency ceiling (df/N > max_df) are dropped
  BEFORE the tf x df join: corpus-wide boilerplate can never be a
  keyword, and — the scale reason — the df ceiling removes exactly the
  hot join keys, so the term-keyed shuffle has bounded skew by
  construction.

Plan shape: map-side n-gram explode -> one shuffle for tf(doc, term) ->
one shuffle for df(term) -> inner join back on term (hot keys pre-dropped)
-> per-document top-k window (partitioned by doc — parallel across docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import token_window_rows


def tfidf_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 2,
    top_k: int = 3,
    max_df_num: int = 3,
    max_df_den: int = 10,
) -> DataFrame:
    """Top-`top_k` w-gram keyphrases per document:
    (id, term, tf, df, score, rnk).

    Terms with document frequency above max_df_num/max_df_den of the
    corpus are excluded (exact integer comparison — no float threshold).
    score = double(tf * N_docs) / df; ties broken by term text ascending.
    """
    grams = token_window_rows(df, id_col, text_col, w)
    tf = grams.groupBy(id_col, F.col("win").alias("term")).agg(
        F.count("*").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = df.agg(F.count("*").alias("__nd"))
    rare = dfreq.crossJoin(F.broadcast(nd)).filter(
        F.col("df") * F.lit(max_df_den) <= F.col("__nd") * F.lit(max_df_num)
    )
    scored = tf.join(rare, "term").withColumn(
        "score", (F.col("tf") * F.col("__nd")).cast("double") / F.col("df")
    )
    rank_w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(rank_w))
        .filter(F.col("rnk") <= top_k)
        .select(id_col, "term", "tf", "df", "score", "rnk")
    )
