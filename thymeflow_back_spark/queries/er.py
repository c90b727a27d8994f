"""Entity-resolution queries: token-blocked name-similarity join.

The full soft-TF-IDF pipeline (operators/er.py) uses Python scoring and is
pytest-verified; this catalog entry exercises the same blocking-join shape
with an engine-native integer metric (levenshtein) so it has a bit-exact
SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .catalog import query

MAX_LEV = 2


@query(
    "q_er_part_names",
    oracle=f"""
    WITH toks AS (
      SELECT p_partkey, p_name, unnest(string_split(p_name, ' ')) AS token
      FROM part
    ),
    cands AS (
      SELECT DISTINCT a.p_partkey AS a_key, b.p_partkey AS b_key,
             a.p_name AS a_name, b.p_name AS b_name
      FROM toks a JOIN toks b ON a.token = b.token AND a.p_partkey < b.p_partkey
    )
    SELECT a_key, b_key, levenshtein(a_name, b_name) AS lev
    FROM cands
    WHERE levenshtein(a_name, b_name) <= {MAX_LEV}
    ORDER BY a_key, b_key
    """,
    doc="Name-similarity join: token-blocking (explode name tokens → "
    "equi-join) + edit-distance filter — the candidate-pair shape of the "
    "reference's agent matcher (AgentMatchEnricher.scala:249-334) with an "
    "engine-native metric.",
)
def q_er_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    toks = part.select(
        "p_partkey", "p_name", F.explode(F.split("p_name", " ")).alias("token")
    )
    a = toks.select(
        F.col("token"),
        F.col("p_partkey").alias("a_key"),
        F.col("p_name").alias("a_name"),
    )
    b = toks.select(
        F.col("token"),
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
    )
    cands = (
        a.join(b, "token")
        .filter(F.col("a_key") < F.col("b_key"))
        .select("a_key", "b_key", "a_name", "b_name")
        .dropDuplicates(["a_key", "b_key"])
    )
    return (
        cands.select(
            "a_key", "b_key", F.levenshtein("a_name", "b_name").alias("lev")
        )
        .filter(F.col("lev") <= MAX_LEV)
        .orderBy("a_key", "b_key")
    )
