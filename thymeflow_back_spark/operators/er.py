"""Agent entity resolution: token-blocking candidate join + soft-TF-IDF
scoring (the Spark form of the reference's AgentMatch pipeline,
AgentMatchEnricher.scala:139-340 / EntityResolution.scala:54-140).

Stages (each a DataFrame op; Python only in the final per-pair scorer):

1. normalize+tokenize names (JVM-side column expressions)
2. IDF per token: idf(t) = ln(N / df(t)) over agents-as-documents
3. candidate blocking: explode tokens → self-join on token (replaces the
   reference's embedded-Elasticsearch candidate retrieval with a pure
   shuffle join; a document-frequency cap keeps hot tokens from exploding —
   the same role as ES's 10k-hits cap)
4. soft-TF-IDF scoring per candidate pair (Arrow-batched pandas UDF;
   Jaro-Winkler secondary metric, θ = 0.9)
5. threshold → sameAs pairs

Scale: blocking join shuffles on token; skew capped by max_token_df; scoring
touches only candidate pairs, never the cross product.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..algorithms.strings import jaro_winkler
from ..functions.text_norm import normalize_text, tokenize

THETA = 0.9  # secondary-metric closeness threshold
DEFAULT_THRESHOLD = 0.9  # reference persistence threshold (SURVEY §6)


def soft_tfidf(
    tokens_a: list[str], tokens_b: list[str], idf: dict[str, float], theta: float = THETA
) -> float:
    """Cosine-style soft-TF-IDF with Jaro-Winkler closeness (public method:
    Cohen/Ravikumar/Fienberg's SoftTFIDF)."""
    if not tokens_a or not tokens_b:
        return 0.0

    def weights(toks: list[str]) -> dict[str, float]:
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        w = {t: (1 + math.log(c)) * idf.get(t, 0.0) for t, c in tf.items()}
        norm = math.sqrt(sum(x * x for x in w.values())) or 1.0
        return {t: x / norm for t, x in w.items()}

    wa, wb = weights(tokens_a), weights(tokens_b)
    score = 0.0
    for ta, va in wa.items():
        best_sim, best_tb = 0.0, None
        for tb in wb:
            sim = jaro_winkler(ta, tb)
            if sim > best_sim:
                best_sim, best_tb = sim, tb
        if best_tb is not None and best_sim >= theta:
            score += va * wb[best_tb] * best_sim
    return score


def prepare_agents(agents: DataFrame, id_col: str, name_col: str) -> DataFrame:
    """(id, name) → (id, tokens array) with normalization applied."""
    return agents.select(
        F.col(id_col).alias("agent_id"),
        tokenize(normalize_text(F.col(name_col))).alias("tokens"),
    ).filter(F.size("tokens") > 0)


def token_idf(prepared: DataFrame) -> DataFrame:
    """idf(t) = ln(N / df(t)) over agents-as-documents
    (reference EntityResolution.scala:133-140)."""
    n_docs = prepared.count()
    return (
        prepared.select("agent_id", F.explode(F.array_distinct("tokens")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
        .select("token", F.log(F.lit(float(n_docs)) / F.col("df")).alias("idf"))
    )


def attach_token_idf(prepared: DataFrame, idf: DataFrame) -> DataFrame:
    """(agent_id, tokens) → (agent_id, tokens, token_idf) with ``token_idf``
    positionally aligned with ``tokens``.

    This is the JOIN-based alternative to collecting the IDF vocabulary to
    the driver: weights ship with the rows, so the scoring UDF needs no
    broadcast dict and the plan scales to document-sized vocabularies
    (the reference's equivalent state lives in its Elasticsearch index)."""
    exploded = prepared.select(
        "agent_id", "tokens", F.posexplode("tokens").alias("pos", "token")
    )
    joined = exploded.join(idf, "token", "left").withColumn(
        "idf", F.coalesce(F.col("idf"), F.lit(0.0))
    )
    return joined.groupBy("agent_id", "tokens").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "idf"))), lambda s: s["idf"]
        ).alias("token_idf")
    )


def candidate_pairs(prepared: DataFrame, max_token_df: int = 10_000) -> DataFrame:
    """Blocking join: pairs sharing ≥1 token PREFIX (first 4 chars).

    Prefix keys make blocking typo-tolerant (the role of the reference's
    fuzzy Elasticsearch retrieval, AgentMatchEnricher.scala:253-258) while
    staying a pure equi-join; Jaro-Winkler's prefix emphasis means true
    matches almost always share a 4-prefix. Hot keys are capped at
    ``max_token_df`` (the ES 10k-hits cap analogue) to bound skew.

    If ``prepared`` carries a ``token_idf`` column (attach_token_idf), the
    per-token weights ride along as ``a_idf`` / ``b_idf``."""
    carry = [c for c in ("tokens", "token_idf") if c in prepared.columns]
    exploded = prepared.select(
        "agent_id",
        *carry,
        F.explode(
            F.array_distinct(F.transform("tokens", lambda t: F.substring(t, 1, 4)))
        ).alias("token"),
    )
    rare = (
        exploded.groupBy("token")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_token_df)
        .select("token")
    )
    blocked = exploded.join(rare, "token")
    renames_a = {"agent_id": "a_id", "tokens": "a_tokens", "token_idf": "a_idf"}
    renames_b = {"agent_id": "b_id", "tokens": "b_tokens", "token_idf": "b_idf"}
    a = blocked.select(
        "token", *[F.col(c).alias(renames_a[c]) for c in ("agent_id", *carry)]
    )
    b = blocked.select(
        "token", *[F.col(c).alias(renames_b[c]) for c in ("agent_id", *carry)]
    )
    out_cols = ["a_id", "b_id"] + [renames_a[c] for c in carry] + [renames_b[c] for c in carry]
    return (
        a.join(b, "token")
        .filter(F.col("a_id") < F.col("b_id"))
        .select(*out_cols)
        .dropDuplicates(["a_id", "b_id"])
    )


def score_pairs(pairs: DataFrame, idf: DataFrame | None = None, theta: float = THETA) -> DataFrame:
    """Attach soft-TF-IDF scores to candidate pairs.

    Default path: pairs carry ``a_idf``/``b_idf`` arrays (attach_token_idf →
    candidate_pairs) and the per-pair IDF map is rebuilt row-locally inside
    the UDF — no driver-side vocabulary collect, no broadcast. The legacy
    dict path (pass ``idf``) remains for small fixed vocabularies."""
    if "a_idf" in pairs.columns:

        @pandas_udf("double")
        def score_joined(
            a_tokens: pd.Series, b_tokens: pd.Series, a_idf: pd.Series, b_idf: pd.Series
        ) -> pd.Series:
            out = []
            for at, bt, ai, bi in zip(a_tokens, b_tokens, a_idf, b_idf):
                at = list(at) if at is not None else []
                bt = list(bt) if bt is not None else []
                local = dict(zip(at, ai if ai is not None else []))
                local.update(zip(bt, bi if bi is not None else []))
                out.append(soft_tfidf(at, bt, local, theta))
            return pd.Series(out)

        return pairs.withColumn(
            "score", score_joined("a_tokens", "b_tokens", "a_idf", "b_idf")
        )

    if idf is None:
        raise ValueError("score_pairs needs a_idf/b_idf columns or an idf table")
    idf_map = {r["token"]: r["idf"] for r in idf.collect()}
    spark = pairs.sparkSession
    idf_bc = spark.sparkContext.broadcast(idf_map)

    @pandas_udf("double")
    def score_udf(a_tokens: pd.Series, b_tokens: pd.Series) -> pd.Series:
        local_idf = idf_bc.value
        return pd.Series(
            [
                soft_tfidf(
                    list(a) if a is not None else [],
                    list(b) if b is not None else [],
                    local_idf,
                    theta,
                )
                for a, b in zip(a_tokens, b_tokens)
            ]
        )

    return pairs.withColumn("score", score_udf("a_tokens", "b_tokens"))


def resolve_agents(
    agents: DataFrame,
    id_col: str = "agent_id",
    name_col: str = "name",
    threshold: float = DEFAULT_THRESHOLD,
    max_token_df: int = 10_000,
) -> DataFrame:
    """Full ER pipeline → sameAs pairs (a_id, b_id, score ≥ threshold).

    The IDF weights travel with the rows (attach_token_idf join) — the
    default path never collects the vocabulary to the driver."""
    prepared = prepare_agents(agents, id_col, name_col)
    idf = token_idf(prepared)
    pairs = candidate_pairs(attach_token_idf(prepared, idf), max_token_df)
    scored = score_pairs(pairs)
    return scored.filter(F.col("score") >= threshold).select("a_id", "b_id", "score")
