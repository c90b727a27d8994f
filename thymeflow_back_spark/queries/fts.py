"""Full-text search queries: inverted-index match with minimum-should-match.

The operator (operators/fts.py) replaces the reference's embedded
Elasticsearch; this catalog entry runs the candidate retrieval over part
names with a fixed query set, oracle-checked in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.fts import build_index, match_query
from ..tables import load
from .catalog import query

QUERIES = (
    ("q1", "small ring"),
    ("q2", "red widget"),
    ("q3", "blue shiny gear"),
    ("q4", "economy bolt gizmo"),
)
MATCH_PERCENT = 66  # ≥2/3 of query tokens must match

_VALUES = ", ".join(f"('{qid}', '{text}')" for qid, text in QUERIES)


@query(
    "q_fts_part_search",
    oracle=f"""
    WITH queries(query_id, qtext) AS (VALUES {_VALUES}),
    qtoks AS (
      SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS token FROM queries
    ),
    qsizes AS (SELECT query_id, COUNT(*) AS n_query_tokens FROM qtoks GROUP BY 1),
    index_ AS (
      SELECT DISTINCT p_partkey AS entity_id, unnest(string_split(lower(p_name), ' ')) AS token
      FROM part
    ),
    hits AS (
      SELECT query_id, entity_id, COUNT(*) AS n_matched
      FROM qtoks JOIN index_ USING (token)
      GROUP BY 1, 2
    )
    SELECT h.query_id, h.entity_id, h.n_matched, s.n_query_tokens
    FROM hits h JOIN qsizes s USING (query_id)
    WHERE h.n_matched * 100 >= s.n_query_tokens * {MATCH_PERCENT}
    ORDER BY query_id, entity_id
    """,
    doc="Full-text candidate retrieval: inverted-index token join with "
    "minimumShouldMatch (the reference's embedded-ES matchQuery, "
    "FullTextSearchServer.scala:57-102, as a pure shuffle join).",
)
def q_fts_part_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    index = build_index(part, "p_partkey", "p_name")
    queries = spark.createDataFrame(list(QUERIES), "query_id string, qtext string")
    return match_query(index, queries, "query_id", "qtext", MATCH_PERCENT).orderBy(
        "query_id", "entity_id"
    )
