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


# --- Q: BM25 ranked retrieval -------------------------------------------------

BM25_TERMS = ("spark", "shuffle", "window")
BM25_K = 20
_TERMS_SQL = ", ".join(f"('{t}')" for t in BM25_TERMS)


@query(
    "q_fts_bm25",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM toks),
    tf AS (
      SELECT doc_id, dl, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok FROM toks)
      GROUP BY 1, 2, 3
    ),
    terms(tok) AS (VALUES {_TERMS_SQL}),
    postings AS (SELECT * FROM tf JOIN terms USING (tok)),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM postings GROUP BY 1),
    scored AS (
      SELECT doc_id,
             ROUND(SUM(
               ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (p.tf * (1.2 + 1))
               / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl))
             ), 6) AS score
      FROM postings p JOIN dfreq d USING (tok) CROSS JOIN stats s
      GROUP BY doc_id
    ),
    ranked AS (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored
    )
    SELECT doc_id, score, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {BM25_K} ORDER BY rank
    """,
    doc="BM25-ranked retrieval over the documents corpus — the RANKING half "
    "of the reference's Elasticsearch matchQuery (Lucene similarity, "
    "FullTextSearchServer.scala:57-102), as one corpus scan + a broadcast "
    "term probe + TakeOrderedAndProject top-k (operators/fts.py:bm25_rank). "
    "Scores round to 6 decimals BEFORE ranking so the order is engine-"
    "reproducible.",
)
def q_fts_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fts import bm25_rank

    docs = load(spark, sf_dir, "documents")
    return bm25_rank(docs, "doc_id", "text", list(BM25_TERMS), BM25_K).orderBy("rank")
