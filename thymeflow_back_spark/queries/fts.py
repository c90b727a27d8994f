"""Full-text search queries: inverted-index match with minimum-should-match.

The operator (operators/fts.py) replaces the reference's embedded
Elasticsearch; this catalog entry runs the candidate retrieval over part
names with a fixed query set, oracle-checked in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


# --- Q: hybrid lexical+semantic retrieval (RRF fusion) -------------------------

RRF_PROBE_ID = 0  # embedding probe; doc_id/vec_id spaces are aligned
RRF_TOP = 10


@query(
    "q_hybrid_rrf",
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
    bm25 AS (
      SELECT doc_id,
             ROUND(SUM(
               ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (p.tf * (1.2 + 1))
               / (p.tf + 1.2 * (1 - 0.75 + 0.75 * p.dl / s.avgdl))
             ), 6) AS score
      FROM postings p JOIN dfreq d USING (tok) CROSS JOIN stats s
      GROUP BY doc_id
    ),
    lex AS (
      SELECT doc_id AS id,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM bm25 QUALIFY rank <= {BM25_K}
    ),
    vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qv AS (SELECT v AS q_vec FROM vecs WHERE vec_id = {RRF_PROBE_ID}),
    cos AS (
      SELECT c.vec_id AS id,
             round(
               list_dot_product((SELECT q_vec FROM qv), c.v)
               / (sqrt(list_dot_product((SELECT q_vec FROM qv), (SELECT q_vec FROM qv)))
                  * sqrt(list_dot_product(c.v, c.v))),
               9
             ) AS score
      FROM vecs c WHERE c.vec_id <> {RRF_PROBE_ID}
    ),
    sem AS (
      SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rank
      FROM cos QUALIFY rank <= {BM25_K}
    ),
    contribs AS (
      SELECT id, 1000000000000 // (60 + rank) AS c FROM lex
      UNION ALL
      SELECT id, 1000000000000 // (60 + rank) AS c FROM sem
    ),
    fused AS (
      SELECT id, CAST(SUM(c) AS BIGINT) AS s, COUNT(*) AS n_lists
      FROM contribs GROUP BY id
    ),
    top AS (
      SELECT id, s, n_lists,
             ROW_NUMBER() OVER (ORDER BY s DESC, id) AS fused_rank
      FROM fused QUALIFY fused_rank <= {RRF_TOP}
    )
    SELECT id, s / 1000000000000.0 AS rrf_score, n_lists,
           CAST(fused_rank AS INTEGER) AS fused_rank
    FROM top ORDER BY fused_rank
    """,
    doc="Hybrid retrieval: BM25 lexical top-20 and embedding-cosine top-20 "
    "(probe vec_id=0; the doc_id/vec_id spaces are aligned) fused by "
    "Reciprocal Rank Fusion (Cormack et al. 2009) with integer-quantized "
    "contributions floor(1e12/(60+rank)) so the fused score is an exact, "
    "order-free bigint sum on any engine "
    "(operators/fusion.py rrf_fuse).",
)
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.fts import bm25_rank
    from ..operators.fusion import rrf_fuse
    from ..operators.similarity import cosine_topk

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    lex = bm25_rank(docs, "doc_id", "text", list(BM25_TERMS), BM25_K).select(
        F.col("doc_id").alias("id"), "rank"
    )
    probe = emb.filter(F.col("vec_id") == RRF_PROBE_ID)
    sem = cosine_topk(emb, probe, "vec_id", "embedding", BM25_K).select(
        F.col("c_id").alias("id"), "rank"
    )
    return rrf_fuse([lex, sem], "id", RRF_TOP).orderBy("fused_rank")


# --- Q: exact phrase search over positional postings ---------------------------


@query(
    "q_fts_phrase",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    tri AS (
      SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS phrase
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) s
    ),
    top AS (
      SELECT phrase FROM (SELECT phrase, COUNT(*) AS c FROM tri GROUP BY 1)
      ORDER BY c DESC, phrase LIMIT 1
    ),
    pw AS (SELECT string_split(phrase, ' ') AS w, phrase FROM top),
    tok AS (
      SELECT doc_id, i AS pos, toks[i] AS token
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
    ),
    hits AS (
      SELECT t0.doc_id
      FROM pw, tok t0
      JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
      JOIN tok t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2
      WHERE t0.token = pw.w[1] AND t1.token = pw.w[2] AND t2.token = pw.w[3]
    )
    SELECT h.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences, pw.phrase
    FROM hits h, pw
    GROUP BY h.doc_id, pw.phrase
    ORDER BY h.doc_id
    """,
    doc="Exact phrase search over POSITIONAL postings: the probe phrase "
    "is the corpus's most frequent word trigram (count DESC, phrase ASC "
    "tie-break — derived identically in both engines), matched by the "
    "classic positional-intersection plan: per-term postings filtered at "
    "the scan, i-th term positions shifted back by i, (m-1) equi-joins on "
    "(doc, pos) — join volume bounded by the rarest term's postings, "
    "never a per-document rescan. operators/fts.py positional_index / "
    "phrase_match.",
)
def q_fts_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fts import phrase_match, positional_index

    docs = load(spark, sf_dir, "documents")
    top = (
        docs.selectExpr(
            "explode(flatten(transform(array(filter(split(text, ' '), t -> t != '')),"
            " toks -> transform("
            "  if(size(toks) >= 3, sequence(0, size(toks) - 3), cast(array() as array<int>)),"
            "  i -> concat_ws(' ', slice(toks, i + 1, 3)))))) as phrase"
        )
        .groupBy("phrase")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("phrase"))
        .limit(1)
        .collect()
    )
    phrase = top[0]["phrase"]
    pindex = positional_index(docs, "doc_id", "text")
    return (
        phrase_match(pindex, phrase.split(" "))
        .select(
            F.col("entity_id").alias("doc_id"),
            "n_occurrences",
            F.lit(phrase).alias("phrase"),
        )
        .orderBy("doc_id")
    )
