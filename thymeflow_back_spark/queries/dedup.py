"""Deduplication queries over the documents table.

Exact (hash-groupBy), n-gram Jaccard similarity join, MinHash+LSH, and
SimHash near-dup detection — the LLM-training-pipeline dedup ladder, each
with a bit-exact ANSI-SQL oracle (all hashing is md5-derived, so DuckDB
reproduces the Spark pipeline exactly; permutation constants are shared
literals from operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..tables import load
from .catalog import query

JACCARD_THRESHOLD = 0.5
SHINGLE_N = 3
MAX_HAMMING = 3

# Shared SQL fragments ---------------------------------------------------------

_SQL_SHINGLES = """
    toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) s
    )
"""

_SQL_JACCARD = """
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT a_id, b_id, n_common,
             n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = a_id
      JOIN sizes sb ON sb.doc_id = b_id
    )
"""

_PERMS_VALUES = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(D.MINHASH_PERMS)
)


# --- Q: exact dedup -----------------------------------------------------------


@query(
    "q_dedup_exact",
    oracle="""
    WITH groups AS (
      SELECT md5(text) AS content_hash, COUNT(*) AS group_size
      FROM documents GROUP BY 1
    )
    SELECT CAST(SUM(group_size) AS BIGINT) AS n_docs,
           COUNT(*) AS n_distinct,
           CAST(SUM(group_size) - COUNT(*) AS BIGINT) AS n_duplicates
    FROM groups
    """,
    doc="Exact content dedup: one hash-groupBy on md5(text); summary counts.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.exact_dedup_summary(docs, "doc_id", "text")


# --- Q: n-gram Jaccard similarity join ---------------------------------------


@query(
    "q_dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SQL_SHINGLES}, {_SQL_JACCARD}
    SELECT a_id, b_id, n_common, jaccard
    FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
    ORDER BY a_id, b_id
    """,
    bench=True,
    doc="Exact near-dup detection: distinct word-3-gram shingles, shingle-"
    "blocked similarity join, Jaccard >= 0.5 (the token-blocking join of "
    "reference AgentMatchEnricher.scala:249-334 at document scale).",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = D.jaccard_near_dups(docs, "doc_id", "text", SHINGLE_N, JACCARD_THRESHOLD)
    return pairs.orderBy("a_id", "b_id")


# --- Q: prefix-filtered Jaccard ----------------------------------------------


@query(
    "q_dedup_prefix_filter",
    bench=True,
    oracle=f"""
    WITH {_SQL_SHINGLES}, {_SQL_JACCARD}
    SELECT a_id, b_id, n_common, jaccard
    FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
    ORDER BY a_id, b_id
    """,
    doc="PPJoin-style prefix-filtered Jaccard join: candidates meet only on "
    "each document's rarest |sh|-ceil(t|sh|)+1 shingles under the global "
    "(doc-frequency, shingle) order, plus the t*max length filter; exact "
    "in-row array_intersect verify. EXACT recall by the prefix-filter "
    "theorem — the oracle is deliberately the plain all-shingle-blocked "
    "formulation, so the hash match proves no pair was lost to the "
    "filtering (the scale path when hot shingles make the plain blocked "
    "join quadratic and the stop-shingle cap's recall loss is not "
    "acceptable).",
)
def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = D.prefix_filtered_near_dups(
        docs, "doc_id", "text", SHINGLE_N, JACCARD_THRESHOLD
    )
    return pairs.orderBy("a_id", "b_id")


# --- Q: MinHash + LSH ---------------------------------------------------------


@query(
    "q_dedup_minhash_lsh",
    oracle=f"""
    WITH {_SQL_SHINGLES}, {_SQL_JACCARD},
    perms(i, a, b) AS (VALUES {_PERMS_VALUES}),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT % {D.MERSENNE_P} AS h
      FROM sh
    ),
    sig AS (
      SELECT doc_id, i, MIN((a * h + b) % {D.MERSENNE_P}) AS mh
      FROM hashed CROSS JOIN perms
      GROUP BY 1, 2
    ),
    bands AS (
      SELECT doc_id, i // {D.ROWS_PER_BAND} AS band,
             string_agg(mh::VARCHAR, ',' ORDER BY i) AS bkey
      FROM sig GROUP BY 1, 2
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b USING (band, bkey)
      WHERE a.doc_id < b.doc_id
    )
    SELECT c.a_id, c.b_id, j.n_common, j.jaccard
    FROM cands c JOIN jac j USING (a_id, b_id)
    WHERE j.jaccard >= {JACCARD_THRESHOLD}
    ORDER BY c.a_id, c.b_id
    """,
    bench=True,
    doc="MinHash(16 perms)+LSH(4 bands) candidate generation, verified with "
    "true Jaccard — the scale path: signatures are fixed-size per doc and "
    "candidates meet only inside band buckets.",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.minhash_near_dups(docs, "doc_id", "text", SHINGLE_N, JACCARD_THRESHOLD).orderBy(
        "a_id", "b_id"
    )


# --- Q: SimHash ---------------------------------------------------------------


@query(
    "q_dedup_simhash",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok, COUNT(*) AS cnt
      FROM (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents
      ) GROUP BY 1, 2
    ),
    th AS (
      SELECT doc_id, cnt, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tf
    ),
    bits AS (
      SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN cnt ELSE -cnt END) AS v
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, {D.SIMHASH_BITS - 1})) AS b) bs
      GROUP BY 1, 2
    ),
    fp AS (
      SELECT doc_id, SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS fp
      FROM bits GROUP BY 1
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           bit_count(xor(a.fp, b.fp)) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= {MAX_HAMMING}
    ORDER BY a_id, b_id
    """,
    doc="SimHash (60-bit, tf-weighted) near-dup pairs within Hamming distance "
    "3; Spark side blocks on 4×15-bit bands (pigeonhole-exact recall), oracle "
    "verifies via the equivalent full pair scan.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    fps = D.simhash_fingerprints(docs, "doc_id", "text")
    return D.simhash_pairs(fps, "doc_id", MAX_HAMMING).orderBy("a_id", "b_id")


# --- Q: duplicate clusters (components + canonical election) ------------------


@query(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES}, {_SQL_JACCARD},
    pairs AS (
      SELECT a_id, b_id FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT a_id AS s, b_id AS d FROM pairs
      UNION
      SELECT b_id, a_id FROM pairs
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (SELECT s AS node, MIN(d) AS mn FROM reach GROUP BY s),
    labeled AS (
      SELECT doc.doc_id,
             LEAST(COALESCE(c.mn, doc.doc_id), doc.doc_id) AS canonical_id
      FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.node
    ),
    csizes AS (
      SELECT canonical_id, COUNT(*) AS cluster_size FROM labeled GROUP BY 1
    )
    SELECT l.doc_id, l.canonical_id, s.cluster_size
    FROM labeled l JOIN csizes s USING (canonical_id)
    ORDER BY l.doc_id
    """,
    doc="Duplicate-cluster assignment: connected components over the "
    "near-dup pair graph, smallest member elected canonical, singletons "
    "their own cluster — the keep-one-per-cluster primitive of a "
    "training-data pipeline (components via min-label propagation; oracle "
    "via recursive-CTE reachability).",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.dedup_clusters(docs, "doc_id", "text", SHINGLE_N, JACCARD_THRESHOLD).orderBy(
        "doc_id"
    )


# --- Q: Jaccard with the hot-shingle document-frequency cap -------------------

MAX_SHINGLE_DF = 8  # shingles in more docs than this are blocked out


@query(
    "q_dedup_jaccard_capped",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    rare AS (
      SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {MAX_SHINGLE_DF}
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM sh a JOIN rare USING (shingle) JOIN sh b USING (shingle)
      WHERE a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.a_id, c.b_id, COUNT(*) AS n_common
      FROM cands c
      JOIN sh a ON a.doc_id = c.a_id
      JOIN sh b ON b.doc_id = c.b_id AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, n_common,
           n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {JACCARD_THRESHOLD}
    ORDER BY a_id, b_id
    """,
    doc="Jaccard near-dup with the hot-key cap: shingles above a document "
    "frequency are excluded from candidate BLOCKING (boilerplate-heavy "
    "corpora otherwise make one stop-shingle block quadratic), while the "
    "Jaccard value stays exact — candidates re-verify against full shingle "
    "sets. The scale path of the blocked similarity join.",
)
def q_dedup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.jaccard_near_dups(
        docs, "doc_id", "text", SHINGLE_N, JACCARD_THRESHOLD, max_doc_freq=MAX_SHINGLE_DF
    ).orderBy("a_id", "b_id")


# --- Q: leakage-safe train/test split -----------------------------------------

SPLIT_TEST_FRAC = 0.1

_SQL_U_CANON = (
    "(('0x' || substr(md5('split:' || CAST(canonical_id AS VARCHAR)), 1, 8))::BIGINT"
    " / 4294967296.0)"
)


@query(
    "q_split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES}, {_SQL_JACCARD},
    pairs AS (
      SELECT a_id, b_id FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT a_id AS s, b_id AS d FROM pairs
      UNION
      SELECT b_id, a_id FROM pairs
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (SELECT s AS node, MIN(d) AS mn FROM reach GROUP BY s),
    labeled AS (
      SELECT doc.doc_id,
             LEAST(COALESCE(c.mn, doc.doc_id), doc.doc_id) AS canonical_id
      FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.node
    ),
    csizes AS (
      SELECT canonical_id, COUNT(*) AS cluster_size FROM labeled GROUP BY 1
    )
    SELECT l.doc_id, l.canonical_id, s.cluster_size,
           CASE WHEN {_SQL_U_CANON} < {SPLIT_TEST_FRAC}
                THEN 'test' ELSE 'train' END AS split
    FROM labeled l JOIN csizes s USING (canonical_id)
    ORDER BY l.doc_id
    """,
    doc="Leakage-safe train/test split: near-dup clusters (connected "
    "components over the Jaccard pair graph) are assigned to a split as a "
    "UNIT by hashing the cluster's canonical id — a near-duplicate of a "
    "test document can never land in train, the contamination mode a "
    "per-document hash split cannot prevent. Composes dedup_clusters with "
    "the deterministic md5 split (operators/sampling.py).",
)
def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import train_test_split

    docs = load(spark, sf_dir, "documents")
    clusters = D.dedup_clusters(docs, "doc_id", "text", SHINGLE_N, JACCARD_THRESHOLD)
    return train_test_split(
        clusters, "canonical_id", SPLIT_TEST_FRAC, salt="split"
    ).orderBy("doc_id")


# --- Q: directional containment (quote / excerpt detection) --------------------

CONTAIN_T = 0.6


@query(
    "q_containment_join",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    dir AS (
      SELECT a_id AS src_id, b_id AS dst_id, n_common,
             CAST(n_common AS DOUBLE) / sa.n_sh AS containment
      FROM inter JOIN sizes sa ON sa.doc_id = a_id
      UNION ALL
      SELECT b_id AS src_id, a_id AS dst_id, n_common,
             CAST(n_common AS DOUBLE) / sb.n_sh AS containment
      FROM inter JOIN sizes sb ON sb.doc_id = b_id
    )
    SELECT src_id, dst_id, n_common, containment
    FROM dir WHERE containment >= {CONTAIN_T}
    ORDER BY src_id, dst_id
    """,
    doc="Directional shingle-containment join (|src ∩ dst| / |src|): the "
    "quote/excerpt duplication mode symmetric Jaccard misses — a short "
    "document fully lifted into a long one. Both orientations derive from "
    "ONE blocked intersection pass (operators/dedup.py).",
)
def q_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.containment_near_dups(
        docs, "doc_id", "text", SHINGLE_N, CONTAIN_T
    ).orderBy("src_id", "dst_id")


# --- Q: quality-aware cluster collapse (keep the best duplicate) ---------------


@query(
    "q_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES}, {_SQL_JACCARD},
    pairs AS (
      SELECT a_id, b_id FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT a_id AS s, b_id AS d FROM pairs
      UNION
      SELECT b_id, a_id FROM pairs
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (SELECT s AS node, MIN(d) AS mn FROM reach GROUP BY s),
    labeled AS (
      SELECT doc.doc_id, doc.n_chars,
             LEAST(COALESCE(c.mn, doc.doc_id), doc.doc_id) AS canonical_id
      FROM documents doc LEFT JOIN comp c ON doc.doc_id = c.node
    ),
    csizes AS (
      SELECT canonical_id, COUNT(*) AS cluster_size FROM labeled GROUP BY 1
    ),
    ranked AS (
      SELECT l.doc_id, l.canonical_id, s.cluster_size, l.n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY l.canonical_id
               ORDER BY l.n_chars DESC, l.doc_id ASC
             ) AS rn
      FROM labeled l JOIN csizes s USING (canonical_id)
    )
    SELECT doc_id, canonical_id, cluster_size, n_chars
    FROM ranked WHERE rn = 1
    ORDER BY doc_id
    """,
    doc="Quality-aware dedup collapse: per near-dup cluster, keep the "
    "HIGHEST-quality member (longest document, ties to smallest id) — the "
    "curation policy (keep the best copy, not the arbitrary smallest id). "
    "Argmax is a struct MAX per cluster, never a per-cluster window sort "
    "(operators/dedup.py dedup_keep_best).",
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.dedup_keep_best(
        docs, "doc_id", "text", "n_chars", SHINGLE_N, JACCARD_THRESHOLD
    ).select("doc_id", "canonical_id", "cluster_size", "n_chars").orderBy("doc_id")


# --- Q: cross-table LSH decontamination ----------------------------------------

LSH_PROBE_MOD = 7  # doc_id % 7 == 0 -> held-out benchmark side


@query(
    "q_contamination_lsh",
    bench=True,
    oracle=f"""
    WITH {_SQL_SHINGLES},
    perms(i, a, b) AS (VALUES {_PERMS_VALUES}),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT % {D.MERSENNE_P} AS h
      FROM sh
    ),
    sig AS (
      SELECT doc_id, i, MIN((a * h + b) % {D.MERSENNE_P}) AS mh
      FROM hashed CROSS JOIN perms
      GROUP BY 1, 2
    ),
    bands AS (
      SELECT doc_id, i // {D.ROWS_PER_BAND} AS band,
             string_agg(mh::VARCHAR, ',' ORDER BY i) AS bkey
      FROM sig GROUP BY 1, 2
    ),
    cands AS (
      SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS bench_id
      FROM bands t JOIN bands e USING (band, bkey)
      WHERE t.doc_id % {LSH_PROBE_MOD} <> 0 AND e.doc_id % {LSH_PROBE_MOD} = 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.train_id, c.bench_id, COUNT(*) AS n_common
      FROM cands c
      JOIN sh a ON a.doc_id = c.train_id
      JOIN sh b ON b.doc_id = c.bench_id AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT i.train_id, i.bench_id, i.n_common,
           i.n_common / (st.n_sh + sb.n_sh - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes st ON st.doc_id = i.train_id
    JOIN sizes sb ON sb.doc_id = i.bench_id
    WHERE i.n_common / (st.n_sh + sb.n_sh - i.n_common) >= {JACCARD_THRESHOLD}
    ORDER BY i.train_id, i.bench_id
    """,
    doc="Benchmark decontamination at LSH scale: training docs (doc_id % 7 "
    "!= 0) near-duplicating any benchmark doc (doc_id % 7 == 0), found via "
    "MinHash band collisions ACROSS the two tables and verified with exact "
    "Jaccard — the scale form of q_contamination for when the benchmark "
    "union is too large to broadcast its shingles "
    "(operators/dedup.py cross_contamination_lsh).",
)
def q_contamination_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % LSH_PROBE_MOD != 0)
    bench = docs.filter(F.col("doc_id") % LSH_PROBE_MOD == 0)
    return D.cross_contamination_lsh(
        train, bench, "doc_id", "text", SHINGLE_N, JACCARD_THRESHOLD
    ).orderBy("train_id", "bench_id")


# --- Q: sorted-neighborhood (multi-pass SNM) ----------------------------------

SNM_WINDOW = 9
SNM_PREFIX = 5


@query(
    "q_dedup_sorted_neighborhood",
    oracle=f"""
    WITH {_SQL_SHINGLES.strip().rstrip()},
    keys AS (
      SELECT doc_id,
             array_to_string(toks[1:{SNM_PREFIX}], ' ') AS kf,
             array_to_string(list_reverse(toks)[1:{SNM_PREFIX}], ' ') AS kr
      FROM toks
    ),
    rf AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY kf, doc_id) AS rn FROM keys),
    rr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY kr, doc_id) AS rn FROM keys),
    u AS (
      SELECT LEAST(a.doc_id, b.doc_id) AS a_id, GREATEST(a.doc_id, b.doc_id) AS b_id,
             1 AS in_fwd, 0 AS in_rev
      FROM rf a JOIN rf b ON b.rn - a.rn BETWEEN 1 AND {SNM_WINDOW - 1}
      UNION ALL
      SELECT LEAST(a.doc_id, b.doc_id), GREATEST(a.doc_id, b.doc_id), 0, 1
      FROM rr a JOIN rr b ON b.rn - a.rn BETWEEN 1 AND {SNM_WINDOW - 1}
    ),
    cands AS (
      SELECT a_id, b_id, MAX(in_fwd) AS in_fwd, MAX(in_rev) AS in_rev
      FROM u GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (
      SELECT c.a_id, c.b_id, COUNT(*) AS n_common
      FROM cands c
      JOIN sh sa ON sa.doc_id = c.a_id
      JOIN sh sb ON sb.doc_id = c.b_id AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT i.a_id, i.b_id, i.n_common,
             i.n_common / (sa.n_sh + sb.n_sh - i.n_common) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.a_id
      JOIN sizes sb ON sb.doc_id = i.b_id
    )
    SELECT j.a_id, j.b_id, j.n_common, j.jaccard, c.in_fwd, c.in_rev
    FROM jac j JOIN cands c USING (a_id, b_id)
    WHERE j.jaccard >= {JACCARD_THRESHOLD}
    ORDER BY j.a_id, j.b_id
    """,
    doc="Multi-pass sorted-neighborhood near-dup detection (Hernandez & "
    f"Stolfo 1995): sort by the first {SNM_PREFIX} tokens (and by the "
    "reversed-token prefix in a second pass), compare only rows within "
    f"{SNM_WINDOW - 1} global sort ranks — candidate volume is exactly "
    "n*(w-1) regardless of key skew, the guarantee frequency-blocking and "
    "LSH banding lack. Global ranks via the deterministic distributed "
    "prefix sum (one range exchange); pair provenance (in_fwd/in_rev) "
    "rides through the shared exact-Jaccard verify. operators/snm.py.",
)
def q_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.snm import snm_near_dups

    docs = load(spark, sf_dir, "documents")
    return snm_near_dups(
        docs, "doc_id", "text", SNM_WINDOW, JACCARD_THRESHOLD,
        shingle_n=SHINGLE_N, prefix_tokens=SNM_PREFIX,
    ).orderBy("a_id", "b_id")


# --- Q: LSH recall curve (index quality measurement) --------------------------

LSH_CURVE_OFFSET = 1_000_000


def _planted_variant_pairs(spark, sf_dir: str):
    """The doubled-corpus planted-pair relation shared by the recall
    curve and the parameter-selection row: every document paired with a
    deterministically truncated variant. Returns (docs_sh, jacp) where
    jacp = (a_id, b_id, n_common, jaccard) with EXACT Jaccard (threshold
    0.0 — the full measured distribution)."""
    from ..operators.cachereg import pin

    docs = load(spark, sf_dir, "documents")
    # variant = deterministic token-prefix truncation; tokenizing twice in
    # one projection is a bounded per-row cost (no second scan)
    var = docs.selectExpr(
        f"doc_id + {LSH_CURVE_OFFSET} as doc_id",
        "concat_ws(' ', slice(filter(split(text, ' '), t -> t != ''), 1,"
        " cast(greatest((size(filter(split(text, ' '), t -> t != ''))"
        " * (doc_id % 8 + 2)) div 10, 3) as int))) as text",
    )
    union = docs.select("doc_id", "text").unionByName(var)
    docs_sh = pin(
        D._by_id(D.doc_shingles(union, "doc_id", "text", SHINGLE_N), "doc_id")
    )
    pairs = docs.select(
        F.col("doc_id").alias("a_id"),
        (F.col("doc_id") + LSH_CURVE_OFFSET).alias("b_id"),
    )
    return docs_sh, D.verify_candidates_arrays(docs_sh, pairs, "doc_id", 0.0)


@query(
    "q_lsh_recall_curve",
    oracle=f"""
    WITH tk0 AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    docs2 AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {LSH_CURVE_OFFSET},
             array_to_string(
               toks[1:CAST(GREATEST((len(toks) * (doc_id % 8 + 2)) // 10, 3) AS BIGINT)],
               ' ')
      FROM tk0
    ),
    toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM docs2
    ),
    sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) s
    ),
    perms(i, a, b) AS (VALUES {_PERMS_VALUES}),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT % {D.MERSENNE_P} AS h
      FROM sh
    ),
    sig AS (
      SELECT doc_id, i, MIN((a * h + b) % {D.MERSENNE_P}) AS mh
      FROM hashed CROSS JOIN perms
      GROUP BY 1, 2
    ),
    bands AS (
      SELECT doc_id, i // {D.ROWS_PER_BAND} AS band,
             string_agg(mh::VARCHAR, ',' ORDER BY i) AS bkey
      FROM sig GROUP BY 1, 2
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b USING (band, bkey)
      WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    pairs AS (SELECT doc_id AS a_id, doc_id + {LSH_CURVE_OFFSET} AS b_id FROM documents),
    inter AS (
      SELECT p.a_id, p.b_id, COUNT(*) AS n_common
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.a_id
      JOIN sh sb ON sb.doc_id = p.b_id AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    jacp AS (
      SELECT i.a_id, i.b_id,
             i.n_common / (sa.n_sh + sb.n_sh - i.n_common) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.a_id
      JOIN sizes sb ON sb.doc_id = i.b_id
    ),
    curve AS (
      SELECT CAST(floor(j.jaccard * 10) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_caught
      FROM jacp j LEFT JOIN cands c USING (a_id, b_id)
      GROUP BY 1
    )
    SELECT bucket, n_pairs, n_caught, n_caught / n_pairs AS recall
    FROM curve ORDER BY bucket
    """,
    doc="Empirical LSH S-curve: every document is paired with a "
    "deterministically truncated variant (prefix of 20-90% of its tokens "
    "by doc_id, clamped to >= 3), the MinHash(16)+LSH(4x4) index runs "
    "over the doubled corpus, and per exact-Jaccard decile the output "
    "reports how many planted pairs the band index caught — the "
    "measured counterpart of the 1-(1-j^r)^b guarantee, the number that "
    "justifies band/row choices before a 100 TB dedup run. One corpus "
    "scan feeds variants, signatures, and the exact verify; candidates "
    "meet only in band buckets.",
)
def q_lsh_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs_sh, jacp = _planted_variant_pairs(spark, sf_dir)
    cands = D.minhash_candidate_pairs(docs_sh, "doc_id")
    return (
        jacp.join(cands.withColumn("hit", F.lit(1)), ["a_id", "b_id"], "left")
        .groupBy(F.floor(F.col("jaccard") * 10).cast("bigint").alias("bucket"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_caught"),
        )
        .withColumn("recall", F.col("n_caught") / F.col("n_pairs"))
        .orderBy("bucket")
    )


# --- Q: LSH parameter autotuning (close the measure -> choose loop) -----------

LSH_SEL_GRID = [(r, b) for r in (1, 2, 3, 4, 6, 8) for b in (2, 4, 8, 16)]
LSH_SEL_TARGET_PPM = 900_000  # recall >= 0.90 at the dedup threshold
LSH_SEL_SCALE = 1_000_000  # micro-probability grid


def _chain_mul_sql(term: str, k: int) -> str:
    """``term`` multiplied by itself ``k`` times, explicitly left-
    associated — IEEE double multiplication chains are bit-identical
    across engines, unlike libm pow() which is only ulp-accurate."""
    out = term
    for _ in range(k - 1):
        out = f"({out} * {term})"
    return out


def _lsh_param_ctes() -> str:
    """DuckDB replay of the planted-pair relation (the recall curve's
    doubled corpus, exact Jaccard, no LSH index) and the (r, b) grid
    scores: p(j) = 1 - (1 - j^r)^b by chained multiplication, quantized
    to integer micro-probabilities so every aggregate is exact."""
    scores = []
    for r, b in LSH_SEL_GRID:
        jr = _chain_mul_sql("jaccard", r)
        qb = _chain_mul_sql(f"(1.0 - {jr})", b)
        scores.append(
            f"""
      SELECT {r} AS r, {b} AS b,
             CAST(ROUND((1.0 - {qb}) * {LSH_SEL_SCALE}, 0) AS BIGINT) AS p_q,
             jaccard >= {JACCARD_THRESHOLD} AS above
      FROM jacp"""
        )
    union = "\n      UNION ALL".join(scores)
    return f"""
    WITH tk0 AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    docs2 AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {LSH_CURVE_OFFSET},
             array_to_string(
               toks[1:CAST(GREATEST((len(toks) * (doc_id % 8 + 2)) // 10, 3) AS BIGINT)],
               ' ')
      FROM tk0
    ),
    toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM docs2
    ),
    sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) s
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    pairs AS (SELECT doc_id AS a_id, doc_id + {LSH_CURVE_OFFSET} AS b_id FROM documents),
    inter AS (
      SELECT p.a_id, p.b_id, COUNT(*) AS n_common
      FROM pairs p
      JOIN sh sa ON sa.doc_id = p.a_id
      JOIN sh sb ON sb.doc_id = p.b_id AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    jacp AS (
      SELECT i.a_id, i.b_id,
             i.n_common / (sa.n_sh + sb.n_sh - i.n_common) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.a_id
      JOIN sizes sb ON sb.doc_id = i.b_id
    ),
    grid AS ({union}
    ),
    agg AS (
      SELECT r, b, r * b AS cost,
             CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
             CAST(SUM(CASE WHEN above THEN p_q ELSE 0 END) AS BIGINT) AS caught_q,
             CAST(SUM(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT) AS n_below,
             CAST(SUM(CASE WHEN above THEN 0 ELSE p_q END) AS BIGINT) AS fp_q
      FROM grid GROUP BY 1, 2
    ),
    scored AS (
      SELECT r, b, cost, n_above,
             caught_q // n_above AS recall_ppm,
             CASE WHEN n_below > 0 THEN fp_q // n_below ELSE 0 END AS fp_ppm,
             caught_q >= {LSH_SEL_TARGET_PPM} * n_above AS feasible
      FROM agg
    )"""


@query(
    "q_lsh_param_select",
    oracle=_lsh_param_ctes()
    + """,
    sel AS (
      SELECT MIN(CASE WHEN feasible THEN cost * 100000 + b * 100 + r END)
             AS minkey
      FROM scored
    )
    SELECT r, b, cost, recall_ppm, fp_ppm, feasible,
           feasible AND cost * 100000 + b * 100 + r = minkey AS selected
    FROM scored CROSS JOIN sel
    ORDER BY r, b
    """,
    doc="LSH parameter AUTOTUNING — closes the measure->choose loop "
    "q_lsh_recall_curve leaves open: over the measured Jaccard "
    "distribution of the planted truncation pairs, score every (r, b) "
    "in a small grid by the S-curve catch probability "
    "p(j) = 1-(1-j^r)^b (chained double multiplication, never libm pow "
    "— bit-identical across engines), quantized to integer "
    "micro-probabilities so the expected-recall aggregate is exact; "
    "then pick the cheapest feasible setting: minimize r*b (signature "
    "hashes per doc) subject to expected recall >= 0.90 on pairs at or "
    "above the dedup threshold, ties to fewer bands then fewer rows. "
    "Output is the fully scored grid (expected recall and below-"
    "threshold false-positive rate in ppm) with the winner flagged — "
    "the number that justifies MinHash/LSH parameters before a 100 TB "
    "dedup run. One corpus scan feeds the measured pairs; the grid "
    "explode is 24 structs per pair row, one aggregate.",
)
def q_lsh_param_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, jacp = _planted_variant_pairs(spark, sf_dir)

    def p_q(r: int, b: int):
        j = F.col("jaccard")
        jr = j
        for _ in range(r - 1):
            jr = jr * j
        q1 = F.lit(1.0) - jr
        qb = q1
        for _ in range(b - 1):
            qb = qb * q1
        return (
            F.round((F.lit(1.0) - qb) * LSH_SEL_SCALE, 0).cast("bigint")
        )

    grid = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), F.lit(b).alias("b"), p_q(r, b).alias("p_q")
            )
            for r, b in LSH_SEL_GRID
        ]
    )
    exploded = jacp.select(
        (F.col("jaccard") >= JACCARD_THRESHOLD).alias("above"),
        F.explode(grid).alias("g"),
    ).select("above", "g.r", "g.b", "g.p_q")
    agg = exploded.groupBy("r", "b").agg(
        F.sum(F.when(F.col("above"), 1).otherwise(0)).cast("bigint").alias("n_above"),
        F.sum(F.when(F.col("above"), F.col("p_q")).otherwise(0)).cast("bigint").alias("caught_q"),
        F.sum(F.when(F.col("above"), 0).otherwise(1)).cast("bigint").alias("n_below"),
        F.sum(F.when(F.col("above"), 0).otherwise(F.col("p_q"))).cast("bigint").alias("fp_q"),
    )
    scored = agg.select(
        "r",
        "b",
        (F.col("r") * F.col("b")).alias("cost"),
        "n_above",
        F.expr("caught_q div n_above").alias("recall_ppm"),
        F.when(F.col("n_below") > 0, F.expr("fp_q div n_below"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("fp_ppm"),
        (F.col("caught_q") >= LSH_SEL_TARGET_PPM * F.col("n_above")).alias(
            "feasible"
        ),
    )
    # the winner by ARGMIN over an encoded priority key (cost, b, r packed
    # into one integer — bounded: cost <= 128, b <= 16, r <= 8), never an
    # unpartitioned window: the 24-row grid crosses one broadcast min-key
    # row (FALSE AND NULL = FALSE covers the no-feasible-setting case in
    # both engines)
    key = F.col("cost") * 100000 + F.col("b") * 100 + F.col("r")
    sel = scored.agg(
        F.min(F.when(F.col("feasible"), key)).alias("__minkey")
    )
    return (
        scored.crossJoin(F.broadcast(sel))
        .withColumn("selected", F.col("feasible") & (key == F.col("__minkey")))
        .select("r", "b", "cost", "recall_ppm", "fp_ppm", "feasible", "selected")
        .orderBy("r", "b")
    )


# --- Q: IDF-weighted Jaccard (boilerplate-robust dedup) ------------------------

WJ_SCALE = 1000
WJ_BLOCK_CAP = 8
# 100 synthetic boilerplate tokens appended to every EVEN doc — long enough
# that plain Jaccard at 0.5 would cross for unrelated even-even pairs
# (~98 shared shingles vs ~90 distinct ones), while the shingles' corpus-wide
# document frequency drives their weight to ~0
WJ_BOILER = " ".join(f"wb{i}" for i in range(100))


@query(
    "q_dedup_weighted_jaccard",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN text || ' ' || '{WJ_BOILER}'
                  ELSE text END AS text
      FROM documents
    ),
    toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM injected
    ),
    sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) s
    ),
    dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
    shw AS (
      SELECT doc_id, sh.shingle, {WJ_SCALE} // df AS w, df
      FROM sh JOIN dfreq USING (shingle)
    ),
    tot AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS tw FROM shw GROUP BY 1),
    rare AS (SELECT doc_id, shingle FROM shw WHERE df BETWEEN 2 AND {WJ_BLOCK_CAP}),
    cands AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM rare a JOIN rare b USING (shingle)
      WHERE a.doc_id < b.doc_id
    ),
    iw AS (
      SELECT c.a_id, c.b_id, CAST(SUM(a.w) AS BIGINT) AS iw
      FROM cands c
      JOIN shw a ON a.doc_id = c.a_id
      JOIN shw b ON b.doc_id = c.b_id AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    jw AS (
      SELECT i.a_id, i.b_id, i.iw,
             i.iw / (ta.tw + tb.tw - i.iw) AS wjac
      FROM iw i
      JOIN tot ta ON ta.doc_id = i.a_id
      JOIN tot tb ON tb.doc_id = i.b_id
    )
    SELECT a_id, b_id, iw, wjac FROM jw
    WHERE wjac >= {JACCARD_THRESHOLD}
    ORDER BY a_id, b_id
    """,
    doc="IDF-weighted Jaccard near-dup join on a boilerplate-injected "
    "corpus (100 synthetic footer tokens appended to every even doc in "
    "BOTH engines): shingle weight = scale div df as exact integers, so "
    "corpus-wide boilerplate weighs ~0 and the weighted join returns "
    "exactly the real near-dup pairs — plain Jaccard at the same "
    "threshold admits every unrelated even-even pair (pinned by pytest). "
    "Blocking runs only on rare shingles (df <= 8 — bounded blocks, and "
    "exactly the shingles weighting keeps); intersection weights are "
    "then EXACT over all shared shingles via a candidate-bounded "
    "pair x shingle join. operators/dedup.py weighted_jaccard_near_dups.",
)
def q_dedup_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    injected = docs.selectExpr(
        "doc_id",
        f"CASE WHEN doc_id % 2 = 0 THEN concat(text, ' ', '{WJ_BOILER}')"
        " ELSE text END AS text",
    )
    return D.weighted_jaccard_near_dups(
        injected, "doc_id", "text", SHINGLE_N, JACCARD_THRESHOLD,
        weight_scale=WJ_SCALE, block_df_cap=WJ_BLOCK_CAP,
    ).orderBy("a_id", "b_id")
