"""Training-data pipeline queries: deterministic sampling, splits, sequence
packing, and benchmark decontamination over the documents table.

Every selection here is a pure function of document keys (md5-derived), so
the DuckDB oracles reproduce the exact row sets — reproducibility is the
point of the operators, and the correctness gate proves it across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators.cachereg import pin
from ..operators.packing import pack_chunks
from ..operators.sampling import stratified_sample, train_test_split
from ..operators.sketch import kmv_estimate
from ..tables import load
from .catalog import query

# Shared literals (embedded in both engines' plans).
STRAT_RATES = {"en": 0.2, "de": 0.8, "es": 0.8, "fr": 0.8, "zh": 0.8}
TEST_FRAC = 0.1
PACK_BUDGET = 2048
CONTAM_N = 4
PROBE_MOD = 97  # doc_id % 97 == 0 plays the held-out benchmark set

_SQL_U = (
    "(('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    " / 4294967296.0)"
)

_SQL_TOKENS = "len(list_filter(string_split(text, ' '), x -> x <> ''))"


# --- Q: stratified sampling ---------------------------------------------------


@query(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_SQL_U.format(salt="sample")} <
      CASE lang WHEN 'en' THEN 0.2 WHEN 'de' THEN 0.8 WHEN 'es' THEN 0.8
                WHEN 'fr' THEN 0.8 WHEN 'zh' THEN 0.8 ELSE 0.0 END
    ORDER BY doc_id
    """,
    doc="Deterministic per-language Bernoulli sampling (downsample the "
    "dominant language): keep iff md5-hash-uniform(doc_id) < rate[lang]. "
    "Zero-shuffle codegen'd filter; bit-identical row set on any cluster.",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, "doc_id", "lang", STRAT_RATES, salt="sample")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# --- Q: train/test split ------------------------------------------------------


@query(
    "q_train_test_split",
    oracle=f"""
    SELECT
      CASE WHEN {_SQL_U.format(salt="split")} < {TEST_FRAC}
           THEN 'test' ELSE 'train' END AS split,
      lang,
      COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="Hash-keyed train/test split: membership is a pure function of "
    "doc_id, so growing or repartitioning the corpus never migrates a "
    "document across the boundary. Reported as per-(split, lang) profiles.",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        train_test_split(docs, "doc_id", TEST_FRAC, salt="split")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


# --- Q: sequence packing ------------------------------------------------------


@query(
    "q_token_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS n_tok FROM documents
    ),
    p AS (
      SELECT doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
      FROM t
    )
    SELECT CAST(FLOOR(tok_before / {PACK_BUDGET}) AS BIGINT) AS chunk_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM p GROUP BY 1 ORDER BY 1
    """,
    doc="Fixed-token-budget sequence packing: concatenate the corpus in "
    "doc_id order, cut every 2048 tokens, assign each doc to the chunk "
    "holding its first token. The global running token count is a "
    "distributed two-phase prefix sum (operators/packing.py) — per-range "
    "partial sums in parallel plus one tiny offsets pass — NOT a "
    "single-task global window.",
)
def q_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.size(F.expr("filter(split(text, ' '), t -> t != '')")).cast("bigint")
    packed = pack_chunks(
        docs.select("doc_id", toks.alias("n_tok")), "doc_id", "n_tok", PACK_BUDGET
    )
    return (
        packed.groupBy("chunk_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
        .orderBy("chunk_id")
    )


# --- Q: benchmark decontamination --------------------------------------------


@query(
    "q_contamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
             toks[i+3] AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - {CONTAM_N - 1})) AS i) s
    ),
    probe AS (SELECT doc_id AS probe_id, shingle FROM sh WHERE doc_id % {PROBE_MOD} = 0),
    corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id % {PROBE_MOD} <> 0)
    SELECT c.doc_id,
           COUNT(DISTINCT c.shingle) AS n_shared_shingles,
           COUNT(DISTINCT p.probe_id) AS n_benchmark_docs
    FROM corpus c JOIN probe p USING (shingle)
    GROUP BY 1 ORDER BY 1
    """,
    doc="Benchmark decontamination: training documents sharing any word "
    "4-gram with the held-out benchmark set (doc_id % 97 == 0 here). The "
    "benchmark side is broadcast, shingles explode map-side — the only "
    "shuffle is the per-document hit aggregation.",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") % PROBE_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % PROBE_MOD != 0)
    return (
        D.benchmark_contamination(corpus, probe, "doc_id", "text", CONTAM_N)
        .orderBy("doc_id")
    )


# --- Q: KMV distinct-count sketch --------------------------------------------

KMV_K = 64
SHINGLE_N_KMV = 3


@query(
    "q_distinct_kmv",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) s
    ),
    hs AS (SELECT DISTINCT ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
    mins AS (SELECT h FROM hs ORDER BY h LIMIT {KMV_K})
    SELECT COUNT(*) AS k_used,
           MAX(h) AS kth_min,
           CASE WHEN COUNT(*) < {KMV_K} THEN COUNT(*)::DOUBLE
                ELSE (COUNT(*) - 1) * 4294967296.0 / MAX(h) END AS est_distinct
    FROM mins
    """,
    doc="KMV (k-minimum-values) distinct-count sketch over word-3-gram "
    "shingles: k smallest md5-derived hashes -> (k-1)·2^32/kth_min. The "
    "deterministic, mergeable, cross-engine-reproducible alternative to "
    "HLL approx_count_distinct (operators/sketch.py).",
)
def q_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sh = D.word_shingles(docs, "doc_id", "text", SHINGLE_N_KMV)
    return kmv_estimate(sh, "shingle", KMV_K)


# DuckDB parses bare decimal literals as DECIMAL, so force DOUBLE to get
# the same IEEE multiply/divide Spark performs
_HLL_RAW = "CAST({alpha!r} AS DOUBLE) * 65536.0 / z"


@query(
    "q_distinct_hll",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) s
    ),
    hs AS (SELECT ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh),
    regs0 AS (
      SELECT h // 16777216 AS register,
             CASE WHEN h % 16777216 = 0 THEN 25
                  ELSE 25 - length(bin(h % 16777216)) END AS rho
      FROM hs
    ),
    maxed AS (SELECT register, MAX(rho) AS rho FROM regs0 GROUP BY register),
    spine AS (SELECT unnest(generate_series(0, 255)) AS register),
    regs AS (
      SELECT s.register, COALESCE(m.rho, 0) AS rho
      FROM spine s LEFT JOIN maxed m USING (register)
    ),
    agg AS (
      SELECT COUNT(*) AS m,
             CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros,
             SUM(power(2.0, -rho)) AS z
      FROM regs
    )
    SELECT m, zeros, z,
           {_HLL_RAW.format(alpha=0.7213 / (1 + 1.079 / 256))} AS raw_est,
           CASE WHEN {_HLL_RAW.format(alpha=0.7213 / (1 + 1.079 / 256))} <= 640.0
                     AND zeros > 0
                THEN 256.0 * ln(256.0 / zeros)
                ELSE {_HLL_RAW.format(alpha=0.7213 / (1 + 1.079 / 256))} END
             AS est_distinct
    FROM agg
    """,
    doc="HyperLogLog distinct-count sketch over the same word-3-gram "
    "shingles as q_distinct_kmv: 256 registers (top-8-bit index, "
    "leading-zero rank of the 24-bit suffix), harmonic-mean estimate "
    "alpha*m^2/sum(2^-rho). The register file is mergeable by cell-wise "
    "max and the harmonic sum is bit-exact in any aggregation order "
    "(every term a power of two; 34-bit exponent spread), so both "
    "engines derive the identical estimate (operators/sketch.py). At "
    "this cardinality the raw branch is taken; the linear-counting "
    "fallback (the one engine-ulp-sensitive term, ln) stays dead.",
)
def q_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_estimate

    docs = load(spark, sf_dir, "documents")
    sh = D.word_shingles(docs, "doc_id", "text", SHINGLE_N_KMV)
    return hll_estimate(sh, "shingle")


# --- Q: URL canonicalization --------------------------------------------------

# DuckDB byte i (0-indexed) of md5 hex digest column h
_MD5B = "('0x' || substr(h, {o}, 2))::BIGINT"


@query(
    "q_url_canonical",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, md5('url:' || CAST(doc_id AS VARCHAR)) AS h FROM documents
    ),
    v AS (
      SELECT doc_id,
             {_MD5B.format(o=1)} AS b0, {_MD5B.format(o=3)} AS b1,
             {_MD5B.format(o=5)} AS b2, {_MD5B.format(o=7)} AS b3,
             {_MD5B.format(o=9)} AS b4, {_MD5B.format(o=11)} AS b5,
             {_MD5B.format(o=13)} AS b6
      FROM b
    ),
    u AS (
      SELECT doc_id, b1, b4, b6,
             CASE b2 % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                         WHEN 2 THEN 'net' ELSE 'co.uk' END AS tld,
             'https://'
               || CASE WHEN b0 % 3 = 0 THEN 'www.' ELSE '' END
               || CASE WHEN b0 % 2 = 0 THEN 'Site' ELSE 'site' END
               || CAST(b1 % 40 AS VARCHAR) || '.'
               || CASE b2 % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                              WHEN 2 THEN 'net' ELSE 'co.uk' END
               || CASE b6 % 3 WHEN 0 THEN ':8080' WHEN 1 THEN ':443' ELSE '' END
               || '/p/' || CAST(doc_id % 50 AS VARCHAR)
               || CASE WHEN b3 % 2 = 1 THEN '/' ELSE '' END
               || CASE b4 % 3
                    WHEN 0 THEN '?utm_source=feed&id=' || CAST(b4 % 7 AS VARCHAR)
                    WHEN 1 THEN '?id=' || CAST(b4 % 7 AS VARCHAR) || '&utm_campaign=x&a=2'
                    ELSE '' END
               || CASE WHEN b5 % 2 = 0 THEN '#s' || CAST(b5 % 5 AS VARCHAR)
                       ELSE '' END AS url
      FROM v
    )
    SELECT doc_id, url,
           'https://site' || CAST(b1 % 40 AS VARCHAR) || '.' || tld
             || CASE WHEN b6 % 3 = 0 THEN ':8080' ELSE '' END
             || '/p/' || CAST(doc_id % 50 AS VARCHAR)
             || CASE b4 % 3
                  WHEN 0 THEN '?id=' || CAST(b4 % 7 AS VARCHAR)
                  WHEN 1 THEN '?a=2&id=' || CAST(b4 % 7 AS VARCHAR)
                  ELSE '' END AS canonical,
           'site' || CAST(b1 % 40 AS VARCHAR) || '.' || tld AS domain
    FROM u ORDER BY doc_id
    """,
    doc="URL canonicalization (operators/urls.py) — the first pass of web-"
    "corpus dedup: per-document URLs synthesized from md5(doc_id) bytes "
    "with every mess the canonicalizer must undo (mixed-case host, "
    "www. prefix, explicit default and non-default ports, trailing slash, "
    "utm_* tracking params, unsorted "
    "params, fragments, multi-label co.uk suffix). Spark PARSES the "
    "messy URL with JVM built-ins (parse_url + array ops, zero Python); "
    "the oracle derives the expected canonical form and registrable "
    "domain directly from the generation formula — ground truth, not a "
    "second parser implementation.",
)
def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.urls import canonicalize_urls

    docs = load(spark, sf_dir, "documents").select("doc_id")
    m = F.md5(F.concat(F.lit("url:"), F.col("doc_id").cast("string")))

    def b(i: int):  # byte i of the digest
        return F.conv(F.substring(m, 2 * i + 1, 2), 16, 10).cast("bigint")

    s = lambda c: c.cast("string")  # noqa: E731
    tld = (
        F.when(b(2) % 4 == 0, "com")
        .when(b(2) % 4 == 1, "org")
        .when(b(2) % 4 == 2, "net")
        .otherwise("co.uk")
    )
    url = F.concat(
        F.lit("https://"),
        F.when(b(0) % 3 == 0, "www.").otherwise(""),
        F.when(b(0) % 2 == 0, "Site").otherwise("site"),
        s(b(1) % 40),
        F.lit("."),
        tld,
        F.when(b(6) % 3 == 0, ":8080").when(b(6) % 3 == 1, ":443").otherwise(""),
        F.lit("/p/"),
        s(F.col("doc_id") % 50),
        F.when(b(3) % 2 == 1, "/").otherwise(""),
        F.when(b(4) % 3 == 0, F.concat(F.lit("?utm_source=feed&id="), s(b(4) % 7)))
        .when(b(4) % 3 == 1, F.concat(F.lit("?id="), s(b(4) % 7), F.lit("&utm_campaign=x&a=2")))
        .otherwise(""),
        F.when(b(5) % 2 == 0, F.concat(F.lit("#s"), s(b(5) % 5))).otherwise(""),
    )
    return (
        canonicalize_urls(docs.withColumn("url", url), "url")
        .select("doc_id", "url", "canonical", "domain")
        .orderBy("doc_id")
    )


# --- Q: PageRank --------------------------------------------------------------

PR_ITERS = 5
_PR_S = 1_000_000_000_000


def _pagerank_oracle(iters: int) -> str:
    """Chained-CTE replay of the fixed-point PageRank iterations."""
    head = f"""
    WITH nn AS (SELECT COUNT(*) AS n FROM documents),
    hx AS (SELECT doc_id, md5('pr:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
    v AS (
      SELECT doc_id, {_MD5B.format(o=1)} AS b0, {_MD5B.format(o=3)} AS b1,
             {_MD5B.format(o=5)} AS b2
      FROM hx
    ),
    e3 AS (
      SELECT doc_id AS src, (doc_id * 3 + b0) % nn.n AS dst FROM v, nn
      UNION ALL SELECT doc_id, (doc_id * 7 + b1) % nn.n FROM v, nn
      UNION ALL SELECT doc_id, (doc_id * 11 + b2) % nn.n FROM v, nn
    ),
    edges AS (SELECT DISTINCT src, dst FROM e3),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT doc_id AS id, ({_PR_S} // nn.n) AS r FROM documents, nn)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
    a{k} AS (
      SELECT e.dst AS id, SUM(p.r // d.outdeg) AS s
      FROM edges e JOIN r{k - 1} p ON p.id = e.src JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r{k} AS (
      SELECT d.doc_id AS id,
             CAST((15 * ({_PR_S} // nn.n)) // 100
                  + (85 * COALESCE(a.s, 0)) // 100 AS BIGINT) AS r
      FROM documents d CROSS JOIN nn LEFT JOIN a{k} a ON a.id = d.doc_id
    )""")
    tail = f"""
    SELECT id AS doc_id, r AS rank_scaled,
           CAST(r AS DOUBLE) / CAST({_PR_S} AS DOUBLE) AS rank
    FROM r{iters} ORDER BY doc_id
    """
    return head + "," + ",".join(steps) + tail


def _link_graph_3out(nodes: DataFrame, n: int) -> DataFrame:
    """Deterministic 3-out link graph over ``nodes(id)``: each node links to
    (id*mult + md5-byte) % n for three (multiplier, byte-offset) pairs. One
    definition shared by q_pagerank and q_kcore — BOTH SQL oracles replay
    this exact formula, so the two queries must never drift apart."""
    m = F.md5(F.concat(F.lit("pr:"), F.col("id").cast("string")))

    def b(i: int):
        return F.conv(F.substring(m, 2 * i + 1, 2), 16, 10).cast("bigint")

    parts = [
        nodes.select(F.col("id").alias("src"), ((F.col("id") * mult + b(i)) % n).alias("dst"))
        for mult, i in ((3, 0), (7, 1), (11, 2))
    ]
    return parts[0].unionByName(parts[1]).unionByName(parts[2])


@query(
    "q_pagerank",
    bench=True,
    oracle=_pagerank_oracle(PR_ITERS),
    doc="PageRank over a synthesized 3-out link graph, every step in "
    "scaled-BIGINT fixed-point arithmetic (operators/pagerank.py): "
    "contributions are exact integer divisions, sums are "
    "order-independent integers, damping is the 85/100 rational — so "
    "five distributed iterations land on the bit-identical ranks the "
    "DuckDB chained-CTE replay computes. The corpus-curation authority "
    "prior, minus the float nondeterminism.",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pagerank import pagerank

    nodes = load(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    n = nodes.count()
    edges = _link_graph_3out(nodes, n).distinct()
    return (
        pagerank(nodes, edges, PR_ITERS, n_nodes=n)
        .select(F.col("id").alias("doc_id"), "rank_scaled", "rank")
        .orderBy("doc_id")
    )


# --- Q: k-core peeling --------------------------------------------------------

KCORE_K = 4
KCORE_ROUNDS = 6


def _kcore_oracle(k: int, rounds: int) -> str:
    """Chained-CTE replay of bounded-round k-core peeling on the same 3-out
    link graph the PageRank oracle synthesizes."""
    head = """
    WITH nn AS (SELECT COUNT(*) AS n FROM documents),
    hx AS (SELECT doc_id, md5('pr:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
    v AS (
      SELECT doc_id, ('0x' || substr(h, 1, 2))::BIGINT AS b0,
             ('0x' || substr(h, 3, 2))::BIGINT AS b1,
             ('0x' || substr(h, 5, 2))::BIGINT AS b2
      FROM hx
    ),
    raw3 AS (
      SELECT doc_id AS src, (doc_id * 3 + b0) % nn.n AS dst FROM v, nn
      UNION ALL SELECT doc_id, (doc_id * 7 + b1) % nn.n FROM v, nn
      UNION ALL SELECT doc_id, (doc_id * 11 + b2) % nn.n FROM v, nn
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM raw3 WHERE src <> dst
    )"""
    steps = []
    for r in range(1, rounds + 1):
        steps.append(f"""
    d{r} AS MATERIALIZED (
      SELECT id, COUNT(*) AS d FROM (
        SELECT u AS id FROM e{r - 1} UNION ALL SELECT v FROM e{r - 1}
      ) GROUP BY id
    ),
    a{r} AS MATERIALIZED (SELECT id FROM d{r} WHERE d >= {k}),
    e{r} AS MATERIALIZED (
      SELECT e.u, e.v FROM e{r - 1} e
      JOIN a{r} x ON x.id = e.u JOIN a{r} y ON y.id = e.v
    )""")
    case = " ".join(
        f"WHEN a{r}.id IS NULL THEN {r}" for r in range(1, rounds + 1)
    )
    joins = " ".join(
        f"LEFT JOIN a{r} ON a{r}.id = vr.id" for r in range(1, rounds + 1)
    )
    tail = f"""
    , verts AS (SELECT u AS id FROM e0 UNION SELECT v FROM e0)
    SELECT vr.id AS doc_id, CAST(CASE {case} ELSE 0 END AS INTEGER) AS peel_round
    FROM verts vr {joins}
    ORDER BY doc_id
    """
    return head + "," + ",".join(steps) + tail


@query(
    "q_kcore",
    oracle=_kcore_oracle(KCORE_K, KCORE_ROUNDS),
    doc="Bounded-round k-core peeling (k=4, 6 rounds) over the synthesized "
    "3-out link graph: per-vertex peel_round (the onion layer a vertex "
    "drops out at; 0 = k-core survivor). Fixed round count makes the "
    "computation a pure function both engines replay identically — after "
    "the fixpoint extra rounds are no-ops, and pytest asserts convergence "
    "within the bound. Spark rounds are degree aggregates + semi-joins "
    "on vertex id with per-round localCheckpoint (operators/kcore.py), "
    "the same loop discipline as connected components and PageRank.",
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kcore import kcore_peel
    from ..operators.triangles import undirected_edges

    nodes = load(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    n = nodes.count()
    edges = undirected_edges(_link_graph_3out(nodes, n), "src", "dst")
    return (
        kcore_peel(edges, KCORE_K, KCORE_ROUNDS)
        .select(F.col("id").alias("doc_id"), F.col("peel_round").cast("int"))
        .orderBy("doc_id")
    )


# --- Q: triangle counting / clustering coefficients ---------------------------


@query(
    "q_triangle_stats",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT id, COUNT(*) AS degree FROM (
        SELECT u AS id FROM e0 UNION ALL SELECT v FROM e0
      ) GROUP BY id
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e0 e1 JOIN e0 e2 ON e2.u = e1.v
      JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    pv AS (
      SELECT id, COUNT(*) AS triangles FROM (
        SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
      ) GROUP BY id
    )
    SELECT d.id AS part_key, d.degree,
           COALESCE(pv.triangles, 0) AS triangles,
           CASE WHEN d.degree < 2 THEN 0.0
                ELSE CAST(2 * COALESCE(pv.triangles, 0) AS DOUBLE)
                     / CAST(d.degree * (d.degree - 1) AS DOUBLE) END AS clustering
    FROM deg d LEFT JOIN pv ON pv.id = d.id
    ORDER BY part_key
    """,
    doc="Per-vertex triangle counts and local clustering coefficients of "
    "the part co-order graph (parts sharing a lineitem order). The Spark "
    "plan is the degree-ordered orientation ('compact-forward'): edges "
    "point low-to-high under (degree, id), wedges self-join on the shared "
    "source with bounded O(sqrt(E)) out-degree fan-out, closing edges "
    "equi-join — each triangle found exactly once at its pi-minimal "
    "vertex, no quadratic hub blow-up (operators/triangles.py). The "
    "oracle counts the same triangles from the naive a<b<c 3-way join, "
    "so the hash match proves the orientation loses/duplicates nothing; "
    "clustering = 2T/(d(d-1)) is one IEEE division, bit-exact on both.",
)
def q_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.triangles import clustering_coefficients, undirected_edges

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = a.join(b, "ok").filter(F.col("pa") < F.col("pb"))
    edges = undirected_edges(pairs, "pa", "pb")
    return (
        clustering_coefficients(edges)
        .select(
            F.col("id").alias("part_key"), "degree", "triangles", "clustering"
        )
        .orderBy("part_key")
    )


# --- Q: Bloom-filter semi-join reduction -------------------------------------

_BF_H = "('0x' || substr(md5('bf' || j.g || ':' || CAST({key} AS VARCHAR)), 1, 8))::BIGINT"


@query(
    "q_bloom_semijoin",
    oracle=f"""
    WITH dimkeys AS (
      SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    spine AS (SELECT unnest(generate_series(0, 3)) AS g),
    bp AS (
      SELECT {_BF_H.format(key="k")} AS h FROM dimkeys, spine j
    ),
    bloom AS (
      SELECT (h // 63) % 1024 AS word,
             bit_or(CAST(power(2, h % 63) AS BIGINT)) AS bits
      FROM bp GROUP BY 1
    ),
    fp AS (
      SELECT o_orderkey, o_custkey, {_BF_H.format(key="o_custkey")} AS h
      FROM orders, spine j
    ),
    hits AS (
      SELECT f.o_orderkey, f.o_custkey,
             CASE WHEN b.bits IS NOT NULL
                       AND (b.bits & CAST(power(2, f.h % 63) AS BIGINT)) <> 0
                  THEN 1 ELSE 0 END AS hit
      FROM fp f LEFT JOIN bloom b ON b.word = (f.h // 63) % 1024
    )
    SELECT o_orderkey, o_custkey FROM hits
    GROUP BY o_orderkey, o_custkey HAVING SUM(hit) = 4
    ORDER BY o_orderkey
    """,
    doc="Deterministic Bloom-filter semi-join reduction "
    "(operators/bloom.py): an 8 KB filter built on the BUILDING-segment "
    "customer keys (groupBy-bit_or, 1024x63-bit words, 4 md5-derived "
    "hashes) is broadcast and the orders fact table streams through k "
    "chained broadcast-hash probes — zero shuffle before the real join, "
    "no false negatives, and a hash family that makes the surviving row "
    "set (false positives included) bit-identical on any engine.",
)
def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import bloom_build, bloom_probe

    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return bloom_probe(orders, "o_custkey", bloom_build(cust, "k")).orderBy("o_orderkey")


# --- Q: incremental aggregate maintenance ------------------------------------


@query(
    "q_incremental_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE event_id % 7 = 0 OR event_id % 5 <> 0
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Incremental aggregate maintenance (operators/incremental.py): the "
    "per-type count/sum view is built over a base slice of events, then "
    "ADVANCED BY A DIFF (one batch added, one retracted) by aggregating "
    "only the diff and merging signed partials — work proportional to "
    "the change, the reference's StatementSetDiff discipline applied to "
    "a materialized aggregate. The oracle recomputes the view from "
    "scratch over the final row set; equality proves maintenance = "
    "recompute. Decimal partials keep the merge exact.",
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import additive_agg_state, apply_delta
    from .relational import dec

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    base = ev.filter(F.col("event_id") % 7 != 0)
    added = ev.filter(F.col("event_id") % 7 == 0)
    removed = base.filter(F.col("event_id") % 5 == 0)
    sums = {"sum_value": dec("value")}
    state = additive_agg_state(base, ["event_type"], sums)
    new_state = apply_delta(state, added, removed, ["event_type"], sums)
    return new_state.select(
        "event_type", "n", F.col("sum_value").cast("double").alias("sum_value")
    ).orderBy("event_type")


# --- Q: vocabulary heavy hitters ---------------------------------------------

VOCAB_TOP = 50


@query(
    "q_vocab_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents
    ),
    stats AS (
      SELECT tok, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS total_freq
      FROM tok GROUP BY tok
    ),
    ranked AS (
      SELECT tok, doc_freq, total_freq,
             ROW_NUMBER() OVER (ORDER BY total_freq DESC, tok) AS rank
      FROM stats
    )
    SELECT rank, tok, doc_freq, total_freq FROM ranked
    WHERE rank <= {VOCAB_TOP} ORDER BY rank
    """,
    doc="Vocabulary heavy hitters: top-50 tokens by corpus frequency with "
    "document frequency — the vocab-building / stop-word-discovery "
    "aggregation. One token groupBy; the top-k tail is a sort-limit "
    "(per-partition top-k merge), never a global sort.",
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    toks = D.tokens(docs, "doc_id", "text")
    stats = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count("*").alias("total_freq"),
    )
    # sort-limit first (TakeOrdered: per-partition top-k merge, no global
    # sort); the rank window then runs over VOCAB_TOP rows only.
    top = stats.orderBy(F.desc("total_freq"), F.asc("tok")).limit(VOCAB_TOP)
    w = Window.orderBy(F.desc("total_freq"), F.asc("tok"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "tok", "doc_freq", "total_freq")
        .orderBy("rank")
    )


# --- Q: quality filter rule chain --------------------------------------------


@query(
    "q_quality_filter",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             COALESCE(list_max(list_transform(toks, t -> length(t))), 0) AS max_word_len,
             CASE WHEN len(toks) <= 5000 THEN
               list_max(list_transform(list_distinct(toks),
                 t -> len(list_filter(toks, x -> x = t)))) / NULLIF(len(toks), 0)
             END AS rep_ratio,
             len(list_filter(toks, t -> list_contains(
               ['a','an','and','in','is','of','the','to'], t))) / NULLIF(len(toks), 0) AS stopword_ratio,
             len(list_distinct(toks)) / NULLIF(len(toks), 0) AS unique_ratio
      FROM t
    ),
    r AS (
      SELECT *,
        CASE WHEN n_words < 5 THEN 'too_few_words'
             WHEN n_words > 5000 THEN 'too_many_words'
             WHEN max_word_len > 20 THEN 'word_too_long'
             WHEN rep_ratio > 0.25 THEN 'too_repetitive'
             WHEN stopword_ratio < 0.01 THEN 'low_stopword'
             WHEN unique_ratio < 0.3 THEN 'low_diversity'
        END AS drop_reason
      FROM m
    )
    SELECT doc_id, n_words, max_word_len, rep_ratio, stopword_ratio,
           unique_ratio, drop_reason, drop_reason IS NULL AS keep
    FROM r ORDER BY doc_id
    """,
    doc="C4/Gopher-style quality gate: ordered rule chain (length bounds, "
    "max word length, top-token repetition, stopword presence, vocabulary "
    "diversity) with the first failed rule as drop_reason — a single-scan "
    "zero-shuffle codegen'd projection (operators/text.py quality_filter).",
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import quality_filter

    docs = load(spark, sf_dir, "documents")
    return quality_filter(docs, "doc_id", "text").orderBy("doc_id")


# --- Q: dataset mixture rebalancing ------------------------------------------


@query(
    "q_dataset_mixture",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY 1),
    m AS (SELECT MIN(cnt) AS mn FROM c),
    r AS (SELECT lang, mn / cnt AS rate FROM c, m),
    kept AS (
      SELECT d.lang
      FROM documents d JOIN r USING (lang)
      WHERE {_SQL_U.format(salt="mix")} < r.rate
    ),
    k AS (SELECT lang, COUNT(*) AS n_kept FROM kept GROUP BY 1)
    SELECT r.lang, r.rate, COALESCE(k.n_kept, 0) AS n_kept
    FROM r LEFT JOIN k USING (lang)
    ORDER BY r.lang
    """,
    doc="Dataset mixture rebalancing toward a uniform-over-language target: "
    "per-language keep rates derived FROM the data (min_count/count), "
    "applied as deterministic hash sampling. The rate table is a broadcast "
    "join; selection stays a pure function of doc_id, so the rebalanced "
    "mixture is reproducible on any cluster.",
)
def q_dataset_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_uniform

    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    mn = counts.agg(F.min("cnt").alias("mn"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        "lang", (F.col("mn") / F.col("cnt")).alias("rate")
    )
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .filter(hash_uniform(F.col("doc_id"), "mix") < F.col("rate"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        rates.join(kept, "lang", "left")
        .select("lang", "rate", F.coalesce("n_kept", F.lit(0)).alias("n_kept"))
        .orderBy("lang")
    )


# --- Q: BPE first-iteration pair counts --------------------------------------

BPE_TOP = 20


@query(
    "q_bpe_pair_counts",
    oracle=f"""
    WITH w AS (
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        FROM documents
      ) GROUP BY 1
    ),
    p AS (
      SELECT substr(word, i, 1) AS a,
             CASE WHEN i = length(word) THEN '</w>' ELSE substr(word, i + 1, 1) END AS b,
             cnt
      FROM w, LATERAL (SELECT unnest(generate_series(1, length(word))) AS i) s
    ),
    agg AS (SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM p GROUP BY 1, 2)
    SELECT a, b, pair_count FROM agg
    ORDER BY pair_count DESC, a, b LIMIT {BPE_TOP}
    """,
    doc="BPE merge learning, first iteration: weighted adjacent symbol-pair "
    "counts over the distinct word-shape table (characters + the '</w>' "
    "end-of-word marker), top-20 by count. The iterative trainer "
    "(operators/bpe.py train_bpe, pytest-verified against a local "
    "reference implementation) repeats exactly this aggregation per merge.",
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import _initial_symbols, _pair_counts, word_shapes

    docs = load(spark, sf_dir, "documents")
    counts = _pair_counts(_initial_symbols(word_shapes(docs, "text")))
    return counts.orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b")).limit(BPE_TOP)


# --- Q: BPE merge learning (full trainer, oracle-replayed) ---------------------

BPE_MERGES = 12
BPE_BATCH = 4


def _bpe_chain_parts(n_merges: int) -> list[str]:
    """Sequential-BPE replay CTE chain, one trio per merge. Word shapes
    ride as delimiter-WRAPPED symbol strings ('·a··b··</w>·' — every
    symbol is '·sym·', so the merge is replace('·a··b·' -> '·ab·'):
    left-to-right non-overlapping string replace IS the BPE merge scan,
    and a symbol that merely starts with b can never false-match thanks
    to the closing delimiter. Assumes '·' does not occur in the corpus
    text (true of the test tables; the Spark trainer has no such
    restriction). The shape's original ``word`` rides through every
    s{r} so consumers can join encodings back to documents."""
    parts = [
        """w AS MATERIALIZED (
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        FROM documents) GROUP BY 1
    ),
    s0 AS MATERIALIZED (
      SELECT word, cnt, concat('·', array_to_string(string_split(word, ''), '··'), '··</w>·') AS s
      FROM w
    )"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(f"""p{r} AS MATERIALIZED (
      SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM (SELECT cnt, list_filter(string_split(s, '·'), x -> x <> '') AS syms FROM s{r - 1}),
           LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i) g
      GROUP BY 1, 2
    ),
    t{r} AS MATERIALIZED (
      SELECT a, b, pair_count FROM p{r}
      WHERE pair_count >= 2
      ORDER BY pair_count DESC, a, b LIMIT 1
    ),
    s{r} AS MATERIALIZED (
      SELECT sp.word, sp.cnt, CASE WHEN t.a IS NULL THEN sp.s
        ELSE replace(sp.s, '·' || t.a || '··' || t.b || '·', '·' || t.a || t.b || '·') END AS s
      FROM s{r - 1} sp LEFT JOIN t{r} t ON TRUE
    )""")
    return parts


def _bpe_byte_chain_parts(n_merges: int) -> list[str]:
    """The byte-level replay chain: shapes are GPT-2 PRETOKENS (the
    q_pretoken_counts regex, proven to split identically in Java regex and
    RE2), initial symbols are the pretoken's bytes mapped through GPT-2's
    bytes->unicode table, and there is no end-of-word marker. The test
    corpus is printable ASCII whose only whitespace is ' ' (checked:
    distinct chars are [a-z ] at every SF), so the byte mapping reduces
    to replace(' ' -> chr(288)='Ġ') in SQL — the Spark side
    (operators/bpe.py bytes_to_unicode) implements the full 256-entry
    table. Rounds reuse the char-level chain's p/t/s template via the
    same delimiter-wrapped-string replay."""
    from ..operators.text import PRETOKEN_REGEX

    regex_sql = PRETOKEN_REGEX.replace("'", "''")
    char_parts = _bpe_chain_parts(n_merges)
    byte_head = f"""w AS MATERIALIZED (
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(regexp_extract_all(text, '{regex_sql}')) AS word
        FROM documents) GROUP BY 1
    ),
    s0 AS MATERIALIZED (
      SELECT word, cnt,
             concat('·', array_to_string(string_split(replace(word, ' ', chr(288)), ''), '··'), '·') AS s
      FROM w
    )"""
    return [byte_head, *char_parts[1:]]


def _bpe_train_oracle(n_merges: int) -> str:
    parts = _bpe_chain_parts(n_merges)
    selects = [
        f"SELECT {r} AS step, a, b, pair_count FROM t{r}"
        for r in range(1, n_merges + 1)
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)
        + "\nORDER BY step"
    )


@query(
    "q_bpe_train",
    oracle=_bpe_train_oracle(BPE_MERGES),
    doc=f"BPE merge learning, the full trainer: the first {BPE_MERGES} "
    "learned merges (step, a, b, pair_count) over the corpus word shapes. "
    f"Spark runs the BATCHED trainer (batch={BPE_BATCH} — operators/"
    "bpe.py train_bpe_batched, whose per-round safe-prefix acceptance is "
    "provably equal to the one-merge loop); the oracle replays SEQUENTIAL "
    "BPE merge by merge in SQL (delimiter-wrapped symbol strings, "
    "left-to-right replace = the merge scan) — so the driver gate "
    "cross-checks batched == sequential on real data across engines, on "
    "top of the pytest goldens.",
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import train_bpe_batched

    docs = load(spark, sf_dir, "documents")
    triples = train_bpe_batched(
        docs, "text", BPE_MERGES, batch=BPE_BATCH, return_counts=True
    )
    rows = [(i + 1, a, b, c) for i, (a, b, c) in enumerate(triples)]
    return spark.createDataFrame(
        rows, "step int, a string, b string, pair_count bigint"
    ).orderBy("step")


# --- Q: BPE corpus encoding (the tokenizer's serving side) --------------------

BPE_ENCODE_TOP = 30


def _bpe_encode_oracle(n_merges: int) -> str:
    """Train (sequential replay chain) then ENCODE the corpus: the final
    s{N} relation IS the encoded distinct-shape table, so encoding is one
    join of exploded document words against it — exactly the distinct-
    shape amortization the Spark encoder's per-worker memo implements."""
    parts = _bpe_chain_parts(n_merges)
    return (
        "WITH " + ",\n".join(parts) + f""",
    enc AS (
      SELECT word, list_filter(string_split(s, '·'), x -> x <> '') AS toks
      FROM s{n_merges}
    ),
    docwords AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(toks) AS token
      FROM docwords JOIN enc USING (word)
    )
    SELECT token, COUNT(*) AS total_count,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM tok GROUP BY token
    ORDER BY total_count DESC, token LIMIT {BPE_ENCODE_TOP}"""
    )


@query(
    "q_bpe_encode",
    oracle=_bpe_encode_oracle(BPE_MERGES),
    bench=True,  # the encode scan is the serving-side cost that matters at 100 TB
    doc=f"BPE corpus encoding: train a {BPE_MERGES}-merge model (batched "
    "trainer), encode every document, and profile the resulting token "
    f"distribution — top-{BPE_ENCODE_TOP} tokens by occurrence count with "
    "document frequencies. The Spark encoder (operators/bpe.py "
    "bpe_encode) replays the merge list per DISTINCT word shape via a "
    "per-worker memo (bounded, model-keyed) instead of per occurrence; "
    "the oracle proves the equivalence by construction — it encodes the "
    "distinct-shape table (the replay chain's final relation) and joins "
    "documents back against it. Value-checks token identities AND both "
    "count kinds, so a wrong memo hit or a wrong merge order surfaces as "
    "a hash mismatch.",
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_encode, train_bpe_batched

    docs = load(spark, sf_dir, "documents")
    merges = train_bpe_batched(docs, "text", BPE_MERGES, batch=BPE_BATCH)
    encoded = bpe_encode(docs.select("doc_id", "text"), "text", merges)
    toks = encoded.select(
        "doc_id", F.explode("bpe_tokens").alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("total_count"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("total_count"), F.asc("token"))
        .limit(BPE_ENCODE_TOP)
    )


# --- Q: byte-level BPE (GPT-2's actual tokenizer) -----------------------------


def _bpe_bytelevel_oracle(n_merges: int) -> str:
    parts = _bpe_byte_chain_parts(n_merges)
    selects = [
        f"SELECT {r} AS step, a, b, pair_count FROM t{r}"
        for r in range(1, n_merges + 1)
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)
        + "\nORDER BY step"
    )


@query(
    "q_bpe_bytelevel",
    oracle=_bpe_bytelevel_oracle(BPE_MERGES),
    doc=f"Byte-level BPE (GPT-2's formulation, Radford et al. 2019): the "
    f"first {BPE_MERGES} merges learned over GPT-2 PRETOKENS (the "
    "q_pretoken_counts regex) with byte initial symbols mapped through "
    "the reversible bytes->unicode table ('Ġ' = leading space), no "
    "end-of-word marker. Spark runs the batched trainer over the "
    "distinct pretoken-shape table (operators/bpe.py train_bpe_bytelevel "
    "— the byte mapping touches only distinct shapes, the pretokenize is "
    "a JVM regexp); the oracle replays sequential byte-level BPE in SQL, "
    "so the gate cross-checks batched == sequential AND the byte "
    "symbolization across engines.",
)
def q_bpe_bytelevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import train_bpe_bytelevel

    docs = load(spark, sf_dir, "documents")
    triples = train_bpe_bytelevel(
        docs, "text", BPE_MERGES, batch=BPE_BATCH, return_counts=True
    )
    rows = [(i + 1, a, b, c) for i, (a, b, c) in enumerate(triples)]
    return spark.createDataFrame(
        rows, "step int, a string, b string, pair_count bigint"
    ).orderBy("step")


# --- Q: token-budget mixture rebalancing --------------------------------------


def _token_budget_mixture_oracle(n_merges: int) -> str:
    """q_dataset_mixture's uniform-over-language rebalance, but the budget
    is REAL tokenizer tokens: per-doc counts come from the BPE replay
    chain's encoded distinct-shape table (the q_bpe_encode oracle join)."""
    parts = _bpe_chain_parts(n_merges)
    return (
        "WITH " + ",\n".join(parts) + f""",
    enc AS (
      SELECT word, len(list_filter(string_split(s, '·'), x -> x <> '')) AS wt
      FROM s{n_merges}
    ),
    docwords AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
      FROM documents
    ),
    dsum AS (
      SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS n_tok
      FROM docwords JOIN enc USING (word) GROUP BY 1
    ),
    dtok AS (
      SELECT d.doc_id, d.lang, COALESCE(t.n_tok, 0) AS n_tok
      FROM documents d LEFT JOIN dsum t USING (doc_id)
    ),
    c AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens FROM dtok GROUP BY 1),
    m AS (SELECT MIN(lang_tokens) AS mn FROM c),
    r AS (SELECT lang, lang_tokens, mn / lang_tokens AS rate FROM c, m),
    kept AS (
      SELECT dtok.lang, dtok.n_tok
      FROM dtok JOIN r USING (lang)
      WHERE {_SQL_U.format(salt="tokmix")} < r.rate
    ),
    k AS (
      SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_tok) AS BIGINT) AS kept_tokens
      FROM kept GROUP BY 1
    )
    SELECT r.lang, r.lang_tokens, r.rate,
           COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.kept_tokens, 0) AS kept_tokens
    FROM r LEFT JOIN k USING (lang)
    ORDER BY r.lang"""
    )


@query(
    "q_token_budget_mixture",
    oracle=_token_budget_mixture_oracle(BPE_MERGES),
    doc="Mixture rebalancing toward a uniform-over-language TOKEN budget: "
    "training mixtures are specified in tokenizer tokens, not document "
    "counts, so the per-language keep rate is min_tokens/lang_tokens with "
    "counts from the real (trained) BPE encoder — q_dataset_mixture's "
    "shape with q_bpe_encode's accounting. Selection stays a pure "
    "function of doc_id (deterministic hash sampling); kept documents "
    "and kept tokens are both reported per language.",
)
def q_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_encode, train_bpe_batched
    from ..operators.sampling import hash_uniform

    docs = load(spark, sf_dir, "documents")
    merges = train_bpe_batched(docs, "text", BPE_MERGES, batch=BPE_BATCH)
    # pin: the encoded counts feed BOTH the rate derivation and the kept
    # aggregation — without it the Python encode pass runs twice
    enc = pin(
        bpe_encode(docs.select("doc_id", "lang", "text"), "text", merges).select(
            "doc_id", "lang", F.size("bpe_tokens").cast("bigint").alias("n_tok")
        )
    )
    c = enc.groupBy("lang").agg(F.sum("n_tok").alias("lang_tokens"))
    mn = c.agg(F.min("lang_tokens").alias("mn"))
    rates = c.crossJoin(F.broadcast(mn)).select(
        "lang", "lang_tokens", (F.col("mn") / F.col("lang_tokens")).alias("rate")
    )
    kept = (
        enc.join(F.broadcast(rates.select("lang", "rate")), "lang")
        .filter(hash_uniform(F.col("doc_id"), "tokmix") < F.col("rate"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"), F.sum("n_tok").alias("kept_tokens"))
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "lang_tokens",
            "rate",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
        )
        .orderBy("lang")
    )


# --- Q: PII scrubbing ----------------------------------------------------------


@query(
    "q_pii_scrub",
    oracle=r"""
    WITH dirty AS (
      SELECT doc_id,
        text
        || CASE WHEN doc_id % 5 = 0
                THEN ' contact user' || doc_id || '@example.com' ELSE '' END
        || CASE WHEN doc_id % 7 = 0
                THEN ' call +1 555 01' || (doc_id % 100) || '9' ELSE '' END
        || CASE WHEN doc_id % 11 = 0
                THEN ' from 10.0.' || (doc_id % 256) || '.1' ELSE '' END
        AS t
      FROM documents
    ),
    s1 AS (
      SELECT doc_id,
             len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
      FROM dirty
    ),
    s2 AS (
      SELECT doc_id, n_emails,
             len(regexp_extract_all(t1, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
             regexp_replace(t1, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS t2
      FROM s1
    )
    SELECT doc_id, n_emails, n_ips,
           len(regexp_extract_all(t2, '\+?[0-9][0-9()\-. ]{7,}[0-9]')) AS n_phones,
           regexp_replace(t2, '\+?[0-9][0-9()\-. ]{7,}[0-9]', '[PHONE]', 'g') AS clean
    FROM s2 ORDER BY doc_id
    """,
    doc="PII scrubbing: email / IPv4 / phone-shaped matches detected and "
    "redacted in order on progressively-scrubbed text (IPs scrub before "
    "the phone pattern, which would otherwise swallow them). Synthetic PII "
    "is appended deterministically per doc_id in BOTH engines; patterns "
    "use only Java-regex/RE2-agreeing syntax, so the full redacted text "
    "value-hash-matches (operators/text.py pii_scrub).",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import pii_scrub

    docs = load(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" call +1 555 01"), (F.col("doc_id") % 100).cast("string"), F.lit("9")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".1")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_scrub(dirty, "doc_id", "text").orderBy("doc_id")


# --- Q: table profiling --------------------------------------------------------


@query(
    "q_table_profile",
    oracle="""
    WITH p AS (
      SELECT 'o_custkey' AS "column", COUNT(*) AS n_rows,
             COUNT(*) - COUNT(o_custkey) AS n_nulls,
             COUNT(DISTINCT o_custkey) AS n_distinct,
             CAST(MIN(o_custkey) AS VARCHAR) AS min_s,
             CAST(MAX(o_custkey) AS VARCHAR) AS max_s
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
             COUNT(DISTINCT o_orderstatus),
             CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
             COUNT(DISTINCT o_totalprice),
             CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
             COUNT(DISTINCT o_orderpriority),
             CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
      FROM orders
    )
    SELECT * FROM p ORDER BY "column"
    """,
    doc="Table profiler: per-column null counts, exact distinct "
    "cardinalities, and min/max — every statistic an agg expression in a "
    "single aggregation, so the table is scanned once (exact distincts go "
    "through Spark's Expand rewrite with map-side partial dedupe; "
    "approx=True swaps in single-pass HLL++ — operators/profile.py), "
    "unpivoted to long format driver-side.",
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_table

    orders = load(spark, sf_dir, "orders")
    return profile_table(
        orders, ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    ).orderBy("column")


# --- Q: document chunking (RAG window preparation) ----------------------------

CHUNK_SIZE = 50
CHUNK_STRIDE = 25


@query(
    "q_doc_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    st AS (
      SELECT doc_id, toks, (i - 1) AS k, (i - 1) * {CHUNK_STRIDE} AS s
      FROM t, LATERAL (SELECT unnest(generate_series(1, greatest(len(toks), 1))) AS i) g
      WHERE (i - 1) * {CHUNK_STRIDE} < len(toks) OR (len(toks) = 0 AND i = 1)
    )
    SELECT doc_id, k AS chunk_idx,
           len(toks[s + 1 : s + {CHUNK_SIZE}]) AS n_tokens,
           array_to_string(toks[s + 1 : s + {CHUNK_SIZE}], ' ') AS chunk_text
    FROM st ORDER BY doc_id, chunk_idx
    """,
    doc="Retrieval-prep chunking: overlapping 50-token windows every 25 "
    "tokens (tail windows shorter), full chunk text value-checked — a "
    "pure map-side explode over the token array, one scan, no shuffle "
    "(operators/text.py chunk_documents).",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import chunk_documents

    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", CHUNK_SIZE, CHUNK_STRIDE).orderBy(
        "doc_id", "chunk_idx"
    )


# --- Q: bigram LM quality scores ----------------------------------------------


@query(
    "q_lm_bigram_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id, toks[i] AS a, toks[i + 1] AS b
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
    ),
    c AS (SELECT a, b, COUNT(*) AS bg_count FROM bg GROUP BY 1, 2)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(bg_count) AS BIGINT) AS sum_count,
           CAST(SUM(bg_count) AS DOUBLE) / COUNT(*) AS mean_count,
           CAST(MIN(bg_count) AS BIGINT) AS min_count
    FROM bg JOIN c USING (a, b)
    GROUP BY 1 ORDER BY bg.doc_id
    """,
    doc="CCNet-style LM quality signal with exact arithmetic: per document, "
    "the corpus frequency of its token bigrams (count sum / mean / min) — "
    "rare-bigram docs are the unusual ones. Integer counts + one exact "
    "division keep the score engine-identical where a log-prob would be "
    "ulp-hostage to libm (operators/text.py bigram_lm_scores).",
)
def q_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bigram_lm_scores

    docs = load(spark, sf_dir, "documents")
    return bigram_lm_scores(docs, "doc_id", "text").orderBy("doc_id")


# --- Q: fixed-quota sampling + deterministic shuffle --------------------------

QUOTA_N = 20


@query(
    "q_sample_fixed_n",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY {_SQL_U.format(salt="sample")}, doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang FROM r WHERE rn <= {QUOTA_N}
    ORDER BY doc_id
    """,
    doc="Fixed-budget quota sampling: EXACTLY 20 documents per language "
    "(the n smallest keyed hashes win) — binomial-free sample sizes for "
    "per-source mixing budgets, still a pure function of the key set "
    "(operators/sampling.py sample_exact_n).",
)
def q_sample_fixed_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import sample_exact_n

    docs = load(spark, sf_dir, "documents")
    return (
        sample_exact_n(docs, "doc_id", "lang", QUOTA_N)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@query(
    "q_deterministic_shuffle",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    ORDER BY {_SQL_U.format(salt="shuffle")}, doc_id
    LIMIT 25
    """,
    doc="Reproducible corpus shuffle: global order by keyed hash uniform — "
    "a permutation any engine reproduces, so re-runs read identical "
    "training batches; the head-25 probe pins the exact order "
    "(operators/sampling.py deterministic_shuffle).",
)
def q_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import deterministic_shuffle

    docs = load(spark, sf_dir, "documents")
    return deterministic_shuffle(docs, "doc_id").select("doc_id", "lang").limit(25)


# --- Q: salted two-phase aggregation (skew path correctness) ------------------


@query(
    "q_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           COUNT(*) AS count_rows,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="The skew-mitigation path is value-correct: two-phase salted "
    "aggregation (partial aggregate on (key, salt), decomposable "
    "re-combine per key — operators/skew.py) must equal the plain GROUP "
    "BY; decimal-exact sums make the equality bitwise regardless of how "
    "rows landed in salt buckets.",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg

    events = load(spark, sf_dir, "events")
    out = salted_agg(
        events,
        ["event_type"],
        {
            "sum_value": F.sum(F.col("value").cast("decimal(12,2)")),
            "count_rows": F.count(F.lit(1)),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
        },
        salt=16,
    )
    return out.select(
        "event_type",
        F.col("sum_value").cast("double").alias("sum_value"),
        "count_rows",
        "min_value",
        "max_value",
    ).orderBy("event_type")


@query(
    "q_salted_join",
    oracle="""
    WITH dim(event_type, category) AS (VALUES
      ('click', 'engagement'), ('view', 'engagement'),
      ('purchase', 'revenue'), ('error', 'ops'), ('login', 'session')
    )
    SELECT category, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events JOIN dim USING (event_type)
    GROUP BY category ORDER BY category
    """,
    doc="Salted-join correctness: the hot-key-scattered join (left side "
    "salted, right side replicated per salt bucket — operators/skew.py) "
    "must produce exactly the plain join's rows; aggregated with "
    "decimal-exact sums so the equality is bitwise.",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    events = load(spark, sf_dir, "events")
    dim = events.sparkSession.createDataFrame(
        [
            ("click", "engagement"),
            ("view", "engagement"),
            ("purchase", "revenue"),
            ("error", "ops"),
            ("login", "session"),
        ],
        ["event_type", "category"],
    )
    joined = salted_join(events, dim, on=["event_type"], how="inner", salt=8)
    return (
        joined.groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("category")
    )


# --- Q: duplicated-window fraction (substring-dedup signal) -------------------

DUPWIN_W = 8


@query(
    "q_dup_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    wins AS (
      SELECT doc_id,
             {" || ' ' || ".join(f"toks[i+{j}]" for j in range(DUPWIN_W))} AS win
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, len(toks) - {DUPWIN_W - 1})) AS i) s
    ),
    shared AS (
      SELECT win FROM (SELECT DISTINCT doc_id, win FROM wins)
      GROUP BY win HAVING COUNT(*) >= 2
    )
    SELECT w.doc_id,
           COUNT(*) AS n_windows,
           COUNT(s.win) AS n_dup_windows,
           CAST(COUNT(s.win) AS DOUBLE) / COUNT(*) AS dup_fraction
    FROM wins w LEFT JOIN shared s USING (win)
    GROUP BY 1 ORDER BY 1
    """,
    doc="Per-document duplicated-substring signal (Lee et al. 2021 "
    "approximated at fixed window length): fraction of a document's "
    f"{DUPWIN_W}-token windows whose exact text occurs in another document. "
    "Windows explode map-side; hot boilerplate windows collapse to one row "
    "in the shared-window table before the semi-join back, so frequency "
    "skew never replicates data. The standard 'mostly-copied document' "
    "quality gate of an LLM training pipeline.",
)
def q_dup_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        D.duplicated_window_fraction(docs, "doc_id", "text", DUPWIN_W)
        .orderBy("doc_id")
    )


# --- Q: exact duplicated-substring spans + keep-first scrub -------------------

SUBSTR_W = 8

_SUBSTR_WINS = f"""
    toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    wins AS (
      SELECT doc_id, i - 1 AS pos,
             {" || ' ' || ".join(f"toks[i+{j}]" for j in range(SUBSTR_W))} AS win
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, len(toks) - {SUBSTR_W - 1})) AS i) s
    )"""


@query(
    "q_substring_spans",
    bench=True,
    oracle=f"""
    WITH {_SUBSTR_WINS},
    dup AS (SELECT win FROM wins GROUP BY win HAVING COUNT(*) >= 2),
    flagged AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (win)),
    brks AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                             + {SUBSTR_W}
                  THEN 1 ELSE 0 END AS brk
      FROM flagged
    ),
    grp AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM brks
    )
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {SUBSTR_W} AS span_end,
           MAX(pos) + {SUBSTR_W} - MIN(pos) AS span_tokens
    FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start
    """,
    doc="Exact duplicated-substring spans (Lee et al. 2022 ExactSubstr, "
    f"distributed at window granularity {SUBSTR_W}): maximal token spans "
    "covered by windows whose exact text occurs >= 2 times corpus-wide "
    "(any position — intra-document repeats count). One hash-agg keyed by "
    "window text (hot boilerplate windows collapse to one row before the "
    "semi-join back), then a per-document gaps-and-islands merge — window "
    "state is one document's flagged positions, never the corpus "
    "(operators/substring.py).",
)
def q_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.substring import duplicated_spans

    docs = load(spark, sf_dir, "documents")
    return (
        duplicated_spans(docs, "doc_id", "text", SUBSTR_W)
        .orderBy("doc_id", "span_start")
    )


@query(
    "q_substring_scrub",
    oracle=f"""
    WITH {_SUBSTR_WINS},
    canon AS (
      SELECT doc_id, pos, win,
             ROW_NUMBER() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rk,
             COUNT(*) OVER (PARTITION BY win) AS occ
      FROM wins
    ),
    covered AS (
      SELECT DISTINCT doc_id, pos + j AS tpos
      FROM (SELECT doc_id, pos FROM canon WHERE occ >= 2 AND rk > 1) nc,
           LATERAL (SELECT unnest(generate_series(0, {SUBSTR_W - 1})) AS j) s
    ),
    toks2 AS (
      SELECT doc_id, i - 1 AS tpos, toks[i] AS tok
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
    )
    SELECT t.doc_id,
           COALESCE(string_agg(CASE WHEN c.tpos IS NULL THEN t.tok END, ' '
                               ORDER BY t.tpos), '') AS clean_text,
           COUNT(*) AS n_tokens,
           COUNT(c.tpos) AS n_removed
    FROM toks2 t LEFT JOIN covered c
      ON t.doc_id = c.doc_id AND t.tpos = c.tpos
    GROUP BY 1 ORDER BY 1
    """,
    doc="Keep-first removal of exact duplicated substrings: every token "
    "covered by a NON-canonical occurrence ((id, pos)-smallest survives) "
    f"of a duplicated {SUBSTR_W}-token window is cut and survivors "
    "reassemble in order. The canonical pick is a hash-agg struct-MIN, "
    "never a per-window sort; covered positions fan out map-side bounded "
    f"by {SUBSTR_W}; reassembly state is one document's own tokens "
    "(operators/substring.py scrub_duplicated_spans).",
)
def q_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.substring import scrub_duplicated_spans

    docs = load(spark, sf_dir, "documents")
    return scrub_duplicated_spans(docs, "doc_id", "text", SUBSTR_W).orderBy("doc_id")


# --- Q: boilerplate span scrub (paragraph dedup) ------------------------------

SPAN_K = 3
SPAN_MIN_DOCS = 3


@query(
    "q_boilerplate_scrub",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    spans AS (
      SELECT doc_id, i AS idx,
             array_to_string(toks[i * {SPAN_K} + 1 : i * {SPAN_K} + {SPAN_K}], ' ') AS span
      FROM toks,
           LATERAL (SELECT unnest(generate_series(0,
                    GREATEST(CAST(CEIL(len(toks) / {SPAN_K}.0) AS INT) - 1, 0))) AS i) s
      WHERE array_to_string(toks[i * {SPAN_K} + 1 : i * {SPAN_K} + {SPAN_K}], ' ') <> ''
    ),
    boiler AS (
      SELECT span FROM (SELECT DISTINCT doc_id, span FROM spans)
      GROUP BY span HAVING COUNT(*) >= {SPAN_MIN_DOCS}
    )
    SELECT s.doc_id,
           COALESCE(string_agg(CASE WHEN b.span IS NULL THEN s.span END, ' '
                               ORDER BY s.idx), '') AS clean_text,
           COUNT(*) AS n_spans,
           COUNT(b.span) AS n_removed
    FROM spans s LEFT JOIN boiler b USING (span)
    GROUP BY 1 ORDER BY 1
    """,
    doc="Boilerplate removal — the CCNet/RefinedWeb paragraph-dedup step "
    f"over fixed {SPAN_K}-token spans (this corpus has no newlines): a span "
    f"occurring in >= {SPAN_MIN_DOCS} distinct documents is dropped and the "
    "survivors reassemble in order. One hash-agg keyed by span text (hot "
    "spans collapse before the join back); reassembly state is one "
    "document's own spans, never the corpus.",
)
def q_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        D.scrub_repeated_spans(docs, "doc_id", "text", SPAN_K, SPAN_MIN_DOCS)
        .orderBy("doc_id")
    )


# --- Q: weighted sampling (Efraimidis-Spirakis) -------------------------------

WSAMPLE_N = 100


@query(
    "q_sample_weighted",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             pow({_SQL_U.format(salt="wsample")}, 1.0 / n_chars) AS es_key
      FROM documents WHERE n_chars > 0
    ),
    top AS (
      SELECT doc_id, n_chars FROM keyed
      ORDER BY es_key DESC, doc_id LIMIT {WSAMPLE_N}
    )
    SELECT doc_id, n_chars FROM top ORDER BY doc_id
    """,
    doc="Weighted sampling without replacement (Efraimidis-Spirakis A-ES): "
    "inclusion odds proportional to document length via es_key = u^(1/w) "
    "on the deterministic keyed uniform; top-n by es_key is the sample — "
    "one pass, no reservoir state, reproducible across engines and "
    "cluster layouts (operators/sampling.py weighted_sample_n).",
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_sample_n

    docs = load(spark, sf_dir, "documents")
    return (
        weighted_sample_n(docs, "doc_id", "n_chars", WSAMPLE_N)
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )


# --- Q: count-min frequency estimates ----------------------------------------

CM_PROBES = ("spark", "table", "value", "row", "the")


@query(
    "q_counts_cm",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents
    ),
    cells AS (
      SELECT j.g AS row_,
             ('0x' || substr(md5('cm' || j.g || ':' || tok), 1, 8))::BIGINT % 256 AS cell,
             COUNT(*) AS n
      FROM toks, (SELECT unnest(generate_series(0, 3)) AS g) j
      GROUP BY 1, 2
    ),
    probes(tok) AS (VALUES {", ".join(f"('{t}')" for t in CM_PROBES)}),
    addressed AS (
      SELECT p.tok, j.g AS row_,
             ('0x' || substr(md5('cm' || j.g || ':' || p.tok), 1, 8))::BIGINT % 256 AS cell
      FROM probes p, (SELECT unnest(generate_series(0, 3)) AS g) j
    ),
    est AS (
      -- LEFT join + COALESCE 0: an addressed cell no token hashed into
      -- counts 0, mirroring cm_estimate's empty-cell semantics
      SELECT a.tok, MIN(COALESCE(c.n, 0)) AS cm_est
      FROM addressed a LEFT JOIN cells c ON a.row_ = c.row_ AND a.cell = c.cell
      GROUP BY 1
    ),
    exact AS (
      SELECT tok, COUNT(*) AS exact_n FROM toks GROUP BY 1
    )
    SELECT e.tok, x.exact_n, e.cm_est
    FROM est e JOIN exact x USING (tok)
    ORDER BY tok
    """,
    doc="Count-min sketch frequency estimates: 4x256 md5-hashed counters "
    "(constant size, cell-wise mergeable across partitions/days) "
    "point-queried for probe tokens, reported beside exact counts — "
    "cm_est >= exact always, within +eps*N (operators/sketch.py "
    "cm_sketch/cm_estimate).",
)
def q_counts_cm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import tokens as tok_rows
    from ..operators.sketch import cm_estimate, cm_sketch

    docs = load(spark, sf_dir, "documents")
    toks = tok_rows(docs, "doc_id", "text")
    sketch = cm_sketch(toks, "tok")
    probes = spark.createDataFrame([(t,) for t in CM_PROBES], "tok string")
    est = cm_estimate(sketch, probes, "tok")
    exact = (
        toks.join(F.broadcast(probes), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return est.join(exact, "tok").select("tok", "exact_n", "cm_est").orderBy("tok")


# --- Q: Z-order layout clustering --------------------------------------------

from ..operators.zorder import scale16_sql, zorder_sql_expr  # noqa: E402

Z_BUCKET_SHIFT = 22  # 2^32 codes / 2^22 = 1024 z-range buckets

# the ORACLE shares the operator's own formula builders, so the SQL is the
# same arithmetic by construction, with DuckDB's '//' integer division
_ZX16 = scale16_sql("CAST(o_custkey AS DOUBLE)", "xmn", "xmx")
_ZY16 = scale16_sql("CAST(o_totalprice AS DOUBLE)", "ymn", "ymx")
_ZCODE = zorder_sql_expr("x16", "y16", "//")


@query(
    "q_zorder_layout",
    oracle=f"""
    WITH stats AS (
      SELECT CAST(MIN(o_custkey) AS DOUBLE) AS xmn, CAST(MAX(o_custkey) AS DOUBLE) AS xmx,
             CAST(MIN(o_totalprice) AS DOUBLE) AS ymn, CAST(MAX(o_totalprice) AS DOUBLE) AS ymx
      FROM orders
    ),
    scaled AS (
      SELECT {_ZX16} AS x16, {_ZY16} AS y16
      FROM orders, stats
    ),
    coded AS (SELECT {_ZCODE} AS z FROM scaled)
    SELECT z // {1 << Z_BUCKET_SHIFT} AS z_bucket,
           COUNT(*) AS n_rows,
           MIN(z) AS z_min, MAX(z) AS z_max
    FROM coded GROUP BY 1 ORDER BY 1
    """,
    doc="Z-order (Morton-curve) clustering: min-max scale (o_custkey, "
    "o_totalprice) to a 16-bit grid, interleave bits, bucket by z-range — "
    "each bucket is a tight rectangle in BOTH dimensions, the layout that "
    "makes file-level min/max skipping prune on either predicate "
    "(operators/zorder.py; write via repartitionByRange(z)).",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.zorder import with_zorder

    orders = load(spark, sf_dir, "orders")
    z = with_zorder(orders, "o_custkey", "o_totalprice")
    return (
        z.groupBy((F.col("z") / (1 << Z_BUCKET_SHIFT)).cast("bigint").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
        )
        .orderBy("z_bucket")
    )


# --- Q: histogram quantile sketch ---------------------------------------------

HQ_QUANTILES = (0.5, 0.9, 0.99)


@query(
    "q_quantile_sketch",
    oracle="""
    WITH v AS (SELECT value AS x, event_id FROM events),
    b AS (SELECT min(x) AS lo, max(x) AS hi, COUNT(*) AS nn FROM v),
    p AS (SELECT lo, (hi - lo) / 256 AS w, nn FROM b),
    bk AS (
      SELECT CAST(CASE WHEN w = 0 THEN 0
             ELSE least(floor((x - lo) / w), 255) END AS INTEGER) AS bucket
      FROM v, p
    ),
    counts AS (SELECT bucket, COUNT(*) AS n FROM bk GROUP BY bucket),
    cum AS (
      SELECT bucket, n,
             CAST(SUM(n) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
      FROM counts
    ),
    qs AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS quantile),
    tgt AS (
      SELECT quantile, CAST(ceil(quantile * nn) AS BIGINT) AS target, lo, w
      FROM qs, p
    ),
    hits AS (
      SELECT quantile, target, bucket, n, c, lo, w,
             row_number() OVER (PARTITION BY quantile ORDER BY bucket) AS rn
      FROM tgt JOIN cum ON c >= target
    ),
    ranked AS (SELECT x, row_number() OVER (ORDER BY x, event_id) AS rk FROM v)
    SELECT h.quantile, h.target, h.bucket,
           CASE WHEN h.w = 0 THEN h.lo
                ELSE h.lo + h.w * (CAST(h.bucket AS DOUBLE)
                  + CAST(h.target - (h.c - h.n) AS DOUBLE) / CAST(h.n AS DOUBLE))
           END AS est,
           r.x AS exact
    FROM hits h JOIN ranked r ON r.rk = h.target
    WHERE h.rn = 1
    ORDER BY h.quantile
    """,
    doc="Mergeable equi-width histogram quantile sketch (256 counters): "
    "P50/P90/P99 of events.value estimated by cumulative-count walk + "
    "in-bucket linear interpolation, reported beside the exact rank-"
    "selected value so the sketch error (<= one bucket width) is visible. "
    "Bucket counts merge cell-wise across partitions/days like the KMV "
    "and count-min sketches; every interpolation step is fixed-order IEEE "
    "double, so the DuckDB oracle reproduces the estimate bit-exactly "
    "(operators/sketch.py histogram_quantiles).",
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import distributed_prefix_sum
    from ..operators.sketch import histogram_quantiles

    events = load(spark, sf_dir, "events")
    hq = histogram_quantiles(events, "value", HQ_QUANTILES)
    # Exact-rank comparison side: global rank in (value, event_id) order via
    # the two-phase distributed prefix sum (range-shuffle once, per-partition
    # window, #partitions-row offset pass) — NOT row_number() over an
    # unpartitioned Window, which would sort the whole events table on one
    # task. The ranked relation then streams against the <=3-row broadcast
    # sketch output, so no further shuffle touches the data.
    ranked = distributed_prefix_sum(
        events.select("value", "event_id"),
        ["value", "event_id"],
        F.lit(1),
        out_col="rk",
    )
    return (
        ranked.join(F.broadcast(hq), ranked["rk"] == hq["target"])
        .select(
            "quantile", "target", "bucket", "est", F.col("value").alias("exact")
        )
        .orderBy("quantile")
    )


# --- Q: end-to-end training-data pipeline funnel ------------------------------

from .dedup import JACCARD_THRESHOLD, SHINGLE_N, _PERMS_VALUES  # noqa: E402

_E2E_SHINGLES_KEPT = """
    ktoks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM exact_kept
    ),
    ksh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM ktoks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) s
    )
"""


@query(
    "q_pipeline_end2end",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             COALESCE(list_max(list_transform(toks, t -> length(t))), 0) AS max_word_len,
             CASE WHEN len(toks) <= 5000 THEN
               list_max(list_transform(list_distinct(toks),
                 t -> len(list_filter(toks, x -> x = t)))) / NULLIF(len(toks), 0)
             END AS rep_ratio,
             len(list_filter(toks, t -> list_contains(
               ['a','an','and','in','is','of','the','to'], t))) / NULLIF(len(toks), 0) AS stopword_ratio,
             len(list_distinct(toks)) / NULLIF(len(toks), 0) AS unique_ratio
      FROM t
    ),
    keepers AS (
      SELECT doc_id FROM m
      WHERE NOT (n_words < 5 OR n_words > 5000 OR max_word_len > 20
                 OR rep_ratio > 0.25 OR stopword_ratio < 0.01 OR unique_ratio < 0.3)
    ),
    kept AS (SELECT d.* FROM documents d JOIN keepers USING (doc_id)),
    canon AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
    exact_kept AS (SELECT k.* FROM kept k JOIN canon USING (doc_id)),
    {_E2E_SHINGLES_KEPT},
    perms(i, a, b) AS (VALUES {_PERMS_VALUES}),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
      FROM ksh
    ),
    sig AS (
      SELECT doc_id, i, MIN((a * h + b) % 2147483647) AS mh
      FROM hashed CROSS JOIN perms
      GROUP BY 1, 2
    ),
    bands AS (
      SELECT doc_id, i // 4 AS band,
             string_agg(mh::VARCHAR, ',' ORDER BY i) AS bkey
      FROM sig GROUP BY 1, 2
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b USING (band, bkey)
      WHERE a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ksh GROUP BY doc_id),
    inter AS (
      SELECT c.a_id, c.b_id, COUNT(*) AS n_common
      FROM cands c
      JOIN ksh a ON a.doc_id = c.a_id
      JOIN ksh b ON b.doc_id = c.b_id AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    nd AS (
      SELECT DISTINCT i.b_id AS doc_id
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.a_id
      JOIN sizes sb ON sb.doc_id = i.b_id
      WHERE i.n_common / (sa.n_sh + sb.n_sh - i.n_common) >= {JACCARD_THRESHOLD}
    ),
    final AS (
      SELECT doc_id FROM exact_kept
      WHERE doc_id NOT IN (SELECT doc_id FROM nd)
    ),
    tok4 AS (
      SELECT doc_id,
             CAST(COALESCE(list_sum(list_transform(toks, t -> (len(t) + 3) // 4)), 0) AS BIGINT) AS est
      FROM t
    )
    SELECT * FROM (
      SELECT 1 AS stage_no, 'raw' AS stage, COUNT(*) AS n_docs,
             CAST(COALESCE(SUM(est), 0) AS BIGINT) AS est_bpe_tokens FROM tok4
      UNION ALL
      SELECT 2, 'quality', COUNT(*), CAST(COALESCE(SUM(est), 0) AS BIGINT)
      FROM tok4 JOIN keepers USING (doc_id)
      UNION ALL
      SELECT 3, 'exact_dedup', COUNT(*), CAST(COALESCE(SUM(est), 0) AS BIGINT)
      FROM tok4 JOIN (SELECT doc_id FROM exact_kept) ek USING (doc_id)
      UNION ALL
      SELECT 4, 'near_dedup', COUNT(*), CAST(COALESCE(SUM(est), 0) AS BIGINT)
      FROM tok4 JOIN final USING (doc_id)
    ) ORDER BY stage_no
    """,
    doc="The capstone composition: one pass of a training-data curation "
    "pipeline — C4/Gopher quality gate, exact content dedup (min-id "
    "canonical per md5), MinHash-LSH near-dedup with the min-neighbor drop "
    "rule (drop every doc with a verified near-duplicate of smaller id "
    "among exact-dedup survivors), and BPE-ish token accounting — reported "
    "as a 4-row funnel (stage, n_docs, est_bpe_tokens). Every stage is the "
    "already-proven catalog operator (operators/text.quality_filter, "
    "operators/dedup.minhash_near_dups); the oracle replays the whole "
    "composition, so the hash match certifies the stages COMPOSE correctly, "
    "not just pass individually. Scale shape: each stage is one scan over "
    "the shrinking survivor set; the only data-sized shuffles are the "
    "md5 groupBy and the LSH band self-join, both keyed and skew-safe.",
)
def q_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bpe_token_estimate, quality_filter

    docs = load(spark, sf_dir, "documents")
    # every funnel stage is consumed twice (its own survivor count + the
    # next stage's input) and exact_kept three times (count, near-dup
    # pairs, final anti-join) — persist them so each stage computes once;
    # at scale this is the standard materialize-between-stages trade of a
    # curation pipeline, not a local-mode hack
    base = pin(docs.select(
        "doc_id", "text", bpe_token_estimate("text").alias("est")
    ))
    keep_ids = (
        quality_filter(docs, "doc_id", "text").filter("keep").select("doc_id")
    )
    kept = pin(base.join(keep_ids, "doc_id"))
    canon_ids = (
        kept.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact_kept = pin(kept.join(canon_ids, "doc_id"))
    pairs = D.minhash_near_dups(
        exact_kept.select("doc_id", "text"), "doc_id", "text", SHINGLE_N, JACCARD_THRESHOLD
    )
    dropped = pairs.select(F.col("b_id").alias("doc_id")).dropDuplicates()
    final = exact_kept.join(dropped, "doc_id", "left_anti")

    def stage(df: DataFrame, no: int, name: str) -> DataFrame:
        return (
            df.groupBy()
            .agg(
                F.count("*").alias("n_docs"),
                F.coalesce(F.sum("est"), F.lit(0)).cast("bigint").alias("est_bpe_tokens"),
            )
            .select(
                F.lit(no).alias("stage_no"),
                F.lit(name).alias("stage"),
                "n_docs",
                "est_bpe_tokens",
            )
        )

    return (
        stage(base, 1, "raw")
        .unionByName(stage(kept, 2, "quality"))
        .unionByName(stage(exact_kept, 3, "exact_dedup"))
        .unionByName(stage(final, 4, "near_dedup"))
        .orderBy("stage_no")
    )


# --- Q: grouped KMV cardinality (distinct users per event type) ---------------

GKMV_K = 32


@query(
    "q_distinct_kmv_by_group",
    oracle=f"""
    WITH hs AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    r AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM hs
    )
    SELECT event_type,
           LEAST({GKMV_K}, nd) AS k_used,
           h AS kth_min,
           CASE WHEN nd < {GKMV_K} THEN nd::DOUBLE
                ELSE ({GKMV_K} - 1) * 4294967296.0 / h END AS est_distinct
    FROM r WHERE rn = LEAST({GKMV_K}, nd)
    ORDER BY event_type
    """,
    doc="Per-group KMV distinct-count sketch — distinct users per event "
    f"type via each group's {GKMV_K} smallest md5-derived hashes. The "
    "grouped cardinality question every pipeline dashboard asks, answered "
    "WITHOUT a per-group sort task: per-group ranks come from the "
    "distributed prefix-sum grouped rank (operators/robust.py), so five "
    "event types over 100 TB never put 20 TB on one core "
    "(operators/sketch.py grouped_kmv_estimate).",
)
def q_distinct_kmv_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import grouped_kmv_estimate

    events = load(spark, sf_dir, "events")
    return grouped_kmv_estimate(events, "event_type", "user_id", GKMV_K).orderBy(
        "event_type"
    )


# --- Q: DSIR importance resampling --------------------------------------------

DSIR_N = 100
DSIR_BUCKETS = 256


@query(
    "q_dsir_resample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    occ AS (
      SELECT doc_id, lang = 'en' AS is_target,
             ('0x' || substr(md5('dsir:' || ' ' || toks[i] || ' ' || toks[i+1]), 1, 8))::BIGINT
               % {DSIR_BUCKETS} AS bucket
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) s
    ),
    counts AS (
      SELECT bucket, COUNT(*) AS r_cnt, COUNT(*) FILTER (is_target) AS t_cnt
      FROM occ GROUP BY 1
    ),
    masses AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(t_cnt) AS BIGINT) AS t_mass,
             CAST(SUM(r_cnt) AS BIGINT) AS r_mass
      FROM occ JOIN counts USING (bucket) GROUP BY 1
    ),
    weighted AS (
      SELECT doc_id, n_bigrams, t_mass, r_mass,
             CAST(t_mass + 1 AS DOUBLE) / CAST(r_mass + 1 AS DOUBLE) AS weight
      FROM masses
    ),
    top AS (
      SELECT * FROM weighted
      ORDER BY pow({_SQL_U.format(salt="dsir")}, 1.0 / weight) DESC, doc_id
      LIMIT {DSIR_N}
    )
    SELECT doc_id, n_bigrams, t_mass, r_mass, weight FROM top ORDER BY doc_id
    """,
    doc="DSIR-inspired data selection: hashed-bigram bucket counts of the "
    "target subset (lang='en') vs the raw corpus give each document an "
    "exact-integer count-mass weight (t_mass+1)/(r_mass+1) — a heuristic "
    "inspired by Xie et al. 2023, not the paper's log-ratio estimator "
    "(that one is q_dsir_logratio); the corpus is then resampled by "
    "deterministic A-ES with inclusion odds proportional to the weight. "
    f"One map-side feature explode, one {DSIR_BUCKETS}-key aggregate "
    "(both target and corpus counts in the same pass), broadcast join "
    "back, one per-doc fold — no Python, no vocabulary shuffle "
    "(operators/dsir.py).",
)
def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import dsir_resample

    docs = load(spark, sf_dir, "documents")
    return dsir_resample(
        docs, "doc_id", "text", F.col("lang") == "en", DSIR_N, DSIR_BUCKETS
    ).orderBy("doc_id")


# --- Q: paper-faithful DSIR log-ratio selection ---------------------------------


@query(
    "q_dsir_logratio",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    occ AS (
      SELECT doc_id, lang = 'en' AS is_target,
             ('0x' || substr(md5('dsir:' || ' ' || toks[i] || ' ' || toks[i+1]), 1, 8))::BIGINT
               % {DSIR_BUCKETS} AS bucket
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) s
    ),
    counts AS (
      SELECT bucket, COUNT(*) AS r_cnt, COUNT(*) FILTER (is_target) AS t_cnt
      FROM occ GROUP BY 1
    ),
    totals AS (
      SELECT CAST(SUM(r_cnt) AS BIGINT) AS r_tot,
             CAST(SUM(t_cnt) AS BIGINT) AS t_tot
      FROM counts
    ),
    lr AS (
      SELECT bucket,
             CAST(round(
               (ln(t_cnt + 1) - ln(r_cnt + 1)
                + ln(r_tot + {DSIR_BUCKETS}) - ln(t_tot + {DSIR_BUCKETS}))
               * 1000000, 0) AS BIGINT) AS lr_q
      FROM counts CROSS JOIN totals
    ),
    docw AS (
      SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(lr_q) AS BIGINT) AS logw_q
      FROM occ JOIN lr USING (bucket) GROUP BY 1
    ),
    top AS (
      SELECT doc_id, n_bigrams, logw_q, logw_q / 1000000.0 AS logw
      FROM docw ORDER BY logw_q DESC, doc_id LIMIT {DSIR_N}
    )
    SELECT doc_id, n_bigrams, logw_q, logw FROM top ORDER BY doc_id
    """,
    doc="Paper-faithful DSIR selection (Xie et al. 2023 §2.2): per-document "
    "importance log-weight = Σ occurrences ln(p_target/p_raw) over "
    f"add-one-smoothed hashed-bigram LMs ({DSIR_BUCKETS} buckets); top-"
    f"{DSIR_N} documents by log-weight. Transcendentals run once per "
    "BUCKET, quantized to integer micro-nats, and each document's score "
    "is an order-free bigint sum — engine- and layout-deterministic "
    "float discipline (operators/dsir.py dsir_logratio_weights).",
)
def q_dsir_logratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import dsir_logratio_weights

    docs = load(spark, sf_dir, "documents")
    w = dsir_logratio_weights(
        docs, "doc_id", "text", F.col("lang") == "en", DSIR_BUCKETS
    )
    return (
        w.orderBy(F.desc("logw_q"), "doc_id")
        .limit(DSIR_N)
        .select("doc_id", "n_bigrams", "logw_q", "logw")
        .orderBy("doc_id")
    )


# --- Q: quality-gate PR curve --------------------------------------------------


@query(
    "q_quality_pr_curve",
    oracle="""
    WITH labeled AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    groups AS (
      SELECT score, COUNT(*) AS n_at, SUM(pos) AS pos_at
      FROM labeled GROUP BY 1
    ),
    cum AS (
      SELECT score,
             CAST(SUM(n_at) OVER w AS BIGINT) AS cum_n,
             CAST(SUM(pos_at) OVER w AS BIGINT) AS cum_pos
      FROM groups
      WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
    ),
    tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS total_pos FROM labeled)
    SELECT score, cum_n, cum_pos,
           cum_pos / cum_n AS prec,
           cum_pos / total_pos AS recall
    FROM cum CROSS JOIN tot
    ORDER BY score DESC
    """,
    doc="Threshold sweep of the length gate against the lang='en' reference "
    "label: precision/recall at every distinct score threshold (keep-if-"
    "score>=s policy). Per-score aggregation first (one corpus shuffle), "
    "then the deterministic distributed prefix sum over the score-group "
    "summary only — the filter-calibration curve without a corpus-sized "
    "sort task (operators/evalcurves.py pr_curve).",
)
def q_quality_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evalcurves import pr_curve

    docs = load(spark, sf_dir, "documents")
    return pr_curve(docs, "n_chars", F.col("lang") == "en").orderBy(
        F.desc("score")
    )


# --- Q: exact ROC-AUC of the length gate ---------------------------------------


@query(
    "q_score_auc",
    oracle="""
    WITH labeled AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    groups AS (
      SELECT score, COUNT(*) AS n_at, SUM(pos) AS pos_at
      FROM labeled GROUP BY 1
    ),
    cum AS (
      SELECT score, n_at, pos_at,
             SUM(n_at) OVER (ORDER BY score ASC ROWS UNBOUNDED PRECEDING) AS cum_n
      FROM groups
    ),
    agg AS (
      SELECT CAST(SUM(n_at) AS BIGINT) AS n,
             CAST(SUM(pos_at) AS BIGINT) AS n_pos,
             CAST(SUM(pos_at * (2 * cum_n - n_at + 1)) AS BIGINT) AS ranksum2
      FROM cum
    )
    SELECT n, n_pos, n - n_pos AS n_neg,
           ranksum2 - n_pos * (n_pos + 1) AS u2,
           (ranksum2 - n_pos * (n_pos + 1)) / (2 * n_pos * (n - n_pos)) AS auc
    FROM agg
    """,
    doc="Exact ROC-AUC of the length score against the lang='en' label: "
    "Mann-Whitney U with average-rank ties, all-integer until one final "
    "division (u2 = 2U is exact bigint). Per-score aggregation + one "
    "distributed prefix sum over the score-group summary — AUC over "
    "100 TB without a global sort (operators/evalcurves.py roc_auc).",
)
def q_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evalcurves import roc_auc

    docs = load(spark, sf_dir, "documents")
    return roc_auc(docs, "n_chars", F.col("lang") == "en")


# --- Q: length-balanced bin assembly -------------------------------------------

BIN_K = 8


@query(
    "q_balanced_bins",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, n_chars AS weight,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rnk
      FROM documents
    ),
    binned AS (
      SELECT doc_id, weight, CAST((rnk - 1) % {BIN_K} AS INTEGER) AS bin
      FROM ranked
    )
    SELECT bin, COUNT(*) AS n_rows,
           CAST(SUM(weight) AS BIGINT) AS total_weight,
           MAX(weight) AS max_weight
    FROM binned GROUP BY bin ORDER BY bin
    """,
    doc="Straggler-free batch assembly: documents assigned to 8 bins "
    "round-robin in descending length order (the distributed LPT "
    "heuristic) — per-bin totals stay balanced under heavy-tailed "
    "lengths, unlike hash assignment. The global rank is the "
    "deterministic distributed prefix sum, never a single-task sort "
    "(operators/binning.py).",
)
def q_balanced_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.binning import balanced_bin_summary

    docs = load(spark, sf_dir, "documents")
    return balanced_bin_summary(docs, "doc_id", "n_chars", BIN_K).orderBy("bin")


# --- Q: deterministic training-shard export ------------------------------------

SHARD_BINS = 8


@query(
    "q_shard_manifest",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS n_tok FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_tok,
             ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id ASC) AS rnk
      FROM t
    ),
    shards AS (
      SELECT doc_id, n_tok,
             CAST((rnk - 1) % {SHARD_BINS} AS INTEGER) AS bin,
             (rnk - 1) // {SHARD_BINS} + 1 AS seq
      FROM ranked
    )
    SELECT bin, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(MAX(seq) AS BIGINT) AS max_seq,
           CAST(SUM(seq * doc_id) AS BIGINT) AS order_sig
    FROM shards GROUP BY bin ORDER BY bin
    """,
    doc="Training-shard manifest over the WRITTEN layout: documents are "
    "exported once as 8 length-balanced parquet shards (one directory and "
    "one file per bin, rows in descending-token LPT order with a stored "
    "seq — sources/shards.py), then the manifest is computed by READING "
    "the shards back: per-bin doc/token totals, the max sequence number, "
    "and an order signature sum(seq*doc_id) binding each document to its "
    "position. The oracle replays the assignment formula from the base "
    "table, so a wrong write (lost rows, misrouted bins, scrambled seq) "
    "hash-mismatches. Plan: one range exchange for the global rank, one "
    "routing exchange, in-task sort — no single-task global sort.",
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.shards import ensure_training_shards

    toks = F.size(F.expr("filter(split(text, ' '), t -> t != '')")).cast("bigint")
    sh = ensure_training_shards(
        spark, sf_dir, "documents", "doc_id", toks, SHARD_BINS, carry=("text", "lang")
    )
    return (
        sh.groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("weight").alias("n_tokens"),
            F.max("seq").alias("max_seq"),
            F.sum(F.col("seq") * F.col("doc_id")).alias("order_sig"),
        )
        .orderBy("bin")
    )


# --- Q: per-domain quota (domain cap, best-quality first) -----------------------

QUOTA_PER_SOURCE = 3


@query(
    "q_domain_quota",
    oracle=f"""
    SELECT source, doc_id, n_chars, rnk
    FROM (
      SELECT source, doc_id, n_chars,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
             ) AS INTEGER) AS rnk
      FROM documents
    )
    WHERE rnk <= {QUOTA_PER_SOURCE}
    ORDER BY source, rnk
    """,
    doc="Domain cap: at most 3 documents per source, best quality "
    "(longest) first — the per-domain quota step of web-corpus curation "
    "(one shuffle on the domain key, rank inside partitions; "
    "operators/topk.py top_k_per_group).",
)
def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import top_k_per_group

    docs = load(spark, sf_dir, "documents")
    return (
        top_k_per_group(
            docs,
            ["source"],
            [F.desc("n_chars"), F.asc("doc_id")],
            QUOTA_PER_SOURCE,
            rank_col="rnk",
            keep_rank=True,
        )
        .select("source", "doc_id", "n_chars", "rnk")
        .orderBy("source", "rnk")
    )


# --- Q: per-language quality-weighted subsample ----------------------------------

GW_N = 20


@query(
    "q_sample_weighted_by_lang",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             pow({_SQL_U.format(salt="wsample")}, 1.0 / n_chars) AS es_key
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY es_key DESC, doc_id
             ) AS rn
      FROM keyed
    )
    SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= {GW_N}
    ORDER BY doc_id
    """,
    doc="Per-stratum weighted sampling without replacement: 20 documents "
    "per language, inclusion odds proportional to length (A-ES es_key = "
    "u^(1/w) on the deterministic keyed uniform, per-group top-n) — the "
    "quality-weighted per-language subsample of a multilingual corpus "
    "(operators/sampling.py weighted_sample_n_per_group).",
)
def q_sample_weighted_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_sample_n_per_group

    docs = load(spark, sf_dir, "documents")
    return (
        weighted_sample_n_per_group(docs, "doc_id", "lang", "n_chars", GW_N)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# --- Q: tokenizer fertility (byte-level encode in the catalog) -----------------


def _tokenizer_fertility_oracle(n_merges: int) -> str:
    """Byte-level replay chain -> the encoded distinct-PRETOKEN table, then
    per-language fertility accounting over the join back to documents. The
    corpus is ASCII, so a pretoken's mapped symbol length equals its raw
    length (1 byte = 1 mapped char)."""
    from ..operators.text import PRETOKEN_REGEX

    regex_sql = PRETOKEN_REGEX.replace("'", "''")
    parts = _bpe_byte_chain_parts(n_merges)
    return (
        "WITH " + ",\n".join(parts) + f""",
    enc AS (
      SELECT word, len(list_filter(string_split(s, '·'), x -> x <> '')) AS n_tok
      FROM s{n_merges}
    ),
    docpre AS (
      SELECT doc_id, lang, unnest(regexp_extract_all(text, '{regex_sql}')) AS word
      FROM documents
    ),
    j AS (
      SELECT lang, doc_id, n_tok, len(word) AS wchars
      FROM docpre JOIN enc USING (word)
    )
    SELECT lang,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           COUNT(*) AS n_pretokens,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(wchars) AS BIGINT) AS n_chars,
           CAST(SUM(n_tok) AS BIGINT) / COUNT(*) AS tokens_per_pretoken,
           CAST(SUM(wchars) AS BIGINT) / CAST(SUM(n_tok) AS BIGINT) AS chars_per_token
    FROM j GROUP BY lang ORDER BY lang"""
    )


@query(
    "q_tokenizer_fertility",
    oracle=_tokenizer_fertility_oracle(BPE_MERGES),
    doc="Tokenizer fertility report: train the byte-level (GPT-2 "
    f"formulation) BPE model ({BPE_MERGES} merges), encode the corpus "
    "with the shape-memoized byte-level encoder, and report per-language "
    "token economics — tokens per pretoken (fertility) and characters "
    "per token (compression) — the numbers a multilingual pipeline "
    "checks before committing to a tokenizer (a tokenizer that is cheap "
    "on English and 2x-fertile on another language silently skews a "
    "token-budgeted mixture). Spark side: operators/bpe.py "
    "train_bpe_bytelevel + bpe_encode_bytelevel; the oracle replays "
    "training AND encoding over the distinct-pretoken table in SQL. "
    "Fractions are single BIGINT/BIGINT divisions (bit-exact).",
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_encode_bytelevel, train_bpe_bytelevel
    from ..operators.text import pretokens_col

    docs = load(spark, sf_dir, "documents")
    merges = train_bpe_bytelevel(docs, "text", BPE_MERGES, batch=BPE_BATCH)
    enc = bpe_encode_bytelevel(
        docs.select("doc_id", "lang", "text"), "text", merges
    )
    rows = enc.select(
        "doc_id",
        "lang",
        F.size("bpe_tokens").cast("long").alias("n_tok"),
        F.aggregate(
            "bpe_tokens", F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        ).alias("n_chars"),
        F.size(pretokens_col("text")).cast("long").alias("n_pre"),
    )
    return (
        rows.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_pre").alias("n_pretokens"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "n_pretokens",
            "n_tokens",
            "n_chars",
            (F.col("n_tokens") / F.col("n_pretokens")).alias(
                "tokens_per_pretoken"
            ),
            (F.col("n_chars") / F.col("n_tokens")).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


# --- Q: context-window chunking (token-budgeted document splitting) ------------

CHUNK_BUDGET = 64  # power of two: floor(pre/64) is exact in binary FP


def _context_chunks_oracle(n_merges: int) -> str:
    parts = _bpe_chain_parts(n_merges)
    return (
        "WITH " + ",\n".join(parts) + f""",
    enc AS (
      SELECT word, len(list_filter(string_split(s, '·'), x -> x <> '')) AS n_tok
      FROM s{n_merges}
    ),
    dw AS (
      SELECT doc_id, i - 1 AS pos, toks[i] AS word
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
    ),
    c AS (
      SELECT doc_id, pos, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
      FROM dw JOIN enc USING (word)
    )
    SELECT doc_id,
           CAST(floor(pre / {CHUNK_BUDGET}) AS BIGINT) AS chunk_id,
           COUNT(*) AS n_words,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(pos) AS start_pos,
           MAX(pos) AS end_pos
    FROM c GROUP BY 1, 2 ORDER BY doc_id, chunk_id"""
    )


@query(
    "q_context_chunks",
    oracle=_context_chunks_oracle(BPE_MERGES),
    doc="Context-window chunking: split every document into chunks of "
    f"~{CHUNK_BUDGET} REAL tokenizer tokens (trained BPE model), never "
    "splitting inside a word — word w goes to chunk "
    f"floor(tokens_before_w / {CHUNK_BUDGET}), the streaming-friendly "
    "greedy rule (a chunk overflows only by its last word's tokens). "
    "Per-word token weights come from the shape-memoized encoder over "
    "the DISTINCT word table; the cumulative sum is a per-document "
    "window (no global state), so the operator is one shuffle keyed by "
    "doc_id. The oracle replays training + encoding + the same window "
    "in SQL. Budget is a power of two so the chunk-id floor is exact "
    "in binary floating point across engines.",
)
def q_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.bpe import bpe_encode, train_bpe_batched

    docs = load(spark, sf_dir, "documents")
    merges = train_bpe_batched(docs, "text", BPE_MERGES, batch=BPE_BATCH)
    words = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split("text", " "), lambda w: w != "")
        ).alias("pos", "word"),
    )
    shapes = words.select("word").distinct()
    weights = bpe_encode(shapes, "word", merges).select(
        "word", F.size("bpe_tokens").cast("long").alias("n_tok")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = words.join(weights, "word").select(
        "doc_id",
        "pos",
        "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("pre"),
    )
    return (
        c.groupBy(
            "doc_id",
            F.floor(F.col("pre") / CHUNK_BUDGET).alias("chunk_id"),
        )
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("pos").alias("start_pos"),
            F.max("pos").alias("end_pos"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# --- Q: label propagation over the rare-shingle graph -------------------------

LP_N = 4  # shingle width for the similarity graph
LP_DF_CAP = 4  # rare = document frequency in [2, cap]; bounds block size
LP_SEED_MOD = 10  # doc_id % 10 == 0 plays the labeled seed set
LP_ROUNDS = 3


def _labelprop_oracle() -> str:
    shingle = " || ' ' || ".join(
        "toks[i]" if k == 0 else f"toks[i+{k}]" for k in range(LP_N)
    )
    sql = f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, {shingle} AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - {LP_N - 1})) AS i) s
    ),
    freq AS (SELECT shingle, COUNT(*) AS c FROM sh GROUP BY 1),
    rare AS (SELECT shingle FROM freq WHERE c BETWEEN 2 AND {LP_DF_CAP}),
    e AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM sh a JOIN sh b USING (shingle) JOIN rare USING (shingle)
      WHERE a.doc_id <> b.doc_id
    ),
    l0 AS (
      SELECT doc_id AS id, lang AS label, 0 AS round
      FROM documents WHERE doc_id % {LP_SEED_MOD} = 0
    )"""
    for r in range(1, LP_ROUNDS + 1):
        sql += f""",
    v{r} AS (
      SELECT e.dst AS id, l.label, COUNT(*) AS c
      FROM e JOIN l{r - 1} l ON l.id = e.src
      GROUP BY 1, 2
    ),
    n{r} AS (
      SELECT id, label, {r} AS round FROM (
        SELECT id, label,
               ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, label) AS rn
        FROM v{r}
      ) WHERE rn = 1 AND id NOT IN (SELECT id FROM l{r - 1})
    ),
    l{r} AS (SELECT * FROM l{r - 1} UNION ALL SELECT * FROM n{r})"""
    sql += f"""
    SELECT id AS doc_id, label, round FROM l{LP_ROUNDS} ORDER BY doc_id"""
    return sql


@query(
    "q_label_propagation",
    oracle=_labelprop_oracle(),
    bench=True,
    doc="Semi-supervised label propagation: 10% of documents are labeled "
    f"seeds (lang), the graph connects documents sharing a rare {LP_N}-gram "
    f"(df in [2, {LP_DF_CAP}] — block size bounded by construction), and "
    f"{LP_ROUNDS} synchronous majority-vote rounds (count DESC, label ASC "
    "ties) spread labels outward; output is (doc_id, label, round "
    "assigned). Deterministic by clamped seeds + synchronous rounds; the "
    "oracle replays every round as chained CTEs. operators/labelprop.py.",
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.labelprop import propagate_labels, rare_shingle_edges

    docs = load(spark, sf_dir, "documents")
    edges = rare_shingle_edges(docs, "doc_id", "text", n=LP_N, df_cap=LP_DF_CAP)
    seeds = docs.filter(F.col("doc_id") % LP_SEED_MOD == 0).select(
        F.col("doc_id").alias("id"), F.col("lang").alias("label")
    )
    out = propagate_labels(edges, seeds, LP_ROUNDS)
    return out.select(
        F.col("id").alias("doc_id"), "label", "round"
    ).orderBy("doc_id")


# --- Q: connected components via large-star/small-star ------------------------

CC_BLOCK = 64  # chain block length — the adversarial-diameter ingredient
CC_CROSS_MOD = 160  # sparse cross-block bridges: doc_id % 160 == 0 links +64


def _components_star_oracle() -> str:
    return f"""
    WITH RECURSIVE chain AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM documents a JOIN documents b
        ON b.doc_id = a.doc_id + 1 AND a.doc_id // {CC_BLOCK} = b.doc_id // {CC_BLOCK}
    ),
    cross_edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM documents a JOIN documents b
        ON b.doc_id = a.doc_id + {CC_BLOCK} AND a.doc_id % {CC_CROSS_MOD} = 0
    ),
    alledges AS (SELECT src, dst FROM chain UNION SELECT src, dst FROM cross_edges),
    sym AS (
      SELECT src AS s, dst AS d FROM alledges
      UNION
      SELECT dst AS s, src AS d FROM alledges
    ),
    reach(s, d) AS (
      SELECT s, s FROM sym
      UNION
      SELECT r.s, e2.d FROM reach r JOIN sym e2 ON r.d = e2.s
    ),
    comp AS (SELECT s AS node, MIN(d) AS component FROM reach GROUP BY s)
    SELECT component, CAST(COUNT(*) AS BIGINT) AS size
    FROM comp GROUP BY 1 ORDER BY 1"""


@query(
    "q_components_star",
    oracle=_components_star_oracle(),
    bench=True,
    doc=f"Connected components via alternating large-star/small-star "
    "rounds (Kiveris et al. 2014) — O(log^2 n) rounds on ANY graph shape, "
    "vs O(diameter) for min-label propagation. The graph is adversarial "
    f"BY CONSTRUCTION: {CC_BLOCK}-document chains (diameter {CC_BLOCK - 1} "
    "— propagation would need that many rounds) merged pairwise by sparse "
    f"cross-block bridges (doc_id % {CC_CROSS_MOD} == 0 links +{CC_BLOCK}), "
    "so merged diameters exceed 2x the block; output is per-component "
    "(min-id, size). "
    "Star rounds are two hash-join+groupBy passes over the shrinking edge "
    "set with an exact symmetric-difference convergence check; the oracle "
    "replays reachability as a recursive CTE. operators/closure.py "
    "connected_components_star.",
)
def q_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.closure import connected_components_star

    docs = load(spark, sf_dir, "documents")
    d = docs.select("doc_id")
    chain = (
        d.alias("a")
        .join(
            d.alias("b"),
            F.expr(
                f"b.doc_id = a.doc_id + 1"
                f" AND a.doc_id div {CC_BLOCK} = b.doc_id div {CC_BLOCK}"
            ),
        )
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    cross = (
        d.alias("a")
        .join(
            d.alias("b"),
            F.expr(
                f"b.doc_id = a.doc_id + {CC_BLOCK}"
                f" AND a.doc_id % {CC_CROSS_MOD} = 0"
            ),
        )
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    comps = connected_components_star(chain.unionByName(cross))
    return (
        comps.groupBy("component")
        .agg(F.count("*").alias("size"))
        .orderBy("component")
    )


def _cc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_components_star's adversarial edge set (chain blocks + sparse
    cross-block bridges), shared with the streaming form."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    chain = (
        d.alias("a")
        .join(
            d.alias("b"),
            F.expr(
                f"b.doc_id = a.doc_id + 1"
                f" AND a.doc_id div {CC_BLOCK} = b.doc_id div {CC_BLOCK}"
            ),
        )
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    cross = (
        d.alias("a")
        .join(
            d.alias("b"),
            F.expr(
                f"b.doc_id = a.doc_id + {CC_BLOCK}"
                f" AND a.doc_id % {CC_CROSS_MOD} = 0"
            ),
        )
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    return chain.unionByName(cross)


@query(
    "q_streaming_components",
    oracle=_components_star_oracle(),
    doc="INCREMENTAL connected components over an edge STREAM — the "
    "reference's diff discipline (StatementSetDiff added-quads, "
    "Pipeline.scala:61-93) applied to a graph operator: "
    "q_components_star's adversarial edge set arrives as three "
    "micro-batches (src % 3 slices; components are order-free, so "
    "edge->batch assignment cannot matter), each batch projects its new "
    "edges onto the CURRENT labels (candidate-bounded lookup), runs "
    "star-CC on the batch-bounded QUOTIENT graph, and rewrites only the "
    "comp_bucket-pruned rows of merged labels. The state store is "
    "compacted mid-stream (base generation via parquet _SUCCESS) before "
    "the last batch, so the row certifies the full lifecycle. Streamed "
    "labeling == batch star-CC over the edge union — the oracle is "
    "q_components_star's recursive-CTE replay VERBATIM. "
    "streaming/cc_stream.py.",
)
def q_streaming_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..streaming.cc_stream import (
        compact_cc_state,
        current_components,
        run_streaming_components,
    )

    base = tempfile.mkdtemp(prefix="tf_stream_cc_")
    staging = os.path.join(base, "staging")
    state = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    edges = _cc_edges(spark, sf_dir)

    def deliver(parity: int) -> None:
        edges.filter(F.col("src") % 3 == parity).coalesce(1).write.mode(
            "append"
        ).parquet(staging)

    def drain() -> None:
        q = run_streaming_components(
            spark.readStream.schema("src bigint, dst bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(staging),
            state,
            ckpt,
        )
        q.awaitTermination()

    deliver(0)
    deliver(1)
    drain()
    # fold batches 0-1, then ingest the last slice against the compacted
    # base — the labeling is identical either way (pinned in pytest)
    compact_cc_state(spark, state)
    deliver(2)
    drain()
    out = (
        current_components(spark, state)
        .groupBy("component")
        .agg(F.count("*").alias("size"))
        .orderBy("component")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return out


# --- Q: trained quality classifier (hashed-unigram Naive Bayes) -----------------

QNB_B = 1024


# the trained-classifier model chain (rule labels -> hashed-unigram NB
# counts -> quantized weights/prior -> per-doc sums), shared by the
# full-corpus classifier oracle and the DoReMi domain-reweighting oracle
_QNB_CTES = f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             COALESCE(list_max(list_transform(toks, t -> length(t))), 0) AS max_word_len,
             CASE WHEN len(toks) <= 5000 THEN
               list_max(list_transform(list_distinct(toks),
                 t -> len(list_filter(toks, x -> x = t)))) / NULLIF(len(toks), 0)
             END AS rep_ratio,
             len(list_filter(toks, t -> list_contains(
               ['a','an','and','in','is','of','the','to'], t))) / NULLIF(len(toks), 0) AS stopword_ratio,
             len(list_distinct(toks)) / NULLIF(len(toks), 0) AS unique_ratio
      FROM t
    ),
    lbl AS (
      SELECT doc_id,
        (CASE WHEN n_words < 5 THEN 'too_few_words'
              WHEN n_words > 5000 THEN 'too_many_words'
              WHEN max_word_len > 20 THEN 'word_too_long'
              WHEN rep_ratio > 0.25 THEN 'too_repetitive'
              WHEN stopword_ratio < 0.01 THEN 'low_stopword'
              WHEN unique_ratio < 0.3 THEN 'low_diversity'
         END) IS NULL AS label
      FROM m
    ),
    occ AS (
      SELECT doc_id,
             ('0x' || substr(md5('qnb:' || ' ' || toks[i]), 1, 8))::BIGINT
               % {QNB_B} AS bucket
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
      UNION ALL
      SELECT doc_id,
             ('0x' || substr(md5('qnb:' || ' ' || 'len:' || CAST(CASE WHEN len(toks) < 5 THEN 0 WHEN len(toks) < 16 THEN 1 WHEN len(toks) < 64 THEN 2 WHEN len(toks) < 256 THEN 3 WHEN len(toks) < 1024 THEN 4 WHEN len(toks) < 4096 THEN 5 ELSE 6 END AS VARCHAR)), 1, 8))::BIGINT
               % {QNB_B} AS bucket
      FROM t
    ),
    counts AS (
      SELECT bucket,
             COUNT(*) FILTER (label) AS pos_cnt,
             COUNT(*) FILTER (NOT label) AS neg_cnt
      FROM occ JOIN lbl USING (doc_id) GROUP BY 1
    ),
    totals AS (
      SELECT CAST(SUM(pos_cnt) AS BIGINT) AS pos_tot,
             CAST(SUM(neg_cnt) AS BIGINT) AS neg_tot
      FROM counts
    ),
    w AS (
      SELECT bucket,
             CAST(round(
               (ln(pos_cnt + 1) - ln(neg_cnt + 1)
                + ln(neg_tot + {QNB_B}) - ln(pos_tot + {QNB_B}))
               * 1000000, 0) AS BIGINT) AS w_q
      FROM counts CROSS JOIN totals
    ),
    pr AS (
      SELECT CAST(round(
               (ln((SELECT COUNT(*) FROM lbl WHERE label) + 1)
                - ln((SELECT COUNT(*) FROM lbl WHERE NOT label) + 1))
               * 1000000, 0) AS BIGINT) AS prior_q
    ),
    docsum AS (
      SELECT doc_id, COUNT(*) AS n_toks, CAST(SUM(w_q) AS BIGINT) AS sum_q
      FROM occ JOIN w USING (bucket) GROUP BY 1
    )"""


@query(
    "q_quality_classifier",
    bench=True,  # r10: the classifier train+serve scan gets an sf0.1 number
    oracle=_QNB_CTES
    + """
    SELECT l.doc_id, l.label,
           CAST(COALESCE(d.n_toks, 0) AS BIGINT) AS n_toks,
           CAST(pr.prior_q + COALESCE(d.sum_q, 0) AS BIGINT) AS score_q,
           CAST(pr.prior_q + COALESCE(d.sum_q, 0) AS BIGINT) / 1000000.0 AS score,
           (pr.prior_q + COALESCE(d.sum_q, 0)) > 0 AS pred
    FROM lbl l LEFT JOIN docsum d USING (doc_id) CROSS JOIN pr
    ORDER BY doc_id
    """,
    doc="Trained quality classifier: multinomial Naive Bayes log-odds over "
    f"hashed word unigrams ({QNB_B} buckets), distilled from the rule "
    "gate's keep labels (the CCNet/RefinedWeb learned-filter pattern, in "
    "its closed-form SGD-free shape). Training is two integer aggregates "
    "(per-bucket class counts + class totals); ln() runs once per bucket "
    "and quantizes to integer micro-nats, each document's score is an "
    "order-free BIGINT sum plus the quantized class prior, pred = "
    "score > 0. One corpus scan for training, one broadcast-joined scan "
    "for serving — no SGD, no vocabulary shuffle, engine/layout-"
    "deterministic (operators/quality_nb.py).",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality_nb import nb_classify, nb_train
    from ..operators.text import quality_filter

    docs = load(spark, sf_dir, "documents")
    # pin the rule-gate labels: nb_train consumes the labeled relation
    # twice (the eager sufficient-statistics checkpoint + the class-prior
    # doc aggregate) and several queries join labels again downstream —
    # without the pin the gate's O(unique·n)-per-row token scan re-runs
    # once PER CONSUMER (the narrow (doc_id, label) rows are what get
    # cached, never the text)
    labels = pin(
        quality_filter(docs, "doc_id", "text").select(
            "doc_id", F.col("keep").alias("label")
        )
    )
    labeled = docs.select("doc_id", "text").join(labels, "doc_id")
    weights, prior = nb_train(
        labeled, "doc_id", "text", "label", QNB_B, length_feature=True
    )
    scored = nb_classify(
        docs, "doc_id", "text", weights, prior, QNB_B, length_feature=True
    )
    return (
        scored.join(labels, "doc_id")
        .select("doc_id", "label", "n_toks", "score_q", "score", "pred")
        .orderBy("doc_id")
    )


# --- Q: byte-level BPE on multi-byte UTF-8 (full byte-table fixture) -----------

# The q_bpe_bytelevel oracle reduces GPT-2's 256-entry byte->unicode table
# to replace(' ', 'Ġ') because the test corpus is [a-z ]. This variant
# INJECTS multi-byte UTF-8 characters (2-, 3- and 4-byte sequences) by a
# deterministic substitution both engines apply to the same base text, so
# the full byte mapping is oracle-exercised: each injected character's
# byte-symbol expansion is computed HERE from the same bytes_to_unicode()
# the Spark trainer uses, and emitted as SQL literals.
_UNI_SUBS = [("e", "é"), ("o", "ø"), ("x", "€"), ("z", "🌍")]


def _uni_byte_expansions() -> list[tuple[str, str]]:
    from ..operators.bpe import bytes_to_unicode

    t = bytes_to_unicode()
    return [
        (ch, "".join(t[b] for b in ch.encode("utf-8"))) for _, ch in _UNI_SUBS
    ]


def _bpe_bytelevel_unicode_oracle(n_merges: int) -> str:
    from ..operators.text import PRETOKEN_REGEX

    regex_sql = PRETOKEN_REGEX.replace("'", "''")
    subs_sql = "text"
    for src, dst in _UNI_SUBS:
        subs_sql = f"replace({subs_sql}, '{src}', '{dst}')"
    sym_sql = "word"
    for ch, exp in _uni_byte_expansions():
        sym_sql = f"replace({sym_sql}, '{ch}', '{exp}')"
    sym_sql = f"replace({sym_sql}, ' ', chr(288))"
    head = f"""w AS MATERIALIZED (
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT unnest(regexp_extract_all({subs_sql}, '{regex_sql}')) AS word
        FROM documents) GROUP BY 1
    ),
    s0 AS MATERIALIZED (
      SELECT word, cnt,
             concat('·', array_to_string(string_split({sym_sql}, ''), '··'), '·') AS s
      FROM w
    )"""
    parts = [head, *_bpe_chain_parts(n_merges)[1:]]
    selects = [
        f"SELECT {r} AS step, a, b, pair_count FROM t{r}"
        for r in range(1, n_merges + 1)
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)
        + "\nORDER BY step"
    )


@query(
    "q_bpe_bytelevel_unicode",
    oracle=_bpe_bytelevel_unicode_oracle(BPE_MERGES),
    doc=f"Byte-level BPE over MULTI-BYTE UTF-8: the corpus gets a "
    "deterministic substitution (e->é 2-byte, o->ø 2-byte, x->€ 3-byte, "
    "z->🌍 4-byte) applied identically in both engines, then the first "
    f"{BPE_MERGES} merges are learned byte-level. The Spark side runs the "
    "full 256-entry bytes->unicode table (operators/bpe.py "
    "bytes_to_unicode); the oracle maps each injected character to its "
    "byte-symbol expansion computed from the SAME table and emitted as "
    "SQL literals — so continuation bytes, 3- and 4-byte sequences, and "
    "the shifted control-byte range are value-checked across engines, "
    "not just the [a-z ] reduction q_bpe_bytelevel covers.",
)
def q_bpe_bytelevel_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import train_bpe_bytelevel

    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    for src, dst in _UNI_SUBS:
        text = F.replace(text, F.lit(src), F.lit(dst))
    docs = docs.withColumn("text", text)
    triples = train_bpe_bytelevel(
        docs, "text", BPE_MERGES, batch=BPE_BATCH, return_counts=True
    )
    rows = [(i + 1, a, b, c) for i, (a, b, c) in enumerate(triples)]
    return spark.createDataFrame(
        rows, "step int, a string, b string, pair_count bigint"
    ).orderBy("step")


# --- Q: classifier holdout evaluation (train/test hygiene) ---------------------

QNB_TEST_FRAC = 0.25
QNB_SPLIT_SALT = "qnbsplit"


@query(
    "q_classifier_holdout",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks,
             {_SQL_U.format(salt=QNB_SPLIT_SALT)} < {QNB_TEST_FRAC} AS is_test
      FROM documents
    ),
    m AS (
      SELECT doc_id, is_test,
             len(toks) AS n_words,
             COALESCE(list_max(list_transform(toks, t -> length(t))), 0) AS max_word_len,
             CASE WHEN len(toks) <= 5000 THEN
               list_max(list_transform(list_distinct(toks),
                 t -> len(list_filter(toks, x -> x = t)))) / NULLIF(len(toks), 0)
             END AS rep_ratio,
             len(list_filter(toks, t -> list_contains(
               ['a','an','and','in','is','of','the','to'], t))) / NULLIF(len(toks), 0) AS stopword_ratio,
             len(list_distinct(toks)) / NULLIF(len(toks), 0) AS unique_ratio
      FROM t
    ),
    lbl AS (
      SELECT doc_id, is_test,
        (CASE WHEN n_words < 5 THEN 'too_few_words'
              WHEN n_words > 5000 THEN 'too_many_words'
              WHEN max_word_len > 20 THEN 'word_too_long'
              WHEN rep_ratio > 0.25 THEN 'too_repetitive'
              WHEN stopword_ratio < 0.01 THEN 'low_stopword'
              WHEN unique_ratio < 0.3 THEN 'low_diversity'
         END) IS NULL AS label
      FROM m
    ),
    occ AS (
      SELECT doc_id, is_test,
             ('0x' || substr(md5('qnb:' || ' ' || toks[i]), 1, 8))::BIGINT
               % {QNB_B} AS bucket
      FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
      UNION ALL
      SELECT doc_id, is_test,
             ('0x' || substr(md5('qnb:' || ' ' || 'len:' || CAST(CASE WHEN len(toks) < 5 THEN 0 WHEN len(toks) < 16 THEN 1 WHEN len(toks) < 64 THEN 2 WHEN len(toks) < 256 THEN 3 WHEN len(toks) < 1024 THEN 4 WHEN len(toks) < 4096 THEN 5 ELSE 6 END AS VARCHAR)), 1, 8))::BIGINT
               % {QNB_B} AS bucket
      FROM t
    ),
    counts AS (
      SELECT bucket,
             COUNT(*) FILTER (label) AS pos_cnt,
             COUNT(*) FILTER (NOT label) AS neg_cnt
      FROM occ JOIN lbl USING (doc_id)
      WHERE NOT occ.is_test GROUP BY 1
    ),
    totals AS (
      SELECT CAST(SUM(pos_cnt) AS BIGINT) AS pos_tot,
             CAST(SUM(neg_cnt) AS BIGINT) AS neg_tot
      FROM counts
    ),
    w AS (
      SELECT bucket,
             CAST(round(
               (ln(pos_cnt + 1) - ln(neg_cnt + 1)
                + ln(neg_tot + {QNB_B}) - ln(pos_tot + {QNB_B}))
               * 1000000, 0) AS BIGINT) AS w_q
      FROM counts CROSS JOIN totals
    ),
    pr AS (
      SELECT CAST(round(
               (ln((SELECT COUNT(*) FROM lbl WHERE label AND NOT is_test) + 1)
                - ln((SELECT COUNT(*) FROM lbl WHERE NOT label AND NOT is_test) + 1))
               * 1000000, 0) AS BIGINT) AS prior_q,
             CAST(round(
               (ln(neg_tot + {QNB_B}) - ln(pos_tot + {QNB_B}))
               * 1000000, 0) AS BIGINT) AS unseen_q
      FROM totals
    ),
    docsum AS (
      SELECT occ.doc_id, COUNT(*) AS n_toks,
             CAST(SUM(COALESCE(w.w_q, pr.unseen_q)) AS BIGINT) AS sum_q
      FROM occ LEFT JOIN w USING (bucket) CROSS JOIN pr
      WHERE occ.is_test GROUP BY 1
    ),
    scored AS (
      SELECT l.doc_id, l.label,
             CAST(pr.prior_q + COALESCE(d.sum_q, 0) AS BIGINT) AS score_q
      FROM lbl l LEFT JOIN docsum d USING (doc_id) CROSS JOIN pr
      WHERE l.is_test
    )
    SELECT label, score_q > 0 AS pred,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(score_q) AS BIGINT) AS sum_score_q
    FROM scored GROUP BY 1, 2 ORDER BY label, pred
    """,
    doc="Classifier holdout evaluation — the train/test hygiene the learned "
    f"filter needs: a deterministic hash split ({QNB_TEST_FRAC:.0%} test, "
    "membership a pure function of doc_id so the eval set never drifts as "
    "the corpus grows), Naive Bayes log-odds trained on the TRAIN side "
    "only, the TEST side scored (test-only buckets fall back to the "
    "model's zero-count weight), and the confusion matrix reported with "
    "per-cell exact score sums — so the driver gate value-checks every "
    "holdout score, not just the counts "
    "(operators/quality_nb.py + operators/sampling.py train_test_split).",
)
def q_classifier_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality_nb import nb_classify, nb_train
    from ..operators.text import quality_filter

    docs = load(spark, sf_dir, "documents")
    labels = quality_filter(docs, "doc_id", "text").select(
        "doc_id", F.col("keep").alias("label")
    )
    # the labeled+split relation feeds five consumers (train counts, the
    # prior's doc agg, test occurrences, the test id list, the final
    # label join) — pin it so the quality-gate chain and the split hash
    # evaluate once, not per consumer (the multi-consumer cachereg idiom;
    # scan budget asserted by test_source_scan_budget)
    labeled = pin(
        train_test_split(
            docs.select("doc_id", "text").join(labels, "doc_id"),
            "doc_id",
            QNB_TEST_FRAC,
            salt=QNB_SPLIT_SALT,
        )
    )
    train = labeled.filter(F.col("split") == "train")
    test = labeled.filter(F.col("split") == "test")
    weights, prior = nb_train(
        train, "doc_id", "text", "label", QNB_B, length_feature=True
    )
    scored = nb_classify(
        test, "doc_id", "text", weights, prior, QNB_B, length_feature=True
    )
    return (
        scored.join(test.select("doc_id", "label"), "doc_id")
        .groupBy("label", "pred")
        .agg(
            F.count("*").alias("n"),
            F.sum("score_q").cast("bigint").alias("sum_score_q"),
        )
        .orderBy("label", "pred")
    )


# --- Q: temperature-scaled mixture sampling ------------------------------------

TEMP_T = 0.7  # sampling temperature (multilingual-LM convention)
TEMP_EXP = 0.3  # 1 - TEMP_T, written exactly (1 - 0.7 is not float-exact)
TEMP_RATE_SCALE = 1_000_000_000  # keep-rate quantization grid


@query(
    "q_temperature_mixture",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, CAST({_SQL_TOKENS} AS BIGINT) AS n_tok
      FROM documents
    ),
    c AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens FROM d GROUP BY 1),
    m AS (SELECT MIN(lang_tokens) AS mn FROM c),
    r AS (
      SELECT lang, lang_tokens,
             CAST(round(pow(CAST(mn AS DOUBLE) / lang_tokens, {TEMP_EXP})
                        * {TEMP_RATE_SCALE}, 0) AS BIGINT) AS rate_q
      FROM c, m
    ),
    kept AS (
      SELECT d.lang, d.n_tok
      FROM d JOIN r USING (lang)
      WHERE ('0x' || substr(md5('tempmix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              * {TEMP_RATE_SCALE} < r.rate_q * 4294967296
    ),
    k AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS kept_docs,
             CAST(SUM(n_tok) AS BIGINT) AS kept_tokens
      FROM kept GROUP BY 1
    )
    SELECT r.lang, r.lang_tokens, r.rate_q,
           CAST(COALESCE(k.kept_docs, 0) AS BIGINT) AS kept_docs,
           CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
    FROM r LEFT JOIN k USING (lang)
    ORDER BY r.lang
    """,
    doc=f"Temperature-scaled mixture sampling (T={TEMP_T}, the multilingual-"
    "LM convention): per-language keep rate (min_tokens/lang_tokens)^(1-T) "
    "— flatter than proportional, steeper than uniform — derived from "
    "EXACT per-language token counts. The one transcendental (pow) runs "
    "once per LANGUAGE and quantizes to a bigint rate on a 1e-9 grid; the "
    "keep decision is a pure INTEGER comparison (hash·SCALE < rate_q·2^32)"
    " — no float compare anywhere, so membership is bit-stable on any "
    "engine and any layout. Rate table broadcast; selection a pure "
    "function of doc_id (operators/sampling.py hash_u32).",
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_u32

    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.size(F.expr("filter(split(text, ' '), x -> x != '')"))
        .cast("bigint")
        .alias("n_tok"),
    )
    c = d.groupBy("lang").agg(F.sum("n_tok").alias("lang_tokens"))
    mn = c.agg(F.min("lang_tokens").alias("mn"))
    rates = c.crossJoin(F.broadcast(mn)).select(
        "lang",
        "lang_tokens",
        F.round(
            F.pow(F.col("mn").cast("double") / F.col("lang_tokens"), F.lit(TEMP_EXP))
            * F.lit(TEMP_RATE_SCALE),
            0,
        )
        .cast("bigint")
        .alias("rate_q"),
    )
    kept = (
        d.join(F.broadcast(rates.select("lang", "rate_q")), "lang")
        .filter(
            hash_u32(F.col("doc_id"), "tempmix") * F.lit(TEMP_RATE_SCALE)
            < F.col("rate_q") * F.lit(4294967296)
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum("n_tok").alias("kept_tokens"),
        )
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "lang_tokens",
            "rate_q",
            F.coalesce("kept_docs", F.lit(0)).cast("bigint").alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).cast("bigint").alias("kept_tokens"),
        )
        .orderBy("lang")
    )


# --- Q: Bernoulli NB quality classifier (absence-aware variant) -----------------

_QNB_LEN_TOK = (
    "'len:' || CAST(CASE WHEN len(toks) < 5 THEN 0 WHEN len(toks) < 16 THEN 1 "
    "WHEN len(toks) < 64 THEN 2 WHEN len(toks) < 256 THEN 3 "
    "WHEN len(toks) < 1024 THEN 4 WHEN len(toks) < 4096 THEN 5 "
    "ELSE 6 END AS VARCHAR)"
)


@query(
    "q_classifier_bernoulli",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             COALESCE(list_max(list_transform(toks, t -> length(t))), 0) AS max_word_len,
             CASE WHEN len(toks) <= 5000 THEN
               list_max(list_transform(list_distinct(toks),
                 t -> len(list_filter(toks, x -> x = t)))) / NULLIF(len(toks), 0)
             END AS rep_ratio,
             len(list_filter(toks, t -> list_contains(
               ['a','an','and','in','is','of','the','to'], t))) / NULLIF(len(toks), 0) AS stopword_ratio,
             len(list_distinct(toks)) / NULLIF(len(toks), 0) AS unique_ratio
      FROM t
    ),
    lbl AS (
      SELECT doc_id,
        (CASE WHEN n_words < 5 THEN 'too_few_words'
              WHEN n_words > 5000 THEN 'too_many_words'
              WHEN max_word_len > 20 THEN 'word_too_long'
              WHEN rep_ratio > 0.25 THEN 'too_repetitive'
              WHEN stopword_ratio < 0.01 THEN 'low_stopword'
              WHEN unique_ratio < 0.3 THEN 'low_diversity'
         END) IS NULL AS label
      FROM m
    ),
    pres AS (
      SELECT DISTINCT doc_id, bucket FROM (
        SELECT doc_id,
               ('0x' || substr(md5('qnb:' || ' ' || toks[i]), 1, 8))::BIGINT
                 % {QNB_B} AS bucket
        FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
        UNION ALL
        SELECT doc_id,
               ('0x' || substr(md5('qnb:' || ' ' || {_QNB_LEN_TOK}), 1, 8))::BIGINT
                 % {QNB_B} AS bucket
        FROM t
      )
    ),
    nn AS (
      SELECT COUNT(*) FILTER (label) AS n_pos,
             COUNT(*) FILTER (NOT label) AS n_neg
      FROM lbl
    ),
    dfs AS (
      SELECT bucket,
             COUNT(*) FILTER (label) AS df_pos,
             COUNT(*) FILTER (NOT label) AS df_neg
      FROM pres JOIN lbl USING (doc_id) GROUP BY 1
    ),
    pb AS (
      SELECT bucket,
             CAST(round((ln(df_pos + 1) - ln(n_pos - df_pos + 1)
                         - ln(df_neg + 1) + ln(n_neg - df_neg + 1))
                        * 1000000, 0) AS BIGINT) AS delta_q,
             CAST(round((ln(n_pos - df_pos + 1) - ln(n_pos + 2)
                         - ln(n_neg - df_neg + 1) + ln(n_neg + 2))
                        * 1000000, 0) AS BIGINT) AS wabs_q
      FROM dfs CROSS JOIN nn
    ),
    cc AS (
      SELECT CAST(SUM(wabs_q) AS BIGINT)
             + ({QNB_B} - COUNT(*))
               * (SELECT CAST(round((ln(n_pos + 1) - ln(n_pos + 2)
                                     - ln(n_neg + 1) + ln(n_neg + 2))
                                    * 1000000, 0) AS BIGINT) FROM nn)
             AS c_q
      FROM pb
    ),
    pr AS (
      SELECT CAST(round((ln(n_pos + 1) - ln(n_neg + 1)) * 1000000, 0) AS BIGINT)
             AS prior_q
      FROM nn
    ),
    docsum AS (
      SELECT doc_id, COUNT(*) AS n_feat, CAST(SUM(pb.delta_q) AS BIGINT) AS sum_q
      FROM pres JOIN pb USING (bucket) GROUP BY 1
    )
    SELECT l.doc_id, l.label,
           CAST(COALESCE(d.n_feat, 0) AS BIGINT) AS n_feat,
           CAST(pr.prior_q + cc.c_q + COALESCE(d.sum_q, 0) AS BIGINT) AS score_q,
           (pr.prior_q + cc.c_q + COALESCE(d.sum_q, 0)) > 0 AS pred
    FROM lbl l LEFT JOIN docsum d USING (doc_id)
    CROSS JOIN pr CROSS JOIN cc
    ORDER BY l.doc_id
    """,
    doc="Bernoulli NB quality classifier — the ABSENCE-aware variant: each "
    "hashed bucket contributes ln p(present|class) when present and "
    "ln p(absent|class) when absent, with the absent side folded into ONE "
    "model constant (observed buckets' quantized terms summed exactly, "
    "the unobserved remainder counted, never summed), so scoring stays a "
    "single distinct-presence scan + broadcast join. This captures what "
    "multinomial NB structurally cannot — a document penalized for the "
    "stopwords it LACKS (the rule gate's dominant drop reason) — and its "
    "per-document scores and honest confusion are value-checked exactly "
    "(operators/quality_nb.py nb_train_bernoulli).",
)
def q_classifier_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality_nb import nb_classify_bernoulli, nb_train_bernoulli
    from ..operators.text import quality_filter

    docs = load(spark, sf_dir, "documents")
    # pin the rule-gate labels: nb_train consumes the labeled relation
    # twice (the eager sufficient-statistics checkpoint + the class-prior
    # doc aggregate) and several queries join labels again downstream —
    # without the pin the gate's O(unique·n)-per-row token scan re-runs
    # once PER CONSUMER (the narrow (doc_id, label) rows are what get
    # cached, never the text)
    labels = pin(
        quality_filter(docs, "doc_id", "text").select(
            "doc_id", F.col("keep").alias("label")
        )
    )
    labeled = docs.select("doc_id", "text").join(labels, "doc_id")
    weights, prior = nb_train_bernoulli(
        labeled, "doc_id", "text", "label", QNB_B, length_feature=True
    )
    scored = nb_classify_bernoulli(
        docs, "doc_id", "text", weights, prior, QNB_B, length_feature=True
    )
    return (
        scored.join(labels, "doc_id")
        .select("doc_id", "label", "n_feat", "score_q", "pred")
        .orderBy("doc_id")
    )


# --- Q: substring-level eval-set decontamination --------------------------------

DECON_MOD = 13  # every 13th document contributes an eval snippet
DECON_OFF = 7   # snippet = tokens [DECON_OFF, DECON_OFF + DECON_LEN) (1-based)
DECON_LEN = 20


@query(
    "q_eval_decontamination",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    ewins AS (
      SELECT DISTINCT
             {" || ' ' || ".join(f"etoks[i+{j}]" for j in range(SUBSTR_W))} AS win
      FROM (
        SELECT toks[{DECON_OFF}:{DECON_OFF + DECON_LEN - 1}] AS etoks
        FROM toks WHERE doc_id % {DECON_MOD} = 0
      ),
      LATERAL (SELECT unnest(generate_series(1, len(etoks) - {SUBSTR_W - 1})) AS i) s
    ),
    wins AS (
      SELECT doc_id, i - 1 AS pos,
             {" || ' ' || ".join(f"toks[i+{j}]" for j in range(SUBSTR_W))} AS win
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, len(toks) - {SUBSTR_W - 1})) AS i) s
    ),
    flagged AS (SELECT w.doc_id, w.pos FROM wins w SEMI JOIN ewins USING (win)),
    brks AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                             + {SUBSTR_W}
                  THEN 1 ELSE 0 END AS brk
      FROM flagged
    ),
    grp AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM brks
    )
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {SUBSTR_W} AS span_end,
           MAX(pos) + {SUBSTR_W} - MIN(pos) AS span_tokens
    FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start
    """,
    doc="Substring-level eval-set decontamination (the cross-corpus form "
    "of q_substring_spans): maximal train-document spans exactly matching "
    f"a {SUBSTR_W}-token window of the eval set — the benchmark-leakage "
    "check run before training, at n-gram granularity rather than "
    "whole-document LSH (q_contamination_lsh). The eval side (synthesized "
    f"here as {DECON_LEN}-token snippets of every {DECON_MOD}th document) "
    "collapses to its DISTINCT window texts before ONE equi-join against "
    "a single train scan; spans merge per document "
    "(operators/substring.py contaminated_spans).",
)
def q_eval_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.substring import contaminated_spans

    docs = load(spark, sf_dir, "documents")
    toks = F.expr("filter(split(text, ' '), t -> t != '')")
    eval_df = docs.filter(F.col("doc_id") % DECON_MOD == 0).select(
        "doc_id",
        F.concat_ws(" ", F.slice(toks, DECON_OFF, DECON_LEN)).alias("text"),
    )
    return contaminated_spans(docs, eval_df, "doc_id", "text", SUBSTR_W).orderBy(
        "doc_id", "span_start"
    )


# --- Q: streaming NB training (mergeable sufficient statistics) -----------------

from .catalog import QUERIES as _QUERIES  # noqa: E402  (oracle reuse below)


@query(
    "q_streaming_nb_train",
    oracle=_QUERIES["q_quality_classifier"].oracle,
    doc="STREAMING Naive Bayes training, value-checked end to end: "
    "documents arrive as three micro-batches whose per-bucket class "
    "counts and doc counts — the model's sufficient statistics, plain "
    "integer sums — accumulate in write-once batch-suffixed state "
    "(replay-guarded, the hh_stream discipline). Because the statistics "
    "MERGE exactly, the model derived from the streamed state is "
    "bit-identical to batch training over the whole corpus — so this row "
    "reuses q_quality_classifier's oracle VERBATIM: the driver gate "
    "cross-checks streamed == batch == DuckDB on every per-document "
    "score (streaming/nb_stream.py).",
)
def q_streaming_nb_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators.quality_nb import nb_classify
    from ..operators.text import quality_filter
    from ..streaming.nb_stream import nb_model_from_state, run_streaming_nb

    base = tempfile.mkdtemp(prefix="tf_stream_nb_")
    staging = os.path.join(base, "staging")
    state = os.path.join(base, "state")
    docs = load(spark, sf_dir, "documents")
    # pin the rule-gate labels: nb_train consumes the labeled relation
    # twice (the eager sufficient-statistics checkpoint + the class-prior
    # doc aggregate) and several queries join labels again downstream —
    # without the pin the gate's O(unique·n)-per-row token scan re-runs
    # once PER CONSUMER (the narrow (doc_id, label) rows are what get
    # cached, never the text)
    labels = pin(
        quality_filter(docs, "doc_id", "text").select(
            "doc_id", F.col("keep").alias("label")
        )
    )
    labeled = docs.select("doc_id", "text").join(labels, "doc_id")
    for parity in (0, 1, 2):
        labeled.filter(F.col("doc_id") % 3 == parity).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
    stream = (
        spark.readStream.schema("doc_id bigint, text string, label boolean")
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = run_streaming_nb(
        stream, state, "doc_id", "text", "label", QNB_B, length_feature=True
    )
    q.awaitTermination()
    weights, prior = nb_model_from_state(spark, state, QNB_B)
    scored = nb_classify(
        docs, "doc_id", "text", weights, prior, QNB_B, length_feature=True
    )
    out = (
        scored.join(labels, "doc_id")
        .select("doc_id", "label", "n_toks", "score_q", "score", "pred")
        .orderBy("doc_id")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return out


# --- Q: stupid-backoff trigram LM scoring ----------------------------------------

from ..operators.backoff_lm import LNQ_ALPHA as _LNQ_A  # noqa: E402

LM_TRAIN_MOD = 3  # docs with doc_id % 3 == 0 are SCORED, the rest TRAIN

# the stupid-backoff model + per-position term chain, shared by the
# per-document score oracle and the CCNet tertile-bucket oracle
_LM_CTES = f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    tri AS (
      SELECT toks[i] AS a, toks[i+1] AS b, toks[i+2] AS c,
             CAST(round(ln(COUNT(*)) * 1000000, 0) AS BIGINT) AS lnq3
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) s
      WHERE doc_id % {LM_TRAIN_MOD} <> 0
      GROUP BY 1, 2, 3
    ),
    bi AS (
      SELECT toks[i] AS a, toks[i+1] AS b,
             CAST(round(ln(COUNT(*)) * 1000000, 0) AS BIGINT) AS lnq2
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i) s
      WHERE doc_id % {LM_TRAIN_MOD} <> 0
      GROUP BY 1, 2
    ),
    uni AS (
      SELECT toks[i] AS a, COUNT(*) AS cnt1,
             CAST(round(ln(COUNT(*)) * 1000000, 0) AS BIGINT) AS lnq1,
             CAST(round(ln(COUNT(*) + 1) * 1000000, 0) AS BIGINT) AS lnq1p
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
      WHERE doc_id % {LM_TRAIN_MOD} <> 0
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(round(ln(SUM(cnt1) + 1) * 1000000, 0) AS BIGINT) AS lnq_n1
      FROM uni
    ),
    spos AS (
      SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) s
      WHERE doc_id % {LM_TRAIN_MOD} = 0
    ),
    terms AS (
      SELECT p.doc_id,
             CASE WHEN t.lnq3 IS NOT NULL THEN 'tri'
                  WHEN b23.lnq2 IS NOT NULL THEN 'bi'
                  ELSE 'uni' END AS lvl,
             CASE WHEN t.lnq3 IS NOT NULL THEN t.lnq3 - ctx.lnq2
                  WHEN b23.lnq2 IS NOT NULL
                    THEN {_LNQ_A} + b23.lnq2 - u2.lnq1
                  ELSE {2 * _LNQ_A} + COALESCE(u3.lnq1p, 0) - tot.lnq_n1
             END AS term
      FROM spos p
      LEFT JOIN tri t  ON t.a = p.w1 AND t.b = p.w2 AND t.c = p.w3
      LEFT JOIN bi ctx ON ctx.a = p.w1 AND ctx.b = p.w2
      LEFT JOIN bi b23 ON b23.a = p.w2 AND b23.b = p.w3
      LEFT JOIN uni u2 ON u2.a = p.w2
      LEFT JOIN uni u3 ON u3.a = p.w3
      CROSS JOIN tot
    )"""


@query(
    "q_lm_backoff_score",
    bench=True,  # r10: the trigram-model join gets an sf0.1 number
    oracle=_LM_CTES
    + """
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(COUNT(*) FILTER (lvl = 'tri') AS BIGINT) AS n_tri,
           CAST(COUNT(*) FILTER (lvl = 'bi') AS BIGINT) AS n_bi,
           CAST(COUNT(*) FILTER (lvl = 'uni') AS BIGINT) AS n_uni,
           CAST(SUM(term) AS BIGINT) AS score_q,
           CAST(SUM(term) AS BIGINT) / (COUNT(*) * 1000000.0) AS avg_logscore
    FROM terms GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Stupid-backoff trigram LM scoring (Brants et al. 2007 §4): "
    "held-out documents (every third doc) scored under trigram counts "
    "from the rest — Σ log S(w3|w1w2) with S = c123/c12, backing off to "
    "α·c23/c2 then α²·(c3+1)/(N+1), α=0.4 — the CCNet-style perplexity "
    "filter with real backoff traffic (per-doc n_tri/n_bi/n_uni branch "
    "counts ride in the output). ln() runs once per DISTINCT n-gram type "
    "and quantizes to micro-nats; ln α ships as ONE precomputed integer "
    f"literal ({_LNQ_A}) to both engines; doc scores are order-free "
    "BIGINT sums (operators/backoff_lm.py).",
)
def q_lm_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.backoff_lm import backoff_lm_scores

    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % LM_TRAIN_MOD != 0)
    score = docs.filter(F.col("doc_id") % LM_TRAIN_MOD == 0)
    return backoff_lm_scores(train, score, "doc_id", "text").orderBy("doc_id")


# --- Q: CCNet perplexity buckets (per-language LM-score tertiles) ---------------


@query(
    "q_ppl_buckets",
    oracle=_LM_CTES
    + """,
    docscore AS (
      SELECT doc_id, CAST(SUM(term) AS BIGINT) AS score_q
      FROM terms GROUP BY doc_id
    ),
    ranked AS (
      SELECT d.lang, s.doc_id, s.score_q,
             ROW_NUMBER() OVER (PARTITION BY d.lang
                                ORDER BY s.score_q DESC, s.doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY d.lang) AS n
      FROM docscore s JOIN documents d USING (doc_id)
    ),
    b AS (
      SELECT lang, score_q,
             CASE WHEN rn <= (n + 2) // 3 THEN 'head'
                  WHEN rn <= (2 * n + 2) // 3 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM ranked
    )
    SELECT lang, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(score_q) AS BIGINT) AS sum_score_q,
           CAST(MIN(score_q) AS BIGINT) AS min_score_q,
           CAST(MAX(score_q) AS BIGINT) AS max_score_q
    FROM b GROUP BY 1, 2 ORDER BY lang, bucket
    """,
    doc="CCNet perplexity buckets (Wenzek et al. 2020 §3): the held-out "
    "documents' stupid-backoff LM scores (q_lm_backoff_score's exact "
    "micro-nat score_q) split into per-LANGUAGE head/middle/tail "
    "tertiles — higher log-score = lower perplexity = head, the split "
    "CCNet actually ships for quality-stratified sampling. Rank-third "
    "membership is exact integer arithmetic (r <= ceil(n/3) etc.), "
    "ranks come from the distributed prefix sum over a range exchange "
    "(operators/robust.py grouped_rank — no per-language single-task "
    "sort, so one dominant language cannot serialize the pass), and the "
    "per-bucket boundaries (min/max score) are value-checked "
    "(operators/evalcurves.py grouped_score_tertiles).",
)
def q_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.backoff_lm import backoff_lm_scores
    from ..operators.evalcurves import grouped_score_tertiles

    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % LM_TRAIN_MOD != 0)
    score = docs.filter(F.col("doc_id") % LM_TRAIN_MOD == 0)
    scored = backoff_lm_scores(train, score, "doc_id", "text").select(
        "doc_id", "score_q"
    )
    # the LM-scored relation feeds grouped_rank's two passes (range-
    # exchange ranks + group counts) — pin it so the whole backoff chain
    # (three count tables + the per-position term join) runs once
    with_lang = pin(scored.join(docs.select("doc_id", "lang"), "doc_id"))
    buckets = grouped_score_tertiles(
        with_lang, "lang", "score_q", "doc_id"
    )
    return (
        buckets.groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("score_q").cast("bigint").alias("sum_score_q"),
            F.min("score_q").cast("bigint").alias("min_score_q"),
            F.max("score_q").cast("bigint").alias("max_score_q"),
        )
        .orderBy("lang", "bucket")
    )


# --- Q: Luhn-validated card-number detection -------------------------------------


def _luhn_sum_sql(b: str, parity: int) -> str:
    """SQL for the Luhn digit sum of string expression ``b``: double the
    digits whose 1-based position i satisfies (length - i) % 2 == parity
    (parity 1 = validate a full number, parity 0 = derive the check digit
    for a base missing its last digit)."""
    d = f"CAST(substr({b}, i, 1) AS INT)"
    return (
        f"list_sum(list_transform(generate_series(1, length({b})), i -> "
        f"CASE WHEN (length({b}) - i) % 2 = {parity} "
        f"THEN CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END "
        f"ELSE {d} END))"
    )


@query(
    "q_pii_luhn",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text,
             '4' || lpad(CAST(doc_id AS VARCHAR), 14, '0') AS b
      FROM documents
    ),
    synth AS (
      SELECT doc_id, b,
             CAST((10 - ({_luhn_sum_sql('b', 0)}) % 10) % 10 AS INT) AS chk,
             text AS t0
      FROM base
    ),
    dirty AS (
      SELECT doc_id,
             t0
             || CASE WHEN doc_id % 4 = 0
                     THEN ' card ' || b || CAST(chk AS VARCHAR) ELSE '' END
             || CASE WHEN doc_id % 6 = 0
                     THEN ' ref ' || b || CAST((chk + 5) % 10 AS VARCHAR) ELSE '' END
             AS t
      FROM synth
    ),
    cands AS (
      SELECT doc_id,
             regexp_extract_all(t, '\\b[0-9]{{13,16}}\\b') AS cs
      FROM dirty
    )
    SELECT doc_id,
           CAST(len(cs) AS BIGINT) AS n_candidates,
           CAST(len(list_filter(cs, c -> ({_luhn_sum_sql('c', 1)}) % 10 = 0))
                AS BIGINT) AS n_valid,
           COALESCE(array_to_string(
             list_sort(list_filter(cs, c -> ({_luhn_sum_sql('c', 1)}) % 10 = 0)),
             ','), '') AS valid_ccs
    FROM cands ORDER BY doc_id
    """,
    doc="Luhn-validated card-number detection: digit runs of card length "
    "are only PII when they pass the mod-10 checksum — the standard "
    "validator that kills the regex-only false-positive flood (a random "
    "digit run passes 1 in 10; ids and timestamps mostly don't). Valid "
    "and check-digit-corrupted numbers are synthesized per doc_id in "
    "BOTH engines (the check digit itself computed by the same integer "
    "arithmetic), so n_valid and the exact detected set value-check "
    "cross-engine. Pure in-row array arithmetic, one scan, no shuffle "
    "(operators/text.py luhn_valid / cc_detect).",
)
def q_pii_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import cc_detect, luhn_check_digit

    docs = load(spark, sf_dir, "documents")
    b = F.concat(F.lit("4"), F.lpad(F.col("doc_id").cast("string"), 14, "0"))
    chk = luhn_check_digit(b)
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.lit(" card "), b, chk.cast("string")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 6 == 0,
                F.concat(F.lit(" ref "), b, ((chk + 5) % 10).cast("string")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return cc_detect(dirty, "doc_id", "text").orderBy("doc_id")


# --- Q: multi-class NB language identifier (hashed char trigrams) ---------------

from ..operators.langid_nb import (  # noqa: E402
    LID_BUCKETS as _LID_B,
    LID_NGRAM as _LID_N,
)

LID_TEST_FRAC = 0.25
LID_SPLIT_SALT = "lidsplit"

# the trained-langid model chain, shared by the full-corpus and holdout
# oracles: g = hashed char-trigram occurrences (with the split flag when
# a salt is given), then per-class cell counts -> quantized weights ->
# class priors, and per-doc bucket counts -> exact BIGINT class scores ->
# argmax with the (score DESC, class ASC) tie-break.
def _langid_oracle_ctes(train_pred: str, score_pred: str, split_expr: str) -> str:
    return "\n    WITH " + _langid_body(train_pred, score_pred, split_expr)


def _langid_body(train_pred: str, score_pred: str, split_expr: str) -> str:
    """The langid model chain WITHOUT the leading WITH — composable into
    a larger CTE list (q_ccnet_filter chains it after the LM model)."""
    return f"""d AS (
      SELECT doc_id, lang, text, {split_expr} AS is_test FROM documents
    ),
    g AS (
      SELECT doc_id, lang, is_test,
             ('0x' || substr(md5('lid:' || ' ' || substr(text, i, {_LID_N})), 1, 8))::BIGINT
               % {_LID_B} AS bucket
      FROM d,
           LATERAL (SELECT unnest(generate_series(1, length(text) - {_LID_N - 1})) AS i) s
    ),
    counts AS (
      SELECT lang, bucket, COUNT(*) AS c FROM g WHERE {train_pred} GROUP BY 1, 2
    ),
    tots AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS tot FROM counts GROUP BY 1),
    w AS (
      SELECT c.lang, c.bucket,
             CAST(round((ln(c.c + 1) - ln(t.tot + {_LID_B})) * 1000000, 0)
                  AS BIGINT) AS w_q
      FROM counts c JOIN tots t USING (lang)
    ),
    nd AS (SELECT lang, COUNT(*) AS n_docs FROM d WHERE {train_pred} GROUP BY 1),
    cl AS (
      SELECT nd.lang,
             CAST(round(ln(nd.n_docs + 1) * 1000000, 0) AS BIGINT) AS prior_q,
             CAST(round(-ln(COALESCE(t.tot, 0) + {_LID_B}) * 1000000, 0)
                  AS BIGINT) AS unseen_q
      FROM nd LEFT JOIN tots t USING (lang)
    ),
    pdoc AS (
      SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM g WHERE {score_pred} GROUP BY 1, 2
    ),
    scored AS (
      SELECT p.doc_id, c.lang AS cand,
             c.prior_q + CAST(SUM(p.cnt * COALESCE(w.w_q, c.unseen_q)) AS BIGINT)
               AS score_q
      FROM pdoc p
      CROSS JOIN cl c
      LEFT JOIN w ON w.bucket = p.bucket AND w.lang = c.lang
      GROUP BY p.doc_id, c.lang, c.prior_q
    ),
    best AS (
      SELECT doc_id, cand, score_q FROM (
        SELECT doc_id, cand, score_q,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score_q DESC, cand) AS rn
        FROM scored) WHERE rn = 1
    )"""


@query(
    "q_langid_nb",
    bench=True,  # r10: the char-trigram K-class serve scan gets an sf0.1 number
    oracle=_langid_oracle_ctes("TRUE", "TRUE", "FALSE")
    + """
    SELECT d.doc_id, d.lang, b.cand AS pred_lang, b.score_q,
           (d.lang = b.cand) AS correct
    FROM d JOIN best b USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="Trained multi-class language identifier: multinomial Naive Bayes "
    f"over hashed character trigrams ({_LID_B} buckets) — the CCNet "
    "first-stage fasttext-langid pattern in its closed-form SGD-free "
    "shape, the K-class generalization of q_quality_classifier. ln() "
    "runs once per (class, bucket) cell and quantizes to integer "
    "micro-nats; each document's K class scores are exact BIGINT dot "
    "products of its trigram bucket counts with the broadcast weight "
    "table; the argmax breaks ties toward the smaller class code — so "
    "predictions are bit-stable across engines and partitionings. "
    "Training is one map-side explode folding to K·B count cells; "
    "serving is one corpus scan, a K-row class cross, and a per-doc "
    "argmax window (operators/langid_nb.py).",
)
def q_langid_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.langid_nb import (
        char_ngram_bucket_counts,
        langid_classify,
        langid_train,
    )

    docs = load(spark, sf_dir, "documents")
    # one pinned feature pass serves BOTH training and scoring — the
    # char-explode + md5 fold is the query's CPU-heavy stage
    feats = pin(char_ngram_bucket_counts(docs, "doc_id", "text"))
    weights, classes = langid_train(
        docs, "doc_id", "text", "lang", features=feats
    )
    pred = langid_classify(
        docs, "doc_id", "text", weights, classes, features=feats
    )
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .select(
            "doc_id",
            "lang",
            "pred_lang",
            "score_q",
            (F.col("lang") == F.col("pred_lang")).alias("correct"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_langid_holdout",
    oracle=_langid_oracle_ctes(
        "NOT is_test",
        "is_test",
        _SQL_U.format(salt=LID_SPLIT_SALT) + f" < {LID_TEST_FRAC}",
    )
    + """
    SELECT d.lang, b.cand AS pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(b.score_q) AS BIGINT) AS sum_score_q
    FROM d JOIN best b USING (doc_id)
    GROUP BY 1, 2 ORDER BY lang, pred_lang
    """,
    doc="Language-identifier holdout evaluation: the q_classifier_holdout "
    f"hygiene applied to the multi-class model — a deterministic hash "
    f"split ({LID_TEST_FRAC:.0%} test, membership a pure function of "
    "doc_id), char-trigram NB trained on the TRAIN side only, the TEST "
    "side scored (train-unseen buckets fall back to each class's "
    "zero-count weight), and the K×K confusion matrix reported with "
    "per-cell exact score sums so the driver gate value-checks every "
    "holdout score (operators/langid_nb.py + operators/sampling.py "
    "train_test_split).",
)
def q_langid_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.langid_nb import langid_classify, langid_train

    docs = load(spark, sf_dir, "documents")
    # the split relation feeds three consumers (train features, class
    # counts, test scoring) — pin it so the split hash evaluates once
    split = pin(
        train_test_split(
            docs.select("doc_id", "lang", "text"),
            "doc_id",
            LID_TEST_FRAC,
            salt=LID_SPLIT_SALT,
        )
    )
    train = split.filter(F.col("split") == "train")
    test = split.filter(F.col("split") == "test")
    weights, classes = langid_train(train, "doc_id", "text", "lang")
    pred = langid_classify(test, "doc_id", "text", weights, classes)
    return (
        test.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("score_q").cast("bigint").alias("sum_score_q"),
        )
        .orderBy("lang", "pred_lang")
    )


# --- Q: unigram-LM (SentencePiece-style) Viterbi segmentation -------------------

from ..operators.unigram_lm import (  # noqa: E402
    UNI_MAX_PIECE as _UNI_P,
    UNI_MAX_WORD as _UNI_W,
    UNI_TOP as _UNI_T,
)


def _unigram_oracle(max_piece: int, top: int, max_word: int) -> tuple[str, str]:
    """Replays the unigram-LM pipeline: the closed-form vocabulary
    (weighted piece counts -> top-V + char floor -> quantized micro-nat
    log-probs), then the exact-integer Viterbi DP as ONE CHAINED CTE PER
    POSITION — b<i> holds each word's best prefix segmentation at
    position i, the per-step winner picked by the same total order
    (score DESC, n_pieces ASC, start ASC) the Spark DP uses. Returns
    (cte_chain, per-word final UNION) so the segmentation row and the
    fertility row share one chain."""
    head = f"""WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    wc AS MATERIALIZED (SELECT w AS word, COUNT(*) AS cnt FROM tok GROUP BY 1),
    pieces AS (
      SELECT substr(word, i, l) AS piece, CAST(SUM(cnt) AS BIGINT) AS c
      FROM wc,
           LATERAL (SELECT unnest(generate_series(1, length(word))) AS i) a,
           LATERAL (SELECT unnest(generate_series(1, {max_piece})) AS l) b
      WHERE i + l - 1 <= length(word)
      GROUP BY 1
    ),
    topv AS (SELECT piece, c FROM pieces ORDER BY c DESC, piece LIMIT {top}),
    vocab0 AS (
      SELECT DISTINCT piece, c FROM (
        SELECT piece, c FROM topv
        UNION ALL SELECT piece, c FROM pieces WHERE length(piece) = 1)
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM vocab0),
    vocab AS MATERIALIZED (
      SELECT piece, CAST(round((ln(c) - ln(t)) * 1000000, 0) AS BIGINT) AS lp_q
      FROM vocab0, tot
    ),
    words AS MATERIALIZED (SELECT word FROM wc WHERE length(word) <= {max_word}),
    b0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS score, 0 AS np, '' AS seg FROM words)"""
    parts = [head]
    for i in range(1, max_word + 1):
        cands = []
        for j in range(max(0, i - max_piece), i):
            cands.append(
                f"""
      SELECT b.word, b.score + v.lp_q AS score, b.np + 1 AS np, {j} AS j,
             b.seg || CASE WHEN b.seg = '' THEN '' ELSE ' ' END || v.piece AS seg
      FROM b{j} b JOIN vocab v ON v.piece = substr(b.word, {j + 1}, {i - j})
      WHERE length(b.word) >= {i}"""
            )
        parts.append(
            f"""c{i} AS ({" UNION ALL ".join(cands)}
    ),
    b{i} AS MATERIALIZED (
      SELECT word, score, np, seg FROM (
        SELECT word, score, np, seg,
               ROW_NUMBER() OVER (PARTITION BY word
                                  ORDER BY score DESC, np, j) AS rn
        FROM c{i}) WHERE rn = 1
    )"""
        )
    finals = [
        f"SELECT word, score AS score_q, np AS n_pieces, seg FROM b{L}"
        f" WHERE length(word) = {L}"
        for L in range(1, max_word + 1)
    ]
    return ",\n".join(parts), "\nUNION ALL\n".join(finals)


_UNI_CHAIN, _UNI_FINALS = _unigram_oracle(_UNI_P, _UNI_T, _UNI_W)


@query(
    "q_unigram_segment",
    bench=True,  # r10: the distinct-word Viterbi pass gets an sf0.1 number
    oracle=_UNI_CHAIN + "\n" + _UNI_FINALS + "\nORDER BY word",
    doc="Unigram-LM (SentencePiece-style) Viterbi segmentation (Kudo "
    "2018) — the second production tokenizer family next to the BPE "
    "stack: a closed-form vocabulary (corpus substrings of length 1..4 "
    f"weighted by token counts, top-{_UNI_T} by count plus the "
    "single-character totality floor, log-probs quantized to integer "
    "micro-nats with ln() once per PIECE), then the maximum-likelihood "
    "segmentation of every distinct word by exact-integer Viterbi DP "
    "with a total candidate order (score DESC, pieces ASC, start ASC) — "
    "so the winning score, piece count AND the split string itself are "
    "bit-stable and value-checked. The vocab collect is model-sized "
    "(BPE-merges contract); segmentation runs over the DISTINCT-word "
    "relation — vocabulary-sized, not corpus-sized — in one "
    "Arrow-batched pass; the oracle replays the DP as one chained CTE "
    "per character position (operators/unigram_lm.py).",
)
def q_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram_lm import (
        corpus_words,
        unigram_vocab,
        viterbi_segment,
    )

    docs = load(spark, sf_dir, "documents")
    vocab = unigram_vocab(docs, "text", _UNI_P, _UNI_T)
    words = (
        corpus_words(docs, "text")
        .filter(F.length("word") <= _UNI_W)
        .select("word")
    )
    return viterbi_segment(words, vocab, "word", _UNI_P).orderBy("word")


# --- Q: streaming eval-set decontamination --------------------------------------


@query(
    "q_streaming_decontamination",
    oracle=_QUERIES["q_eval_decontamination"].oracle,
    doc="STREAMING eval-set decontamination, value-checked end to end: "
    "the eval benchmark's distinct window texts publish ONCE as a "
    "write-once committed probe index, then train documents arrive as "
    "three micro-batches, each probed against the broadcast index on "
    "arrival (per-batch cost is batch-sized — one window explode, one "
    "semi-join, one per-document span merge; no full-corpus read after "
    "index build). Spans land in a batch-partitioned log with dynamic "
    "overwrite (replay-idempotent). A document's spans depend only on "
    "itself and the fixed index, so streamed == batch BIT-EXACTLY — "
    "this row reuses q_eval_decontamination's oracle VERBATIM (the "
    "q_streaming_nb_train identity-as-correctness pattern; "
    "streaming/decon_stream.py).",
)
def q_streaming_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..streaming.decon_stream import (
        build_eval_index,
        read_decon_spans,
        run_streaming_decon,
    )

    base = tempfile.mkdtemp(prefix="tf_stream_decon_")
    staging = os.path.join(base, "staging")
    index = os.path.join(base, "eval_index")
    spans = os.path.join(base, "spans")
    ckpt = os.path.join(base, "ckpt")
    docs = load(spark, sf_dir, "documents")
    toks = F.expr("filter(split(text, ' '), t -> t != '')")
    eval_df = docs.filter(F.col("doc_id") % DECON_MOD == 0).select(
        "doc_id",
        F.concat_ws(" ", F.slice(toks, DECON_OFF, DECON_LEN)).alias("text"),
    )
    build_eval_index(eval_df, index, "doc_id", "text", SUBSTR_W)
    for parity in (0, 1, 2):
        docs.filter(F.col("doc_id") % 3 == parity).select(
            "doc_id", "text"
        ).coalesce(1).write.mode("append").parquet(staging)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = run_streaming_decon(stream, index, spans, ckpt, "doc_id", "text", SUBSTR_W)
    q.awaitTermination()
    out = (
        read_decon_spans(spark, spans)
        .orderBy("doc_id", "span_start")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return out


# --- Q: streaming multi-class langid training ------------------------------------


@query(
    "q_streaming_langid_train",
    oracle=_QUERIES["q_langid_nb"].oracle,
    doc="STREAMING multi-class language-identifier training, value-checked "
    "end to end: documents arrive as three micro-batches whose "
    "per-(class, bucket) char-trigram counts and per-class doc counts — "
    "the K-class model's sufficient statistics, plain integer sums — "
    "accumulate in write-once batch-suffixed state (replay-guarded, the "
    "nb_stream discipline with a class dimension). Because the "
    "statistics MERGE exactly, the model derived from the streamed "
    "state is bit-identical to batch training over the whole corpus — "
    "so this row reuses q_langid_nb's oracle VERBATIM: the driver gate "
    "cross-checks streamed == batch == DuckDB on every per-document "
    "prediction and score (streaming/langid_stream.py).",
)
def q_streaming_langid_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators.langid_nb import langid_classify
    from ..streaming.langid_stream import (
        langid_model_from_state,
        run_streaming_langid,
    )

    base = tempfile.mkdtemp(prefix="tf_stream_lid_")
    staging = os.path.join(base, "staging")
    state = os.path.join(base, "state")
    docs = load(spark, sf_dir, "documents")
    for parity in (0, 1, 2):
        docs.filter(F.col("doc_id") % 3 == parity).select(
            "doc_id", "text", "lang"
        ).coalesce(1).write.mode("append").parquet(staging)
    stream = (
        spark.readStream.schema("doc_id bigint, text string, lang string")
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = run_streaming_langid(stream, state, "doc_id", "text", "lang")
    q.awaitTermination()
    weights, classes = langid_model_from_state(spark, state, "lang")
    pred = langid_classify(docs, "doc_id", "text", weights, classes)
    out = (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .select(
            "doc_id",
            "lang",
            "pred_lang",
            "score_q",
            (F.col("lang") == F.col("pred_lang")).alias("correct"),
        )
        .orderBy("doc_id")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return out


# --- Q: the composed CCNet filter (langid -> perplexity tertiles -> keep) -------


@query(
    "q_ccnet_filter",
    oracle=_LM_CTES
    + ",\n    "
    + _langid_body("TRUE", "TRUE", "FALSE")
    + """,
    docscore AS (
      SELECT doc_id, CAST(SUM(term) AS BIGINT) AS score_q
      FROM terms GROUP BY doc_id
    ),
    lidscored AS (
      SELECT b.cand AS pred_lang, s.doc_id, s.score_q
      FROM docscore s JOIN best b USING (doc_id)
    ),
    lidranked AS (
      SELECT pred_lang, doc_id, score_q,
             ROW_NUMBER() OVER (PARTITION BY pred_lang
                                ORDER BY score_q DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY pred_lang) AS n
      FROM lidscored
    ),
    bucketed AS (
      SELECT pred_lang, doc_id, score_q,
             CASE WHEN rn <= (n + 2) // 3 THEN 'head'
                  WHEN rn <= (2 * n + 2) // 3 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM lidranked
    )
    SELECT doc_id, pred_lang, bucket, score_q FROM bucketed
    WHERE bucket <> 'tail' ORDER BY doc_id
    """,
    doc="The composed CCNet pipeline (Wenzek et al. 2020), end to end in "
    "one row: held-out documents get (a) a PREDICTED language from the "
    "trained char-trigram NB identifier — the model CCNet actually "
    "groups by, not the gold label — and (b) a stupid-backoff LM score; "
    "per PREDICTED language the scores split into head/middle/tail "
    "tertiles and the tail drops (CCNet's default keep). Every kept "
    "document's predicted language, bucket, and exact micro-nat score "
    "are value-checked; the oracle chains the LM model, the langid "
    "model, and the tertile window in one CTE list — the two model "
    "chains compose because every term is exact-integer "
    "(operators/langid_nb.py + operators/backoff_lm.py + "
    "operators/evalcurves.py grouped_score_tertiles).",
)
def q_ccnet_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.backoff_lm import backoff_lm_scores
    from ..operators.evalcurves import grouped_score_tertiles
    from ..operators.langid_nb import langid_classify, langid_train

    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % LM_TRAIN_MOD != 0)
    held = docs.filter(F.col("doc_id") % LM_TRAIN_MOD == 0)
    scored = backoff_lm_scores(train, held, "doc_id", "text").select(
        "doc_id", "score_q"
    )
    weights, classes = langid_train(docs, "doc_id", "text", "lang")
    pred = langid_classify(held, "doc_id", "text", weights, classes).select(
        "doc_id", "pred_lang"
    )
    # the joined (LM score x predicted language) relation feeds
    # grouped_rank's two passes — pin it so both model chains run once
    lid_scored = pin(scored.join(pred, "doc_id"))
    buckets = grouped_score_tertiles(lid_scored, "pred_lang", "score_q", "doc_id")
    return (
        buckets.filter(F.col("bucket") != "tail")
        .select("doc_id", "pred_lang", "bucket", "score_q")
        .orderBy("doc_id")
    )


# --- Q: tokenizer fertility by language (unigram-LM pieces per word) -------------


@query(
    "q_unigram_fertility",
    oracle=_UNI_CHAIN
    + """,
    segs AS MATERIALIZED (
"""
    + _UNI_FINALS
    + """
    ),
    ltok AS (
      SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents
    ),
    lwc AS (SELECT lang, w AS word, COUNT(*) AS cnt FROM ltok GROUP BY 1, 2)
    SELECT lang,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(SUM(cnt * s.n_pieces) AS BIGINT) AS n_pieces,
           CAST(SUM(cnt * s.n_pieces) AS BIGINT)
             / CAST(SUM(cnt) AS BIGINT) AS fertility,
           CAST(SUM(cnt * s.score_q) AS BIGINT) AS sum_score_q
    FROM lwc JOIN segs s USING (word)
    GROUP BY 1 ORDER BY lang
    """,
    doc="Tokenizer FERTILITY by language under the unigram-LM vocabulary "
    "(pieces per word — the standard multilingual-tokenizer equity "
    "metric: a language with high fertility pays more sequence length "
    "per word): per-language token occurrences joined against the "
    "distinct-word segmentation table, so the corpus-sized side touches "
    "only (lang, word, count) rows and the DP runs once per DISTINCT "
    "word (the q_unigram_segment relation, reused verbatim). The "
    "corpus-weighted micro-nat score sum rides along, value-checked "
    "exactly; fertility is one final BIGINT/BIGINT division "
    "(operators/unigram_lm.py).",
)
def q_unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram_lm import (
        corpus_words,
        unigram_vocab,
        viterbi_segment,
    )

    docs = load(spark, sf_dir, "documents")
    vocab = unigram_vocab(docs, "text", _UNI_P, _UNI_T)
    words = (
        corpus_words(docs, "text")
        .filter(F.length("word") <= _UNI_W)
        .select("word")
    )
    segs = viterbi_segment(words, vocab, "word", _UNI_P)
    toks = F.expr("filter(split(text, ' '), t -> t != '')")
    lwc = (
        docs.select("lang", F.explode(toks).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        lwc.join(segs, "word")
        .groupBy("lang")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_pieces")).cast("bigint").alias("n_pieces"),
            (
                F.sum(F.col("cnt") * F.col("n_pieces")).cast("bigint")
                / F.sum("cnt").cast("bigint")
            ).alias("fertility"),
            F.sum(F.col("cnt") * F.col("score_q")).cast("bigint").alias("sum_score_q"),
        )
        .orderBy("lang")
    )


# --- Q: DoReMi-style domain reweighting (one exponentiated-gradient step) -------

DOREMI_ETA = 0.5  # multiplicative-weights step size (nats^-1)


@query(
    "q_doremi_weights",
    oracle=_QNB_CTES
    + f""",
    dscore AS (
      SELECT l.doc_id,
             CAST(pr.prior_q + COALESCE(ds.sum_q, 0) AS BIGINT) AS score_q
      FROM lbl l LEFT JOIN docsum ds USING (doc_id) CROSS JOIN pr
    ),
    dom AS (
      SELECT d.source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM({_SQL_TOKENS}) AS BIGINT) AS tokens,
             CAST(SUM(s.score_q) AS BIGINT) AS sum_score_q
      FROM documents d JOIN dscore s USING (doc_id)
      GROUP BY 1
    ),
    tot2 AS (
      SELECT CAST(SUM(sum_score_q) AS BIGINT) AS all_sum,
             CAST(SUM(n_docs) AS BIGINT) AS all_n
      FROM dom
    ),
    rated AS (
      SELECT source, n_docs, tokens, sum_score_q,
             CAST(round(exp({DOREMI_ETA} * (
                     (CAST(sum_score_q AS DOUBLE) / n_docs
                      - CAST(all_sum AS DOUBLE) / all_n) / 1000000.0
                   )) * {TEMP_RATE_SCALE}, 0) AS BIGINT) AS rate_q
      FROM dom, tot2
    ),
    nrm AS (
      SELECT CAST(SUM(CAST(tokens AS DECIMAL(38,0)) * rate_q)
                  AS DECIMAL(38,0)) AS z
      FROM rated
    )
    SELECT source, n_docs, tokens, sum_score_q, rate_q,
           CAST(CAST(tokens AS DECIMAL(38,0)) * rate_q AS DOUBLE)
             / CAST(z AS DOUBLE) AS weight
    FROM rated, nrm
    ORDER BY source
    """,
    doc="DoReMi-style domain reweighting (Xie et al. 2023), one "
    "exponentiated-gradient step: per-source mean quality-classifier "
    "score minus the corpus mean plays the per-domain excess-reward "
    f"signal, and each domain's token-proportional baseline weight "
    f"multiplies by exp(eta * excess) (eta = {DOREMI_ETA}), normalized "
    "once — the multiplicative-weights update DoReMi iterates, composed "
    "from the trained NB classifier. Float discipline: the excess is "
    "IEEE ops over exact integer sums (identical in both engines), "
    "exp() runs ONCE PER DOMAIN and quantizes to an integer rate, the "
    "normalizer is an exact DECIMAL(38,0) sum of integer products "
    "(token counts x 1e9 rates overflow BIGINT at petascale), and the "
    "final weight is one double division. One corpus scan for scoring "
    "joined to one for domain totals; everything after is "
    "domain-cardinality-sized (operators/quality_nb.py).",
)
def q_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality_nb import nb_classify, nb_train
    from ..operators.text import quality_filter

    docs = load(spark, sf_dir, "documents")
    # pin the rule-gate labels: nb_train consumes the labeled relation
    # twice (the eager sufficient-statistics checkpoint + the class-prior
    # doc aggregate) and several queries join labels again downstream —
    # without the pin the gate's O(unique·n)-per-row token scan re-runs
    # once PER CONSUMER (the narrow (doc_id, label) rows are what get
    # cached, never the text)
    labels = pin(
        quality_filter(docs, "doc_id", "text").select(
            "doc_id", F.col("keep").alias("label")
        )
    )
    labeled = docs.select("doc_id", "text").join(labels, "doc_id")
    weights, prior = nb_train(
        labeled, "doc_id", "text", "label", QNB_B, length_feature=True
    )
    scored = nb_classify(
        docs, "doc_id", "text", weights, prior, QNB_B, length_feature=True
    ).select("doc_id", "score_q")
    toks = F.size(F.expr("filter(split(text, ' '), x -> x != '')")).cast("bigint")
    # the domain-summary relation is domain-cardinality-sized but feeds
    # every downstream consumer (corpus totals, rates, normalizer, final
    # select) — pin it so the classifier train+serve chain runs once
    dom = pin(
        docs.select("doc_id", "source", toks.alias("__tok"))
        .join(scored, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("__tok").cast("bigint").alias("tokens"),
            F.sum("score_q").cast("bigint").alias("sum_score_q"),
        )
    )
    tot = dom.agg(
        F.sum("sum_score_q").cast("bigint").alias("__all_sum"),
        F.sum("n_docs").cast("bigint").alias("__all_n"),
    )
    excess = (
        F.col("sum_score_q").cast("double") / F.col("n_docs")
        - F.col("__all_sum").cast("double") / F.col("__all_n")
    ) / F.lit(1_000_000.0)
    rated = dom.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens",
        "sum_score_q",
        F.round(
            F.exp(F.lit(DOREMI_ETA) * excess) * F.lit(TEMP_RATE_SCALE), 0
        )
        .cast("bigint")
        .alias("rate_q"),
    )
    nrm = rated.agg(
        F.sum(
            (F.col("tokens").cast("decimal(38,0)") * F.col("rate_q")).cast(
                "decimal(38,0)"
            )
        )
        .cast("decimal(38,0)")
        .alias("__z")
    )
    return (
        rated.crossJoin(F.broadcast(nrm))
        .select(
            "source",
            "n_docs",
            "tokens",
            "sum_score_q",
            "rate_q",
            (
                (F.col("tokens").cast("decimal(38,0)") * F.col("rate_q")).cast(
                    "double"
                )
                / F.col("__z").cast("double")
            ).alias("weight"),
        )
        .orderBy("source")
    )


# --- Q: trained-vs-heuristic language-ID agreement -------------------------------

from .textstats import _M_SQL as _LID_M_SQL  # noqa: E402
from .textstats import LANG_MARKERS as _LID_MARKERS  # noqa: E402


@query(
    "q_langid_agreement",
    oracle=_langid_oracle_ctes("TRUE", "TRUE", "FALSE")
    + f""",
    ht AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM d
    ),
    h AS (
      SELECT doc_id,
             len(list_filter(toks, t -> t IN ({_LID_M_SQL['de']}))) AS h_de,
             len(list_filter(toks, t -> t IN ({_LID_M_SQL['en']}))) AS h_en,
             len(list_filter(toks, t -> t IN ({_LID_M_SQL['fr']}))) AS h_fr
      FROM ht
    ),
    heur AS (
      SELECT doc_id,
             CASE WHEN h_fr > GREATEST(h_de, h_en) THEN 'fr'
                  WHEN h_en > h_de THEN 'en'
                  ELSE 'de' END AS pred_heur
      FROM h
    ),
    tot3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM best)
    SELECT hr.pred_heur, b.cand AS pred_nb,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) / CAST(MAX(tot3.nn) AS BIGINT) AS frac
    FROM best b JOIN heur hr USING (doc_id) CROSS JOIN tot3
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Trained-vs-heuristic language-ID agreement: the K x K' matrix "
    "between the marker-word heuristic (q_lang_id, the CCNet-style cheap "
    "first pass) and the trained char-trigram NB identifier "
    "(q_langid_nb) — the calibration readout that tells a pipeline owner "
    "where the cheap gate and the trained model disagree before swapping "
    "one for the other. Exact counts plus one BIGINT/BIGINT share "
    "division per cell; both prediction chains replayed in one oracle "
    "(operators/langid_nb.py + operators/text.py lang_id_scores).",
)
def q_langid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.langid_nb import langid_classify, langid_train
    from ..operators.text import lang_id_scores

    docs = load(spark, sf_dir, "documents")
    weights, classes = langid_train(docs, "doc_id", "text", "lang")
    nb = langid_classify(docs, "doc_id", "text", weights, classes).select(
        "doc_id", F.col("pred_lang").alias("pred_nb")
    )
    heur = lang_id_scores(docs, "text", _LID_MARKERS).select(
        "doc_id", F.col("pred_lang").alias("pred_heur")
    )
    joined = nb.join(heur, "doc_id")
    tot = joined.agg(F.count("*").cast("bigint").alias("__nn"))
    return (
        joined.groupBy("pred_heur", "pred_nb")
        .agg(F.count("*").cast("bigint").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "pred_heur",
            "pred_nb",
            "n",
            (F.col("n") / F.col("__nn")).alias("frac"),
        )
        .orderBy("pred_heur", "pred_nb")
    )


# --- Q: unigram-LM hard-EM vocabulary refinement ---------------------------------


@query(
    "q_unigram_hard_em",
    oracle=_UNI_CHAIN
    + """,
    segs AS MATERIALIZED (
"""
    + _UNI_FINALS
    + """
    ),
    usage AS (
      SELECT p.piece, CAST(SUM(wc.cnt) AS BIGINT) AS cnt
      FROM segs s JOIN wc ON wc.word = s.word,
           LATERAL (SELECT unnest(string_split(s.seg, ' ')) AS piece) p
      GROUP BY 1
    ),
    tot2 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM usage)
    SELECT piece, cnt,
           CAST(round((ln(cnt) - ln(t)) * 1000000, 0) AS BIGINT) AS lp_q
    FROM usage, tot2 ORDER BY piece
    """,
    doc="Unigram-LM HARD-EM vocabulary refinement (the engine-exact member "
    "of SentencePiece's EM/prune loop, Kudo 2018 §4): E-step = the "
    "Viterbi segmentation of every distinct word (q_unigram_segment's "
    "relation, reused verbatim), M-step = re-counting each piece's usage "
    "across the corpus (occurrences in best splits, weighted by token "
    "counts) and re-deriving quantized micro-nat log-probs; pieces no "
    "Viterbi split uses DROP — the prune step. Soft EM's fractional "
    "counts are float-order-sensitive; hard EM is integer-exact, so the "
    "refined vocabulary (counts AND log-probs) is value-checked "
    "bit-for-bit. The usage explode runs over the distinct-word "
    "segmentation relation — vocabulary-sized, never a corpus scan "
    "(operators/unigram_lm.py hard_em_reestimate).",
)
def q_unigram_hard_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.unigram_lm import (
        corpus_words,
        hard_em_reestimate,
        unigram_vocab,
        viterbi_segment,
    )

    docs = load(spark, sf_dir, "documents")
    vocab = unigram_vocab(docs, "text", _UNI_P, _UNI_T)
    # the word-count relation feeds the segmentation input AND the
    # M-step weighting — pin it so the token explode runs once
    wc = pin(corpus_words(docs, "text").filter(F.length("word") <= _UNI_W))
    segs = viterbi_segment(wc.select("word"), vocab, "word", _UNI_P).select(
        "word", "seg"
    )
    return hard_em_reestimate(segs, wc).orderBy("piece")


# --- Q: score-drift monitoring (population stability index) ----------------------

PSI_BINS = 10


@query(
    "q_score_drift_psi",
    oracle=_QNB_CTES
    + f""",
    dscore AS (
      SELECT l.doc_id,
             CAST(pr.prior_q + COALESCE(ds.sum_q, 0) AS BIGINT) AS score_q
      FROM lbl l LEFT JOIN docsum ds USING (doc_id) CROSS JOIN pr
    ),
    halves AS (SELECT doc_id, score_q, doc_id % 2 = 0 AS is_ref FROM dscore),
    refsorted AS (
      SELECT score_q, ROW_NUMBER() OVER (ORDER BY score_q, doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM halves WHERE is_ref
    ),
    edges AS (
      SELECT r.score_q AS edge
      FROM (SELECT unnest(generate_series(1, {PSI_BINS - 1})) AS k) ks
      JOIN refsorted r ON r.rn = GREATEST(1, (ks.k * r.n) // {PSI_BINS})
    ),
    binned AS (
      SELECT h.doc_id, h.is_ref,
             1 + CAST(SUM(CASE WHEN h.score_q > e.edge THEN 1 ELSE 0 END)
                      AS BIGINT) AS bin
      FROM halves h CROSS JOIN edges e
      GROUP BY h.doc_id, h.is_ref
    ),
    cnts AS (
      SELECT bin,
             CAST(COUNT(*) FILTER (is_ref) AS BIGINT) AS ref_n,
             CAST(COUNT(*) FILTER (NOT is_ref) AS BIGINT) AS cur_n
      FROM binned GROUP BY 1
    ),
    tots AS (
      SELECT CAST(SUM(ref_n) AS BIGINT) AS refN,
             CAST(SUM(cur_n) AS BIGINT) AS curN
      FROM cnts
    ),
    allb AS (SELECT unnest(generate_series(1, {PSI_BINS})) AS bin)
    SELECT CAST(allb.bin AS BIGINT) AS bin,
           CAST(COALESCE(c.ref_n, 0) AS BIGINT) AS ref_n,
           CAST(COALESCE(c.cur_n, 0) AS BIGINT) AS cur_n,
           round(((COALESCE(c.ref_n, 0) + 1) / CAST(refN + {PSI_BINS} AS DOUBLE)
            - (COALESCE(c.cur_n, 0) + 1) / CAST(curN + {PSI_BINS} AS DOUBLE))
           * ln(((COALESCE(c.ref_n, 0) + 1) / CAST(refN + {PSI_BINS} AS DOUBLE))
                / ((COALESCE(c.cur_n, 0) + 1) / CAST(curN + {PSI_BINS} AS DOUBLE))), 9)
             AS psi_term
    FROM allb LEFT JOIN cnts c USING (bin) CROSS JOIN tots
    ORDER BY allb.bin
    """,
    doc="Score-drift monitoring: the population stability index between "
    "two corpus cohorts (even/odd doc ids standing in for last-week vs "
    "this-week) under the FROZEN trained quality classifier — the "
    "standard production monitor that catches a shifted input "
    "distribution before it poisons downstream filters (PSI < 0.1 "
    f"stable, > 0.25 drifted). Bins are the reference cohort's exact "
    f"{PSI_BINS}-quantile edges (rank SELECTION — values that exist in "
    "the data, bit-agreeable), counts are exact integers with Laplace "
    "smoothing, ln() runs once per bin, and every per-bin PSI term is "
    "value-checked (operators/evalcurves.py score_drift_psi).",
)
def q_score_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evalcurves import score_drift_psi
    from ..operators.quality_nb import nb_classify, nb_train
    from ..operators.text import quality_filter

    docs = load(spark, sf_dir, "documents")
    # pin the rule-gate labels: nb_train consumes the labeled relation
    # twice (the eager sufficient-statistics checkpoint + the class-prior
    # doc aggregate) and several queries join labels again downstream —
    # without the pin the gate's O(unique·n)-per-row token scan re-runs
    # once PER CONSUMER (the narrow (doc_id, label) rows are what get
    # cached, never the text)
    labels = pin(
        quality_filter(docs, "doc_id", "text").select(
            "doc_id", F.col("keep").alias("label")
        )
    )
    labeled = docs.select("doc_id", "text").join(labels, "doc_id")
    weights, prior = nb_train(
        labeled, "doc_id", "text", "label", QNB_B, length_feature=True
    )
    # the scored relation feeds the reference rank pass AND the binning
    # pass — pin it so the classifier chain runs once
    scored = pin(
        nb_classify(
            docs, "doc_id", "text", weights, prior, QNB_B, length_feature=True
        ).select("doc_id", "score_q")
    )
    return score_drift_psi(
        scored, F.col("doc_id") % 2 == 0, "score_q", "doc_id", PSI_BINS
    ).orderBy("bin")


# --- Q: streaming score-drift monitoring -----------------------------------------


@query(
    "q_streaming_drift_psi",
    oracle=_QUERIES["q_score_drift_psi"].oracle,
    doc="STREAMING drift monitoring, value-checked end to end: the "
    "reference cohort's quantile edges and histogram freeze ONCE as "
    "committed write-once state (monitoring against a moving baseline "
    "is the classic monitoring bug), then the current cohort streams in "
    "as three micro-batches, each binned against the broadcast frozen "
    "edges and merged into n_bins rows of write-once replay-guarded "
    "state — bin counts are plain integer sums, so the accumulated "
    "histogram is bit-identical to binning the whole cohort at once, "
    "and the streamed PSI equals the batch monitor exactly: this row "
    "reuses q_score_drift_psi's oracle VERBATIM "
    "(streaming/drift_stream.py).",
)
def q_streaming_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators.quality_nb import nb_classify, nb_train
    from ..operators.text import quality_filter
    from ..streaming.drift_stream import (
        build_drift_reference,
        psi_from_drift_state,
        run_streaming_drift,
    )

    base = tempfile.mkdtemp(prefix="tf_stream_drift_")
    staging = os.path.join(base, "staging")
    ref_dir = os.path.join(base, "ref")
    state = os.path.join(base, "state")
    docs = load(spark, sf_dir, "documents")
    # pin the rule-gate labels: nb_train consumes the labeled relation
    # twice (the eager sufficient-statistics checkpoint + the class-prior
    # doc aggregate) and several queries join labels again downstream —
    # without the pin the gate's O(unique·n)-per-row token scan re-runs
    # once PER CONSUMER (the narrow (doc_id, label) rows are what get
    # cached, never the text)
    labels = pin(
        quality_filter(docs, "doc_id", "text").select(
            "doc_id", F.col("keep").alias("label")
        )
    )
    labeled = docs.select("doc_id", "text").join(labels, "doc_id")
    weights, prior = nb_train(
        labeled, "doc_id", "text", "label", QNB_B, length_feature=True
    )
    scored = pin(
        nb_classify(
            docs, "doc_id", "text", weights, prior, QNB_B, length_feature=True
        ).select("doc_id", "score_q")
    )
    build_drift_reference(
        scored.filter(F.col("doc_id") % 2 == 0), ref_dir,
        "score_q", "doc_id", PSI_BINS,
    )
    cur = scored.filter(F.col("doc_id") % 2 == 1)
    for parity in (0, 1, 2):
        cur.filter(F.col("doc_id") % 3 == parity).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
    stream = (
        spark.readStream.schema("doc_id bigint, score_q bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = run_streaming_drift(stream, ref_dir, state, "score_q", "doc_id", PSI_BINS)
    q.awaitTermination()
    out = (
        psi_from_drift_state(spark, ref_dir, state, PSI_BINS)
        .orderBy("bin")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(base, ignore_errors=True)
    return out
