"""Text-analysis queries over the documents table: per-doc token/quality
stats, corpus profiling, BPE-ish token estimates, and content fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as T
from ..tables import load
from .catalog import query

_STOP_SQL = ", ".join(f"'{s}'" for s in T.STOPWORDS)

_SQL_TOKS = """
    toks AS (
      SELECT doc_id, lang, source, length(text) AS n_chars,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    )
"""


@query(
    "q_text_stats",
    oracle=f"""
    WITH {_SQL_TOKS},
    stats AS (
      SELECT doc_id, n_chars,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_unique,
             len(list_filter(toks, t -> t IN ({_STOP_SQL}))) AS n_stopwords,
             CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT) AS sum_len
      FROM toks
    )
    SELECT doc_id, n_chars, n_tokens, n_unique, n_stopwords,
           sum_len / n_tokens AS avg_token_len,
           n_stopwords / n_tokens AS stopword_ratio,
           n_unique / n_tokens AS unique_ratio,
           least(n_tokens / 100.0, 1.0) * 0.5
             + (n_unique / n_tokens) * 0.3
             + (n_stopwords / n_tokens) * 0.2 AS quality
    FROM stats
    ORDER BY doc_id
    """,
    bench=True,
    doc="Per-document token statistics + deterministic quality score "
    "(length/diversity/stopword blend) — heuristic quality filtering for a "
    "training-data pipeline.",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return T.token_stats(docs, "doc_id", "text").orderBy("doc_id")


@query(
    "q_corpus_profile",
    oracle=f"""
    WITH {_SQL_TOKS}
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM toks
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    doc="Corpus profiling: per (lang, source) document/token/char totals — "
    "the count-per-type dashboard shape (reference DataServicesService.scala:25-49).",
)
def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = T.toks_col("text")
    return (
        docs.select("lang", "source", F.length("text").alias("n_chars"), F.size(toks).alias("n_tokens"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


@query(
    "q_token_estimates",
    oracle=f"""
    WITH {_SQL_TOKS}
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(toks)) AS BIGINT) AS total_words,
           CAST(SUM(CAST(list_sum(list_transform(toks, t -> (len(t) + 3) // 4)) AS BIGINT)) AS BIGINT) AS est_bpe_tokens
    FROM toks
    GROUP BY source
    ORDER BY source
    """,
    doc="BPE-ish token budget per source: ceil(len/4) per word — the token "
    "accounting pass of a training-data pipeline.",
)
def q_token_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = T.toks_col("text")
    return (
        docs.select("source", F.size(toks).alias("n_words"), T.bpe_token_estimate("text").alias("est_bpe"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("est_bpe").alias("est_bpe_tokens"),
        )
        .orderBy("source")
    )


@query(
    "q_pretoken_counts",
    oracle=f"""
    WITH p AS (
      SELECT lang,
             regexp_extract_all(text, '{T.PRETOKEN_REGEX.replace("'", "''")}') AS pre
      FROM documents
    ),
    c AS (
      SELECT lang, len(pre) AS n_pre,
             len(list_filter(pre, t -> regexp_matches(t, '^ ?\\p{{L}}'))) AS n_word,
             len(list_filter(pre, t -> regexp_matches(t, '^\\s+$'))) AS n_ws
      FROM p
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_pre) AS BIGINT) AS total_pretokens,
           CAST(SUM(n_word) AS BIGINT) AS word_pretokens,
           CAST(SUM(n_ws) AS BIGINT) AS ws_pretokens
    FROM c GROUP BY lang ORDER BY lang
    """,
    doc="Realistic token accounting: per-language pretoken totals under a "
    "GPT-2-style pretokenizer regex (contractions, space-prefixed "
    "letter/digit/punct runs, whitespace runs) restricted to "
    "RE2-compatible constructs so Java regex (Spark) and RE2 (DuckDB) "
    "split identically — a pure JVM regexp projection + one aggregate, "
    "the counting pass a token-budgeted pipeline runs before committing "
    "to a tokenizer (operators/text.py pretokens_col).",
)
def q_pretoken_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pre = T.pretokens_col("text")
    is_word = lambda t: t.rlike(r"^ ?\p{L}")  # noqa: E731
    is_ws = lambda t: t.rlike(r"^\s+$")  # noqa: E731
    d = docs.select(
        "lang",
        F.size(pre).alias("n_pre"),
        F.size(F.filter(pre, is_word)).alias("n_word"),
        F.size(F.filter(pre, is_ws)).alias("n_ws"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_pre").alias("total_pretokens"),
            F.sum("n_word").alias("word_pretokens"),
            F.sum("n_ws").alias("ws_pretokens"),
        )
        .orderBy("lang")
    )


@query(
    "q_doc_fingerprint",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - 2)) AS i) s
    ),
    hashed AS (
      SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h FROM sh
    ),
    ranked AS (
      SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn
      FROM hashed
    )
    SELECT doc_id, string_agg(h::VARCHAR, ',' ORDER BY h) AS fingerprint
    FROM ranked WHERE rn <= 5
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    doc="Winnowing-style min-5-hash content fingerprint per document — cheap "
    "near-dup clustering key (document fingerprinting via rolling hashes).",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return T.min_k_fingerprint(docs, "doc_id", "text", n=3, k=5).orderBy("doc_id")


# language-ID markers, sorted and fixed so the oracle embeds identical
# literals (the n-gram/stopword-marker heuristic of the LLM-pipeline brief)
LANG_MARKERS = {
    "de": ("das", "der", "die", "und"),
    "en": ("and", "of", "the", "to"),
    "fr": ("de", "et", "la", "le", "les"),
}

_M_SQL = {k: ", ".join(f"'{w}'" for w in v) for k, v in LANG_MARKERS.items()}


@query(
    "q_lang_id",
    oracle=f"""
    WITH {_SQL_TOKS},
    h AS (
      SELECT doc_id, lang,
             len(list_filter(toks, t -> t IN ({_M_SQL['de']}))) AS h_de,
             len(list_filter(toks, t -> t IN ({_M_SQL['en']}))) AS h_en,
             len(list_filter(toks, t -> t IN ({_M_SQL['fr']}))) AS h_fr
      FROM toks
    )
    SELECT doc_id, lang,
           CASE WHEN h_fr > GREATEST(h_de, h_en) THEN 'fr'
                WHEN h_en > h_de THEN 'en'
                ELSE 'de' END AS pred_lang,
           GREATEST(h_de, h_en, h_fr) AS lang_hits
    FROM h
    ORDER BY doc_id
    """,
    doc="Marker-word language ID per document (argmax of per-language "
    "stopword hits, deterministic ascending-code tie-break) — the n-gram "
    "heuristic language filter of a training-data pipeline; pure column "
    "expressions, no shuffle beyond the scan.",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        T.lang_id_scores(docs, "text", LANG_MARKERS)
        .select("doc_id", "lang", "pred_lang", "lang_hits")
        .orderBy("doc_id")
    )


@query(
    "q_text_repetition",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)), l -> l <> '') AS lines,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, lines,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1])
                  ELSE [] END AS grams
      FROM d
    )
    SELECT doc_id,
           len(lines) AS n_lines,
           CASE WHEN len(lines) > 0
                THEN 1.0 - len(list_distinct(lines)) / len(lines)
                ELSE 0.0 END AS dup_line_frac,
           len(grams) AS n_2grams,
           CASE WHEN len(grams) > 0
                THEN 1.0 - len(list_distinct(grams)) / len(grams)
                ELSE 0.0 END AS dup_2gram_frac,
           CASE WHEN len(grams) > 0
                THEN list_max(list_transform(list_distinct(grams),
                       x -> len(list_filter(grams, y -> y = x)))) / len(grams)
                ELSE 0.0 END AS top_2gram_frac
    FROM g
    ORDER BY doc_id
    """,
    doc="Repetition-based quality signals per document (duplicate-line "
    "fraction, duplicate-bigram fraction, top-bigram share) — the "
    "Gopher/C4-style repetition filters of a training-data pipeline, as "
    "pure array expressions.",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return T.repetition_stats(docs, "doc_id", "text").orderBy("doc_id")


# --- Q: exact heavy hitters (two-pass Misra-Gries) -----------------------------

HH_K = 40  # heavy hitter = token with count > N/40 (share > 2.5%)


@query(
    "q_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM toks),
    cnts AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token)
    SELECT token, cnt, CAST(cnt AS DOUBLE) / n AS share
    FROM cnts, tot
    WHERE cnt * {HH_K} > n
    ORDER BY cnt DESC, token
    """,
    doc="Exact corpus heavy hitters (tokens with frequency share > 1/k): "
    "per-partition Misra-Gries candidate summaries (O(k) memory, no "
    "shuffle) + broadcast-joined exact recount — never shuffles the "
    "vocabulary, and the MG superset guarantee makes the final answer a "
    "pure function of the data (operators/heavyhitters.py).",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavyhitters import heavy_hitters

    docs = load(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(T.toks_col("text")).alias("token"))
    return heavy_hitters(tokens, "token", HH_K).orderBy(F.desc("cnt"), "token")


# --- Q: per-document TF-IDF keyphrases -----------------------------------------

KW_TOP_K = 3
KW_MAX_DF_NUM = 3  # keyphrase document frequency must be <= 3/10 of corpus
KW_MAX_DF_DEN = 10


@query(
    "q_tfidf_keywords",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS term
      FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM g GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf * n_docs AS DOUBLE) / df.df AS score
      FROM tf JOIN df USING (term), nd
      WHERE df.df * {KW_MAX_DF_DEN} <= n_docs * {KW_MAX_DF_NUM}
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term
      ) AS rnk
      FROM scored
    )
    SELECT doc_id, term, tf, df, score, rnk
    FROM ranked WHERE rnk <= {KW_TOP_K}
    ORDER BY doc_id, rnk
    """,
    doc="Top-3 bigram keyphrases per document by exact-arithmetic TF-DF "
    "salience (raw N/df instead of log-idf so the ranking is bit-stable "
    "cross-engine); corpus-boilerplate terms above a df ceiling are "
    "dropped BEFORE the term join, bounding join skew by construction "
    "(operators/keywords.py).",
)
def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.keywords import tfidf_keywords

    docs = load(spark, sf_dir, "documents")
    return tfidf_keywords(
        docs, "doc_id", "text", w=2, top_k=KW_TOP_K,
        max_df_num=KW_MAX_DF_NUM, max_df_den=KW_MAX_DF_DEN,
    ).orderBy("doc_id", "rnk")


# --- Q: per-language heavy hitters ---------------------------------------------


@query(
    "q_heavy_hitters_by_lang",
    oracle=f"""
    WITH toks AS (
      SELECT lang,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
      FROM documents
    ),
    tot AS (SELECT lang, COUNT(*) AS n FROM toks GROUP BY lang),
    cnts AS (SELECT lang, token, COUNT(*) AS cnt FROM toks GROUP BY 1, 2)
    SELECT c.lang, c.token, c.cnt, CAST(c.cnt AS DOUBLE) / t.n AS share
    FROM cnts c JOIN tot t USING (lang)
    WHERE c.cnt * {HH_K} > t.n
    ORDER BY c.lang, c.cnt DESC, c.token
    """,
    doc="Per-language exact heavy hitters (token share > 1/k WITHIN each "
    "language) — the per-stratum boilerplate/stop-list detector. Misra-"
    "Gries candidate summaries hold group-wise, so recall is exact per "
    "group with the same two-scan budget and no vocabulary-sized shuffle "
    "(operators/heavyhitters.py).",
)
def q_heavy_hitters_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavyhitters import grouped_heavy_hitters

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(T.toks_col("text")).alias("token"))
    return grouped_heavy_hitters(toks, "lang", "token", HH_K).orderBy(
        "lang", F.desc("cnt"), "token"
    )


# --- Q: Gopher repetition filters ----------------------------------------------

# Deterministic repetition synthesis (the same idiom as q_pii_scrub's
# synthetic PII): the test corpus is single-line and near-unique, so both
# engines append, per doc_id, (a) the doc's own first 8 words echoed as two
# extra lines (doc_id % 3 == 0) and (b) a boilerplate line repeated 2-4
# times (doc_id % 5 == 0) — giving every Gopher signal genuinely nonzero
# and zero cases to distinguish.
_GOPHER_BOILER = "subscribe to our newsletter for daily updates now"

_SQL_GOPHER_DIRTY = f"""
    dirty AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN chr(10) || f8 || chr(10) || f8 ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN repeat(chr(10) || '{_GOPHER_BOILER}',
                                 CAST(doc_id % 3 + 2 AS INT))
                     ELSE '' END AS t
      FROM (
        SELECT doc_id, text,
               array_to_string(
                 (list_filter(string_split(text, ' '), x -> x <> ''))[1:8],
                 ' ') AS f8
        FROM documents)
    )"""


def _gopher_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    f8 = F.array_join(
        F.slice(F.filter(F.split("text", " "), lambda w: w != ""), 1, 8), " "
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit("\n"), f8, F.lit("\n"), f8),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.expr(
                    f"repeat('\\n{_GOPHER_BOILER}',"
                    " CAST(doc_id % 3 + 2 AS INT))"
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


@query(
    "q_gopher_repetition",
    oracle=f"""
    WITH {_SQL_GOPHER_DIRTY},
    base AS (
      SELECT doc_id,
             list_filter(string_split(t, chr(10)), x -> x <> '') AS lines,
             list_filter(string_split(replace(t, chr(10), ' '), ' '),
                         x -> x <> '') AS toks
      FROM dirty
    ),
    per_doc AS (
      SELECT doc_id, len(lines) AS n_lines, len(toks) AS n_words,
             CAST(COALESCE(list_sum(list_transform(toks, w -> len(w))), 0)
                  + greatest(len(toks) - 1, 0) AS BIGINT) AS ws_chars
      FROM base
    ),
    lg AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS tot_lines,
             COUNT(*) AS uniq_lines,
             CAST(SUM((cnt - 1) * llen) AS BIGINT) AS dup_chars,
             CAST(SUM(cnt * llen) AS BIGINT) AS line_chars
      FROM (
        SELECT doc_id, line, COUNT(*) AS cnt, len(line) AS llen
        FROM (SELECT doc_id, unnest(lines) AS line FROM base)
        GROUP BY doc_id, line)
      GROUP BY 1
    ),
    grams AS (
      SELECT doc_id, n, array_to_string(toks[i:i+n-1], ' ') AS gram
      FROM base
           CROSS JOIN (SELECT unnest([2, 3, 4]) AS n) ns,
           -- the lateral is bounded by base alone (a two-relation reference
           -- trips DuckDB's lateral binder); the n-dependent cut is the WHERE
           LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
      WHERE i <= len(toks) - n + 1
    ),
    top AS (
      SELECT doc_id,
             MAX(CASE WHEN n = 2 THEN numer END) AS numer2,
             MAX(CASE WHEN n = 3 THEN numer END) AS numer3,
             MAX(CASE WHEN n = 4 THEN numer END) AS numer4
      FROM (
        SELECT doc_id, n, CAST(cnt * len(gram) AS BIGINT) AS numer,
               ROW_NUMBER() OVER (PARTITION BY doc_id, n
                                  ORDER BY cnt DESC, gram) AS rn
        FROM (SELECT doc_id, n, gram, COUNT(*) AS cnt
              FROM grams GROUP BY 1, 2, 3))
      WHERE rn = 1 GROUP BY 1
    ),
    m AS (
      SELECT p.doc_id, p.n_lines, p.n_words,
             CASE WHEN tot_lines > 0
                  THEN (tot_lines - uniq_lines) / tot_lines
                  ELSE 0.0 END AS dup_line_frac,
             CASE WHEN line_chars > 0
                  THEN dup_chars / line_chars ELSE 0.0 END AS dup_line_char_frac,
             CASE WHEN ws_chars > 0
                  THEN COALESCE(numer2, 0) / ws_chars ELSE 0.0 END AS top2gram_frac,
             CASE WHEN ws_chars > 0
                  THEN COALESCE(numer3, 0) / ws_chars ELSE 0.0 END AS top3gram_frac,
             CASE WHEN ws_chars > 0
                  THEN COALESCE(numer4, 0) / ws_chars ELSE 0.0 END AS top4gram_frac
      FROM per_doc p LEFT JOIN lg USING (doc_id) LEFT JOIN top USING (doc_id)
    )
    SELECT *,
           dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
           AND top2gram_frac <= 0.20 AND top3gram_frac <= 0.18
           AND top4gram_frac <= 0.16 AS keep_repetition
    FROM m ORDER BY doc_id
    """,
    doc="Gopher repetition filters, line + top-n-gram half (Rae et al. "
    "2021 table A1): per-document duplicate-line fraction, duplicate-line "
    "CHARACTER fraction, and the character share of the most frequent "
    "word {2,3,4}-gram, with the paper's drop thresholds as a keep flag. "
    "Repetition is synthesized deterministically per doc_id in BOTH "
    "engines (echoed first-8-words lines, repeated boilerplate lines). "
    "All shuffles are keyed by (doc, line) or (doc, gram) — per-task "
    "state is one document's windows, so the operator scales linearly "
    "(operators/gopher.py repetition_signals).",
)
def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.gopher import repetition_signals

    return repetition_signals(
        _gopher_dirty(spark, sf_dir), "doc_id", "text"
    ).orderBy("doc_id")


@query(
    "q_gopher_dup_ngrams",
    oracle=f"""
    WITH {_SQL_GOPHER_DIRTY},
    base AS (
      SELECT doc_id,
             list_filter(string_split(replace(t, chr(10), ' '), ' '),
                         x -> x <> '') AS toks
      FROM dirty
    ),
    words AS (
      SELECT doc_id, i - 1 AS tpos, len(toks[i]) AS wlen
      FROM base, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
    ),
    totals AS (
      SELECT doc_id, CAST(SUM(wlen) AS BIGINT) AS total_chars
      FROM words GROUP BY 1
    ),
    wins AS (
      SELECT doc_id, n, i - 1 AS pos, array_to_string(toks[i:i+n-1], ' ') AS gram
      FROM base
           CROSS JOIN (SELECT unnest(generate_series(5, 10)) AS n) ns,
           -- series bounded by base alone (two-relation lateral refs trip
           -- DuckDB's binder); the n-dependent cut is the WHERE
           LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) s
      WHERE i <= len(toks) - n + 1
    ),
    dup AS (
      SELECT doc_id, n, gram FROM wins GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
    ),
    covered AS (
      SELECT DISTINCT w.doc_id, w.n, w.pos + j AS tpos
      FROM wins w JOIN dup USING (doc_id, n, gram),
           LATERAL (SELECT unnest(generate_series(0, w.n - 1)) AS j) s
    ),
    covw AS (
      SELECT doc_id,
             MAX(CASE WHEN n = 5 THEN cov END) AS cov5,
             MAX(CASE WHEN n = 6 THEN cov END) AS cov6,
             MAX(CASE WHEN n = 7 THEN cov END) AS cov7,
             MAX(CASE WHEN n = 8 THEN cov END) AS cov8,
             MAX(CASE WHEN n = 9 THEN cov END) AS cov9,
             MAX(CASE WHEN n = 10 THEN cov END) AS cov10
      FROM (
        SELECT c.doc_id, c.n, CAST(SUM(w.wlen) AS BIGINT) AS cov
        FROM covered c JOIN words w USING (doc_id, tpos)
        GROUP BY 1, 2)
      GROUP BY 1
    ),
    m AS (
      SELECT t.doc_id,
             CASE WHEN total_chars > 0 THEN COALESCE(cov5, 0) / total_chars ELSE 0.0 END AS dup5_frac,
             CASE WHEN total_chars > 0 THEN COALESCE(cov6, 0) / total_chars ELSE 0.0 END AS dup6_frac,
             CASE WHEN total_chars > 0 THEN COALESCE(cov7, 0) / total_chars ELSE 0.0 END AS dup7_frac,
             CASE WHEN total_chars > 0 THEN COALESCE(cov8, 0) / total_chars ELSE 0.0 END AS dup8_frac,
             CASE WHEN total_chars > 0 THEN COALESCE(cov9, 0) / total_chars ELSE 0.0 END AS dup9_frac,
             CASE WHEN total_chars > 0 THEN COALESCE(cov10, 0) / total_chars ELSE 0.0 END AS dup10_frac
      FROM totals t LEFT JOIN covw USING (doc_id)
    )
    SELECT *,
           dup5_frac <= 0.15 AND dup6_frac <= 0.14 AND dup7_frac <= 0.13
           AND dup8_frac <= 0.12 AND dup9_frac <= 0.11 AND dup10_frac <= 0.10
           AS keep_dup_ngrams
    FROM m ORDER BY doc_id
    """,
    doc="Gopher repetition filters, duplicated-n-gram half: per-document "
    "fraction of word characters covered by at least one word n-gram "
    "(n = 5..10) occurring more than once within the document — each "
    "character counted ONCE via distinct covered positions, per the "
    "paper — with table A1's drop thresholds as a keep flag. Same "
    "deterministic repetition synthesis as q_gopher_repetition; coverage "
    "join is keyed by (doc, position), never corpus-wide "
    "(operators/gopher.py dup_ngram_coverage).",
)
def q_gopher_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.gopher import dup_ngram_coverage

    return dup_ngram_coverage(
        _gopher_dirty(spark, sf_dir), "doc_id", "text"
    ).orderBy("doc_id")


# --- Q: vocabulary growth curve (Heaps' law diagnostic) ------------------------


@query(
    "q_vocab_growth",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rk
      FROM documents
    ),
    n AS (SELECT COUNT(*) AS n FROM documents),
    dd AS (
      SELECT doc_id, CAST((rk * 10) // n.n AS BIGINT) AS decile
      FROM ranked, n
    ),
    tok AS (
      SELECT dd.decile,
             unnest(list_filter(string_split(x.text, ' '), t -> t <> '')) AS tok
      FROM documents x JOIN dd ON dd.doc_id = x.doc_id
    ),
    per_dec_tokens AS (SELECT decile, COUNT(*) AS n_toks FROM tok GROUP BY 1),
    first_dec AS (SELECT tok, MIN(decile) AS decile FROM tok GROUP BY 1),
    per_dec_types AS (SELECT decile, COUNT(*) AS n_new FROM first_dec GROUP BY 1),
    per_dec_docs AS (SELECT decile, COUNT(*) AS n_docs FROM dd GROUP BY 1)
    SELECT d.decile, d.n_docs,
           CAST(SUM(t.n_toks) OVER (ORDER BY d.decile) AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(y.n_new, 0)) OVER (ORDER BY d.decile) AS BIGINT) AS cum_types
    FROM per_dec_docs d
    JOIN per_dec_tokens t USING (decile)
    LEFT JOIN per_dec_types y USING (decile)
    ORDER BY d.decile
    """,
    doc="Vocabulary growth curve (Heaps'-law diagnostic): documents in "
    "doc_id order are cut into 10 deciles; per decile the output reports "
    "cumulative token volume and cumulative DISTINCT vocabulary — the "
    "type/token curve that predicts how a tokenizer's OOV surface and a "
    "dedup index's key space grow with corpus size. A token's decile of "
    "first appearance is one groupBy (min over the monotone decile), so "
    "the vocabulary is aggregated once, never re-scanned per decile; "
    "global doc ranks come from the deterministic distributed prefix sum "
    "and the only unbounded shuffles are the two token aggregates.",
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.cachereg import pin
    from ..operators.packing import distributed_prefix_sum

    docs = load(spark, sf_dir, "documents")
    ranked = distributed_prefix_sum(
        docs.select("doc_id"), "doc_id", F.lit(1), out_col="rk"
    )
    cnt = docs.groupBy().agg(F.count("*").alias("n"))
    # decile = ((rank-1) * 10) div n — pinned: feeds the doc counts AND the
    # token explode join
    dd = pin(
        ranked.crossJoin(F.broadcast(cnt)).select(
            "doc_id",
            F.expr("((rk - 1) * 10) div n").alias("decile"),
        )
    )
    tok = pin(
        docs.selectExpr(
            "doc_id",
            "explode(filter(split(text, ' '), t -> t != '')) as tok",
        ).join(dd, "doc_id")
    )
    per_tokens = tok.groupBy("decile").agg(F.count("*").alias("n_toks"))
    per_types = (
        tok.groupBy("tok")
        .agg(F.min("decile").alias("decile"))
        .groupBy("decile")
        .agg(F.count("*").alias("n_new"))
    )
    per_docs = dd.groupBy("decile").agg(F.count("*").alias("n_docs"))
    # cumulative walk over <= 10 decile rows — bounded global window
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_docs.join(per_tokens, "decile")
        .join(per_types, "decile", "left")
        .select(
            "decile",
            "n_docs",
            F.sum("n_toks").over(w).cast("bigint").alias("cum_tokens"),
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w).cast("bigint").alias("cum_types"),
        )
        .orderBy("decile")
    )
