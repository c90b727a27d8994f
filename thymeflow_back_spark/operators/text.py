"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All hot-path computation is JVM-side array/regex expressions (no Python
UDFs): tokenization via split + filter, counts via aggregate/transform,
fingerprints via md5-derived hashes. The reference's text normalization
stack (utilities/text/Normalization.scala, EntityResolution.scala:39-40)
maps to the same built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import h32, word_shingles
from .skew import spread_small_input

# Small English stopword list (public knowledge), kept sorted and fixed so
# oracle SQL can embed the identical literal.
STOPWORDS = ("a", "an", "and", "in", "is", "of", "the", "to")


def toks_col(text_col: str = "text") -> Column:
    """Whitespace tokens with empties removed, as array<string>."""
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def token_stats(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Per-document token statistics + a deterministic quality score.

    quality = 0.5·min(n_tokens/100, 1) + 0.3·(unique ratio) + 0.2·(stopword ratio)
    — a length/diversity/stopword blend of the usual heuristic quality
    filters; all arithmetic on exact integer counts, so cross-engine stable.
    """
    df = spread_small_input(df)
    # NULL text behaves exactly like empty text (0 tokens, 0 chars), and
    # zero-token docs get NULL ratios via nullif instead of an ANSI
    # DIVIDE_BY_ZERO abort (Spark 4 default) — DuckDB's x/0 is NULL too,
    # so the guarded form is also the oracle-parity form.
    toks = F.coalesce(toks_col(text_col), F.array().cast("array<string>"))
    d = df.select(
        F.col(id_col),
        toks.alias("toks"),
        F.coalesce(F.length(text_col), F.lit(0)).alias("n_chars"),
    )
    n_tokens = F.size("toks")
    n_nz = F.nullif(n_tokens, F.lit(0))
    n_unique = F.size(F.array_distinct("toks"))
    n_stop = F.size(F.filter("toks", lambda t: t.isin(*STOPWORDS)))
    sum_len = F.aggregate(F.transform("toks", lambda t: F.length(t)), F.lit(0), lambda a, x: a + x)
    d = d.select(
        F.col(id_col),
        F.col("n_chars"),
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique"),
        n_stop.alias("n_stopwords"),
        (sum_len / n_nz).alias("avg_token_len"),
        (n_stop / n_nz).alias("stopword_ratio"),
        (n_unique / n_nz).alias("unique_ratio"),
    )
    quality = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.col("unique_ratio") * 0.3
        + F.col("stopword_ratio") * 0.2
    )
    return d.withColumn("quality", quality)


# GPT-2-style pretokenizer, restricted to RE2-compatible constructs (no
# lookahead — the original's `\s+(?!\S)` branch is dropped, so a run of
# spaces before a word stays attached to the whitespace run; same
# discipline as pii_scrub). Leftmost-first alternation behaves identically
# in Java regex (Spark) and RE2 (DuckDB) — cross-checked on fixtures.
PRETOKEN_REGEX = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def pretokens_col(text_col: str = "text") -> Column:
    """array<string> of GPT-2-ish pretokens — the split BPE operates on.

    A pure JVM regexp projection (no Python), the realistic token-count
    accounting pass next to the ceil(len/4) heuristic
    (:func:`bpe_token_estimate`)."""
    return F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(PRETOKEN_REGEX), F.lit(0)
    )


def bpe_token_estimate(text_col: str = "text") -> Column:
    """BPE-ish token-count estimate: ceil(len/4) per whitespace word, summed.

    Integer arithmetic only ((len+3) div 4) for cross-engine parity.
    """
    return F.aggregate(
        F.transform(toks_col(text_col), lambda t: (F.length(t) + 3).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, x: a + F.floor(x / 4).cast("bigint"),
    )


def lang_id_scores(df: DataFrame, text_col: str, markers: dict[str, tuple[str, ...]]) -> DataFrame:
    """N-gram/stopword-marker language ID: argmax of per-language marker hits.

    ``markers``: lang -> tuple of marker words. Deterministic tie-break by
    language code ascending. Adds ``pred_lang`` and ``lang_hits``.
    """
    toks = toks_col(text_col)
    best_lang, best_hits = None, None
    for lang in sorted(markers):
        hits = F.size(F.filter(toks, lambda t: t.isin(*markers[lang])))
        if best_lang is None:
            best_lang, best_hits = F.lit(lang), hits
        else:
            better = hits > best_hits
            best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
            best_hits = F.when(better, hits).otherwise(best_hits)
    return df.withColumn("pred_lang", best_lang).withColumn("lang_hits", best_hits)


def min_k_fingerprint(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 5
) -> DataFrame:
    """Winnowing-style content fingerprint: the k smallest 32-bit shingle
    hashes per document, joined into a stable string key.

    Near-identical documents share most minimal hashes, so the fingerprint
    doubles as a cheap clustering key; size is O(k) per document regardless
    of document length.
    """
    sh = word_shingles(df, id_col, text_col, n)
    hashed = sh.select(F.col(id_col), h32(F.col("shingle")).alias("h")).dropDuplicates([id_col, "h"])
    w = Window.partitionBy(id_col).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(id_col)
        .agg(F.concat_ws(",", F.sort_array(F.collect_list("h"))).alias("fingerprint"))
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals (the Gopher/C4-style filters):

    - ``dup_line_frac`` — fraction of lines that are repeats of an earlier
      line (0 for single-line docs),
    - ``dup_2gram_frac`` — fraction of word-bigram occurrences beyond each
    distinct bigram's first,
    - ``top_2gram_frac`` — share of bigram occurrences taken by the most
      frequent bigram.

    All ratios derive from exact integer counts (cross-engine stable) and
    run as array expressions inside codegen — no shuffle beyond the scan.
    The per-distinct-element counting is O(d²) per document, fine for
    document-sized arrays; corpus-scale aggregation stays row-local.
    """
    df = spread_small_input(df)
    d = df.selectExpr(
        id_col,
        f"filter(transform(split({text_col}, '\\n'), l -> trim(l)), l -> l != '') as lines",
        f"filter(split({text_col}, ' '), t -> t != '') as toks",
    ).selectExpr(
        id_col,
        "lines",
        "transform(if(size(toks) >= 2, sequence(0, size(toks) - 2), cast(array() as array<int>)),"
        " i -> concat_ws(' ', slice(toks, i + 1, 2))) as grams",
    )
    return d.selectExpr(
        id_col,
        "size(lines) as n_lines",
        "if(size(lines) > 0,"
        " 1.0 - size(array_distinct(lines)) / size(lines), cast(0.0 as double)) as dup_line_frac",
        "size(grams) as n_2grams",
        "if(size(grams) > 0,"
        " 1.0 - size(array_distinct(grams)) / size(grams), cast(0.0 as double)) as dup_2gram_frac",
        "if(size(grams) > 0,"
        " array_max(transform(array_distinct(grams), x -> size(filter(grams, y -> y = x)))) / size(grams),"
        " cast(0.0 as double)) as top_2gram_frac",
    )


# --- quality filter (C4/Gopher-style rule chain) ------------------------------

# Rule thresholds, shared literals with the SQL oracles.
QF_MIN_WORDS = 5
QF_MAX_WORDS = 5000
QF_MAX_WORD_LEN = 20
QF_MAX_REP_RATIO = 0.25  # most frequent token may cover at most 25%
QF_MIN_STOPWORD_RATIO = 0.01
QF_MIN_UNIQUE_RATIO = 0.3


def quality_filter(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Rule-chain document filter: (id, *carry, n_words, rep_ratio,
    stopword_ratio, unique_ratio, drop_reason, keep). ``carry`` columns
    pass through untouched (e.g. lang/source for keep-rate profiles).

    The C4/Gopher-shaped heuristic gate of a training pipeline: length
    bounds, max word length, single-token repetition, stopword presence,
    vocabulary diversity — evaluated IN ORDER, ``drop_reason`` naming the
    first failed rule (NULL + keep=true when all pass). Everything is
    in-row array arithmetic over exact integer counts (the top-token
    frequency scans the distinct tokens per row, O(unique·n) in-row, no
    explode/groupBy) — a pure codegen'd projection that filters a 100 TB
    corpus in one scan with no shuffle.
    """
    df = spread_small_input(df)
    # coalesce: a NULL text must count as 0 words and be DROPPED as
    # too_few_words — without it every rule compares NULL and no
    # drop_reason fires, so the most degenerate input passed the gate
    toks = F.coalesce(toks_col(text_col), F.array().cast("array<string>"))
    d = df.select(F.col(id_col), *[F.col(c) for c in carry], toks.alias("toks"))
    n = F.size("toks")
    # The top-token scan is O(unique·n) per row — guarded behind the length
    # bound so a pathological multi-100k-word document (which the
    # too_many_words rule rejects anyway) can't burn quadratic time before
    # its rejection; the CASE order below never reads rep_ratio for it.
    top_freq = F.when(
        n <= QF_MAX_WORDS,
        F.array_max(
            F.transform(
                F.array_distinct("toks"),
                lambda t: F.size(F.filter("toks", lambda x: x == t)),
            )
        ),
    )
    max_len = F.array_max(F.transform("toks", lambda t: F.length(t)))
    n_stop = F.size(F.filter("toks", lambda t: t.isin(*STOPWORDS)))
    n_unique = F.size(F.array_distinct("toks"))
    d = d.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        n.alias("n_words"),
        F.coalesce(max_len, F.lit(0)).alias("max_word_len"),
        (top_freq / F.nullif(n, F.lit(0))).alias("rep_ratio"),
        (n_stop / F.nullif(n, F.lit(0))).alias("stopword_ratio"),
        (n_unique / F.nullif(n, F.lit(0))).alias("unique_ratio"),
    )
    reason = (
        F.when(F.col("n_words") < QF_MIN_WORDS, F.lit("too_few_words"))
        .when(F.col("n_words") > QF_MAX_WORDS, F.lit("too_many_words"))
        .when(F.col("max_word_len") > QF_MAX_WORD_LEN, F.lit("word_too_long"))
        .when(F.col("rep_ratio") > QF_MAX_REP_RATIO, F.lit("too_repetitive"))
        .when(F.col("stopword_ratio") < QF_MIN_STOPWORD_RATIO, F.lit("low_stopword"))
        .when(F.col("unique_ratio") < QF_MIN_UNIQUE_RATIO, F.lit("low_diversity"))
    )
    return d.withColumn("drop_reason", reason).withColumn(
        "keep", F.col("drop_reason").isNull()
    )


# --- PII scrubbing -------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex and
# RE2 (character classes, bounded repetition, \b word boundary — no
# backreferences, no lookaround), so SQL oracles reproduce the scrub exactly.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"


def pii_scrub(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Detect and redact emails / IPv4s / phone-shaped numbers.

    Output: (id, n_emails, n_ips, n_phones, clean) — counts of each match
    class and the redacted text ([EMAIL]/[IP]/[PHONE] placeholders).

    Patterns apply IN ORDER on the progressively-scrubbed text (an IPv4 is
    also phone-shaped: scrubbing IPs first keeps the counts disjoint).
    Pure regexp_replace/regexp_count projections — single scan, zero
    shuffles, linear in corpus bytes at 100 TB.
    """
    df = spread_small_input(df)
    step1 = df.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_replace(F.col(text_col), PII_EMAIL, "[EMAIL]").alias("__t1"),
    )
    step2 = step1.select(
        F.col(id_col),
        "n_emails",
        F.regexp_count(F.col("__t1"), F.lit(PII_IP)).alias("n_ips"),
        F.regexp_replace(F.col("__t1"), PII_IP, "[IP]").alias("__t2"),
    )
    return step2.select(
        F.col(id_col),
        "n_emails",
        "n_ips",
        F.regexp_count(F.col("__t2"), F.lit(PII_PHONE)).alias("n_phones"),
        F.regexp_replace(F.col("__t2"), PII_PHONE, "[PHONE]").alias("clean"),
    )


# --- chunking (RAG / context-window preparation) -------------------------------


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    size: int = 50,
    stride: int = 25,
) -> DataFrame:
    """Split documents into overlapping token windows: (id, chunk_idx,
    n_tokens, chunk_text).

    The retrieval-prep primitive: windows of ``size`` tokens starting every
    ``stride`` tokens (stride < size ⇒ overlap); the final partial window is
    kept so no suffix is lost. Pure map-side explode over the token array —
    chunking a 100 TB corpus is one scan, no shuffle, and the output
    inherits the input's partitioning for the downstream embed stage.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    # window starts: every k·stride below the token count (tail windows may
    # be shorter than `size`); empty docs yield one empty chunk at start 0
    # sequence with an explicit step yields the ~size/stride starts
    # directly — no O(n_tokens) intermediate array per row on the hot path
    starts = (
        f"if(size(__toks) = 0, array(0),"
        f" sequence(0, size(__toks) - 1, {stride}))"
    )
    return (
        df.selectExpr(id_col, f"filter(split({text_col}, ' '), t -> t != '') as __toks")
        .selectExpr(id_col, "__toks", f"posexplode({starts}) as (chunk_idx, start)")
        .selectExpr(
            id_col,
            "chunk_idx",
            f"slice(__toks, start + 1, {size}) as __chunk",
        )
        .selectExpr(
            id_col,
            "chunk_idx",
            "size(__chunk) as n_tokens",
            "concat_ws(' ', __chunk) as chunk_text",
        )
    )


# --- bigram LM scoring (CCNet-style rarity filter, exact arithmetic) -----------


def bigram_lm_scores(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Score documents by how typical their token bigrams are of the corpus.

    The CCNet-shaped LM-filter signal without the log: per document,
    aggregate the CORPUS frequency of each of its bigrams — (n_bigrams,
    sum_count, mean_count, min_count). Low mean/min = unusual word
    sequences (gibberish, boilerplate mangling); all arithmetic is exact
    integer counts and one exact division, so the score is bit-identical
    on any engine (a log-prob variant would be ulp-hostage to libm).

    Plan: bigrams explode map-side; counts are one groupBy; the doc-side
    join ships counts to bigram occurrences (sort-merge on the bigram at
    scale, broadcast when the vocabulary is small) and one groupBy folds
    per-document. Docs with < 2 tokens are excluded (no bigrams).
    """
    df = spread_small_input(df)
    bigrams = df.selectExpr(
        id_col,
        "filter(split(" + text_col + ", ' '), t -> t != '') as __toks",
    ).selectExpr(
        id_col,
        "explode(transform("
        " if(size(__toks) >= 2, sequence(0, size(__toks) - 2), cast(array() as array<int>)),"
        " i -> struct(__toks[i] as a, __toks[i + 1] as b))) as bg",
    ).select(F.col(id_col), F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
    counts = bigrams.groupBy("a", "b").agg(F.count("*").alias("bg_count"))
    return (
        bigrams.join(counts, ["a", "b"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("bg_count").alias("sum_count"),
            (F.sum("bg_count") / F.count("*")).alias("mean_count"),
            F.min("bg_count").alias("min_count"),
        )
    )


# --- Luhn-validated card-number detection ---------------------------------------

# Bare digit runs of plausible PAN length. Regex alone has a brutal
# false-positive rate on numeric text (ids, timestamps, phone numbers);
# the Luhn mod-10 checksum is the standard validator layered on top
# (every real card number passes it; a random digit run passes 1 in 10).
PII_CC_CANDIDATE = r"\b[0-9]{13,16}\b"


def luhn_valid(col: Column) -> Column:
    """True iff the column is a non-empty digit string passing the Luhn
    mod-10 check — pure integer column arithmetic (double every second
    digit from the right, subtract 9 past 9, sum % 10 == 0), identical in
    Spark and DuckDB SQL so oracles replay it exactly. Total over any
    string input: the empty string (whose descending sequence(1, 0) would
    be [1, 0]) and non-digit input (whose digit cast would be NULL) are
    both simply false, so the helper is safe outside cc_detect's
    regex-guaranteed 13-16 digit candidates."""
    n = F.length(col)
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (n - i) % 2 == 1,
            F.when(
                F.substring(col, i.cast("int"), 1).cast("int") * 2 > 9,
                F.substring(col, i.cast("int"), 1).cast("int") * 2 - 9,
            ).otherwise(F.substring(col, i.cast("int"), 1).cast("int") * 2),
        ).otherwise(F.substring(col, i.cast("int"), 1).cast("int")),
    )
    return (n > 0) & col.rlike("^[0-9]+$") & (total % 10 == 0)


def luhn_check_digit(base: Column) -> Column:
    """The check digit that makes ``base || digit`` Luhn-valid — used by
    fixtures to synthesize genuinely valid numbers in both engines. For
    the appended position, every digit at odd distance from the END of
    the full number doubles; relative to ``base`` (length L, full length
    L+1) that is positions L, L-2, ... — i.e. (L - i) % 2 == 0 for
    1-based i."""
    n = F.length(base)
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (n - i.cast("int")) % 2 == 0,
            F.when(
                F.substring(base, i.cast("int"), 1).cast("int") * 2 > 9,
                F.substring(base, i.cast("int"), 1).cast("int") * 2 - 9,
            ).otherwise(F.substring(base, i.cast("int"), 1).cast("int") * 2),
        ).otherwise(F.substring(base, i.cast("int"), 1).cast("int")),
    )
    return (F.lit(10) - (total % 10)) % 10


def cc_detect(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Per document: (id, n_candidates, n_valid, valid_ccs) — digit runs
    of card length found by PII_CC_CANDIDATE, the subset passing Luhn,
    and the valid ones sorted and comma-joined (deterministic order).
    One scan, in-row array arithmetic, no shuffle — the validator runs
    per CANDIDATE, never per character."""
    # F.lit keeps the pattern out of SQL string-literal escaping (\b in
    # an expr literal would parse as backspace)
    cands = F.regexp_extract_all(
        F.col(text_col), F.lit(PII_CC_CANDIDATE), F.lit(0)
    )
    valid = F.filter(cands, lambda c: luhn_valid(c))
    return df.select(
        F.col(id_col),
        F.size(cands).cast("bigint").alias("n_candidates"),
        F.size(valid).cast("bigint").alias("n_valid"),
        F.array_join(F.array_sort(valid), ",").alias("valid_ccs"),
    )
