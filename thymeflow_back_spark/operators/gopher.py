"""Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", table A1).

Beyond-reference LLM-curation operators: the reference engine has no text
pipeline; these implement the published repetition signals used to drop
boilerplate-heavy web documents before training:

- duplicate line fraction / duplicate line CHARACTER fraction,
- fraction of characters inside the single most frequent word {2,3,4}-gram,
- fraction of characters covered by duplicated word {5..10}-grams
  (each character counted once, per the paper).

Everything is per-document: the only shuffles are keyed by (doc, gram) or
(doc, line), so state per task is one document's windows — the operator
scales linearly in corpus size with no global structure. All fractions are
a single BIGINT/BIGINT double division, so results are bit-identical across
engines (the repo-wide oracle convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher table A1 thresholds: a document is dropped when a signal EXCEEDS
# its bound.
DUP_LINE_MAX = 0.30
DUP_LINE_CHAR_MAX = 0.20
TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _words(text_col: str) -> Column:
    """Whitespace words of the text with newlines flattened; empty tokens
    (doubled separators) are dropped, matching the oracle's list_filter."""
    return F.filter(
        F.split(F.translate(F.col(text_col), "\n", " "), " "),
        lambda w: w != "",
    )


def _lines(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), "\n"), lambda s: s != "")


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document line-duplication and top-n-gram signals.

    Returns one row per input row: n_lines, n_words, dup_line_frac
    (fraction of lines that are repeats beyond each line's first
    occurrence), dup_line_char_frac (characters inside those repeats over
    all line characters), top{2,3,4}gram_frac (characters of the most
    frequent word n-gram — count x n-gram length over the single-spaced
    text length; ties broken toward the lexicographically smallest gram),
    and keep_repetition applying the Gopher bounds.
    """
    from .cachereg import pin

    # pinned: the line grouping, the per-doc totals, and the n-gram pass
    # each consume this relation — without the pin every consumer re-reads
    # and re-tokenizes the source
    base = pin(
        df.select(
            F.col(id_col).alias("__id"),
            _lines(text_col).alias("__lines"),
            _words(text_col).alias("__toks"),
        )
    )

    per_doc = base.select(
        "__id",
        F.size("__lines").alias("n_lines"),
        F.size("__toks").alias("n_words"),
        # single-spaced character count: sum of word lengths + (n-1) spaces
        (
            F.aggregate(
                "__toks", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
            )
            + F.greatest(F.size("__toks") - 1, F.lit(0))
        ).alias("ws_chars"),
    )

    # --- duplicate-line signals: group identical lines within a doc ------
    lg = (
        base.select("__id", F.explode("__lines").alias("line"))
        .groupBy("__id", "line")
        .agg(F.count("*").alias("cnt"))
        .select(
            "__id",
            "cnt",
            F.length("line").alias("llen"),
        )
        .groupBy("__id")
        .agg(
            F.sum("cnt").alias("tot_lines"),
            F.count("*").alias("uniq_lines"),
            F.sum((F.col("cnt") - 1) * F.col("llen")).alias("dup_chars"),
            F.sum(F.col("cnt") * F.col("llen")).alias("line_chars"),
        )
    )

    # --- top n-gram signals (n = 2, 3, 4), ONE pass: n is exploded as a
    # column so the source is scanned once, not once per n ---------------
    g = _ngram_rows(base, (2, 3, 4)).drop("pos")
    from pyspark.sql import Window

    w = Window.partitionBy("__id", "n").orderBy(
        F.desc("cnt"), F.asc("gram")
    )
    top = (
        g.groupBy("__id", "n", "gram")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        # numerator in exact integers; the one division happens after the
        # totals join so each fraction is a single BIGINT/BIGINT op
        .select(
            "__id",
            "n",
            (F.col("cnt") * F.length("gram")).alias("numer"),
        )
        .groupBy("__id")
        .agg(
            *[
                F.max(F.when(F.col("n") == n, F.col("numer"))).alias(
                    f"numer{n}"
                )
                for n in (2, 3, 4)
            ]
        )
    )

    out = (
        per_doc.join(lg, "__id", "left")
        .join(top, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_lines",
            "n_words",
            F.when(
                F.col("tot_lines") > 0,
                (F.col("tot_lines") - F.col("uniq_lines")) / F.col("tot_lines"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_line_frac"),
            F.when(
                F.col("line_chars") > 0,
                F.col("dup_chars") / F.col("line_chars"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_line_char_frac"),
            *[
                F.when(
                    F.col("ws_chars") > 0,
                    F.coalesce(F.col(f"numer{n}"), F.lit(0)) / F.col("ws_chars"),
                )
                .otherwise(F.lit(0.0))
                .alias(f"top{n}gram_frac")
                for n in (2, 3, 4)
            ],
        )
    )
    keep = (
        (F.col("dup_line_frac") <= DUP_LINE_MAX)
        & (F.col("dup_line_char_frac") <= DUP_LINE_CHAR_MAX)
    )
    for n, bound in TOP_NGRAM_MAX.items():
        keep = keep & (F.col(f"top{n}gram_frac") <= bound)
    return out.withColumn("keep_repetition", keep)


def _ngram_rows(base: DataFrame, ns: tuple[int, ...]) -> DataFrame:
    """(__id, n, pos, gram) word n-gram windows for every n in ``ns`` in a
    SINGLE pass over ``base``: n rides as an exploded column and the
    window construction slices by it, instead of one union branch (= one
    source scan) per n."""
    return (
        base.select(
            "__id",
            "__toks",
            F.explode(F.array(*[F.lit(n) for n in ns])).alias("n"),
        )
        .select(
            "__id",
            "n",
            F.posexplode(
                F.when(
                    F.size("__toks") >= F.col("n"),
                    F.transform(
                        F.sequence(
                            F.lit(1), F.size("__toks") - F.col("n") + 1
                        ),
                        lambda i: F.array_join(
                            F.slice("__toks", i, F.col("n")), " "
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pos", "gram"),
        )
    )


def dup_ngram_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Per-document duplicated-n-gram character coverage for each n in
    ``ns``: the fraction of word characters lying inside at least one word
    n-gram that occurs more than once WITHIN the document (the paper's
    "characters contained within duplicated n-grams", counted once each).

    Coverage is computed over word positions (each position weighted by
    its word's character length), so overlapping duplicate windows never
    double-count. Output: one row per doc with dup{n}_frac columns and a
    keep_dup_ngrams flag applying the Gopher bounds.
    """
    from .cachereg import pin

    # pinned twice over: base feeds the word weights AND the window pass;
    # the window relation w feeds both the duplicate-gram aggregate and
    # the coverage join back
    base = pin(
        df.select(
            F.col(id_col).alias("__id"), _words(text_col).alias("__toks")
        )
    )

    words = base.select(
        "__id",
        F.posexplode("__toks").alias("tpos", "word"),
    ).select("__id", "tpos", F.length("word").alias("wlen"))

    totals = words.groupBy("__id").agg(F.sum("wlen").alias("total_chars"))

    w = pin(_ngram_rows(base, ns))

    dup = (
        w.groupBy("__id", "n", "gram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("__id", "n", "gram")
    )
    covered = (
        w.join(dup, ["__id", "n", "gram"])
        .select(
            "__id",
            "n",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
            ).alias("tpos"),
        )
        .distinct()
    )
    covw = (
        covered.join(words, ["__id", "tpos"])
        .groupBy("__id", "n")
        .agg(F.sum("wlen").alias("cov_chars"))
        .groupBy("__id")
        .agg(
            *[
                F.max(F.when(F.col("n") == n, F.col("cov_chars"))).alias(
                    f"cov{n}"
                )
                for n in ns
            ]
        )
    )

    out = totals.join(covw, "__id", "left").select(
        F.col("__id").alias(id_col),
        *[
            F.when(
                F.col("total_chars") > 0,
                F.coalesce(F.col(f"cov{n}"), F.lit(0)) / F.col("total_chars"),
            )
            .otherwise(F.lit(0.0))
            .alias(f"dup{n}_frac")
            for n in ns
        ],
    )
    keep = F.lit(True)
    for n in ns:
        keep = keep & (F.col(f"dup{n}_frac") <= DUP_NGRAM_MAX[n])
    return out.withColumn("keep_dup_ngrams", keep)
