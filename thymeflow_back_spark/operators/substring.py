"""Exact duplicated-substring spans and their removal (ExactSubstr dedup).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") build a suffix array over the concatenated corpus and remove
every substring >= 50 tokens that occurs twice. A suffix array does not
distribute; the shuffle-friendly exact construction at fixed window
granularity w is:

  1. hash every w-token window POSITION (token_window_rows — map-side
     explode, every occurrence kept),
  2. one hash-agg keyed by window text finds windows occurring >= 2
     times in the corpus (hot boilerplate windows collapse to ONE count
     row before any join-back, so frequency skew never replicates data),
  3. the flagged positions of one document merge into maximal covered
     spans by a per-document gaps-and-islands pass (two windows overlap
     or abut iff the later start <= earlier start + w).

Recall/precision at granularity w: every duplicated substring of
length >= 2w-1 tokens is fully covered by some shared window run, and
any flagged span is a true duplicate of >= w tokens — so this is the
exact span finder for min-length 2w-1 (pick w = ceil((L+1)/2) for a
target L), with spans >= w additionally surfaced when window
boundaries align.

``scrub_duplicated_spans`` is the keep-first removal: for each
duplicated window the canonical occurrence is the (id, pos)-smallest
(computed as a hash-agg MIN over a struct, never a per-window sort);
every token covered by a NON-canonical duplicated occurrence is
removed and survivors reassemble in document order. The earliest copy
of a span survives verbatim; later copies are cut — including the
second occurrence of a span repeated WITHIN one document (the corpus-
global semantics of the suffix-array construction, deliberately wider
than duplicated_window_fraction's cross-document-only signal).

Scale shape: windows and covered positions explode map-side (fan-out
w per non-canonical duplicated window, bounded); all joins are keyed
equi-joins on window text or (id, position); the only windows are
partitioned per document (state = one document's flagged positions,
never the corpus). Reassembly state is one document's own tokens —
the same contract as dedup.scrub_repeated_spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import token_window_rows


def _flagged_positions(
    wins: DataFrame, id_col: str, min_occurrences: int
) -> DataFrame:
    """(id, pos) of windows whose text occurs >= min_occurrences times
    corpus-wide. The count table has one row per DISTINCT window text, so
    the semi-join back never replicates occurrence rows."""
    shared = (
        wins.groupBy("win")
        .agg(F.count("*").alias("__occ"))
        .filter(F.col("__occ") >= min_occurrences)
        .select("win")
    )
    return wins.join(shared, "win", "left_semi").select(id_col, "pos")


def _islands(flagged: DataFrame, id_col: str, w: int) -> DataFrame:
    """Merge flagged window starts into maximal covered spans per doc:
    (id, span_start, span_end, span_tokens), end exclusive, 0-based."""
    by_doc = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.lag("pos").over(by_doc).isNull()
        | (F.col("pos") > F.lag("pos").over(by_doc) + F.lit(w)),
        1,
    ).otherwise(0)
    grouped = flagged.withColumn("__brk", brk).withColumn(
        "__g", F.sum("__brk").over(by_doc.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        grouped.groupBy(id_col, "__g")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(w)).alias("span_end"),
        )
        .withColumn("span_tokens", F.col("span_end") - F.col("span_start"))
        .drop("__g")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Output: (id, span_start, span_end, span_tokens) — 0-based token
    positions, end exclusive; every span is >= w tokens and every token
    inside it sits in at least one w-token window whose exact text occurs
    >= ``min_occurrences`` times in the corpus (any position — a window
    repeated within one document counts).
    """
    wins = token_window_rows(df, id_col, text_col, w)
    return _islands(_flagged_positions(wins, id_col, min_occurrences), id_col, w)


def scrub_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 8,
) -> DataFrame:
    """Remove duplicated spans keep-first: (id, clean_text, n_tokens,
    n_removed) for every document with >= 1 token.

    A token is removed iff covered by a NON-canonical occurrence of a
    duplicated window; the canonical occurrence is the (id, pos)-smallest
    for that window text. The earliest copy of a duplicated span (by
    document id, then position) survives verbatim; later copies —
    cross-document or within-document — are cut, and survivors
    reassemble in order.
    """
    wins = token_window_rows(df, id_col, text_col, w)
    # canonical = (id, pos)-lexicographic min per window text — a hash-agg
    # with map-side combine, NOT a per-window-text sort (the occurrence
    # list of one boilerplate window can be corpus-sized)
    canon = (
        wins.groupBy("win")
        .agg(
            F.count("*").alias("__occ"),
            F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias(
                "__m"
            ),
        )
        .filter(F.col("__occ") >= 2)
        .select("win", "__m")
    )
    noncanon = (
        wins.join(canon, "win")
        .filter(
            ~((F.col(id_col) == F.col("__m.i")) & (F.col("pos") == F.col("__m.p")))
        )
        .select(id_col, "pos")
    )
    # fan each non-canonical occurrence out to its w covered token
    # positions (map-side, bounded fan-out); the anti-join below tolerates
    # duplicates from overlapping occurrences, so no distinct pass
    covered = noncanon.select(
        id_col, F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(w - 1))).alias("tpos")
    )
    toks = f"filter(split({text_col}, ' '), t -> t != '')"
    tokens = df.selectExpr(id_col, f"posexplode({toks}) as (tpos, tok)")
    totals = tokens.groupBy(id_col).agg(F.count("*").alias("n_tokens"))
    kept = (
        tokens.join(covered, [id_col, "tpos"], "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("tpos", "tok"))).alias("__k"),
        )
        .select(
            id_col,
            F.concat_ws(" ", F.expr("transform(__k, s -> s.tok)")).alias("clean_text"),
            F.size("__k").alias("n_kept"),
        )
    )
    return (
        totals.join(kept, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        )
    )


def contaminated_spans(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 8,
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
) -> DataFrame:
    """Maximal spans in TRAIN documents that exactly match a w-token
    window of the EVAL set — substring-level benchmark decontamination
    (the cross-corpus form of :func:`duplicated_spans`; same Lee et al.
    2022 granularity guarantee: every shared substring of >= 2w-1 tokens
    is fully covered, every flagged span is a true >= w-token match).

    Output: (id, span_start, span_end, span_tokens) over train documents.
    The eval side collapses to its DISTINCT window texts before the join
    — an eval benchmark is tiny next to a training corpus, so the probe
    index is bounded by eval size and the join is one equi-join on window
    text against a single train scan (AQE broadcasts the eval side when
    it fits). The span merge is the same per-document gaps-and-islands
    pass; no state ever exceeds one document's flagged positions.
    """
    eid = eval_id_col or id_col
    etext = eval_text_col or text_col
    eval_wins = (
        token_window_rows(eval_df, eid, etext, w).select("win").dropDuplicates()
    )
    wins = token_window_rows(train, id_col, text_col, w)
    flagged = wins.join(eval_wins, "win", "left_semi").select(id_col, "pos")
    return _islands(flagged, id_col, w)
