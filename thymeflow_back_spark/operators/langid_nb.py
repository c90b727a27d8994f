"""Multi-class Naive Bayes language identifier over hashed char n-grams.

The production first-stage language filter (CCNet's fasttext langid,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", Wenzek et al. 2020) is a TRAINED multi-class classifier over
character n-gram features — not the marker-word heuristic
(operators/text.py lang_id_scores). This is its closed-form, SGD-free
member: multinomial Naive Bayes over hashed character trigrams, the
K-class generalization of the two-class quality classifier
(operators/quality_nb.py), reusing the same integer machinery so the
whole train+serve pipeline is bit-identical on any engine and any
partitioning.

Model (add-one smoothing over B hashed buckets, per class c):

    w_c(j)   = ln(cnt_cj + 1) − ln(TOT_c + B)
    unseen_c = −ln(TOT_c + B)                     (zero-count bucket)
    prior_c  = ln(n_docs_c + 1)
    score_c(x) = prior_c + Σ_buckets cnt_x(j) · (w_c(j) or unseen_c)
    pred = argmax_c score_c, ties toward the smaller class code

(the common normalizers − ln(N + K) and the per-document feature-count
factorial cancel in the argmax and are omitted; each class score is
still a well-defined quantity both engines compute identically).

Float discipline (the quality_nb.py idiom): ln() runs once per
(class, bucket) CELL — at most K·B of them — quantizes to integer
micro-nats, and a document's class score is an exact BIGINT dot product
of its integer bucket counts with the quantized weights plus the
quantized prior. The argmax is a window rank with a total order
(score_q DESC, class ASC), so prediction is bit-stable across engines.

Scale (100 TB story): the char-trigram explode is map-side and folds
immediately into per-document (bucket, cnt) rows — at most
min(n_chars, B) per document; training collapses those into K·B count
cells with map-side combine (the only training shuffle). Serving is the
per-document feature fold (one data-sized groupBy), a crossJoin against
the K-row class table, one broadcast join against the ≤ K·B weight
table, and a K-row-per-doc argmax window. No Python rows, no vocabulary
shuffle, no driver-side state.

Reference context: the reference has no learned language filter (its
converters tag languages from metadata, e.g. VCardConverter.scala); this
is a beyond-reference training-data operator of the round briefs,
layered on the q_lang_id heuristic as its trained replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LID_SALT = "lid"
LID_SCALE = 1_000_000  # micro-nat quantization grid (quality_nb QNB_SCALE)
LID_BUCKETS = 1024
LID_NGRAM = 3


def _bucket(gram: Column, n_buckets: int) -> Column:
    """Hashed char-n-gram bucket id: first 8 md5 hex chars mod n_buckets
    — the dsir.py/quality_nb.py hash family under the langid salt."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(" ", F.lit(LID_SALT + ":"), gram)), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (h % n_buckets).alias("bucket")


def char_ngram_bucket_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = LID_NGRAM,
    n_buckets: int = LID_BUCKETS,
    *extra: str,
) -> DataFrame:
    """Per-document hashed char-n-gram counts: (id, *extra, bucket, cnt).
    The explode is map-side (one row per n-gram POSITION — substring is
    character-based in both engines, so multi-byte text hashes
    identically) and folds straight into per-document bucket counts;
    a document shorter than ``n`` characters contributes nothing (the
    guarded sequence avoids Spark's descending sequence(1, 0) trap)."""
    from .skew import spread_small_input

    grams = F.expr(
        f"transform("
        f" if(length({text_col}) >= {n},"
        f"    sequence(1, length({text_col}) - {n - 1}),"
        f"    cast(array() as array<int>)),"
        f" i -> substring({text_col}, i, {n}))"
    )
    # the per-character explode + md5 is the CPU-heavy narrow stage — a
    # single-file scan would serialize it on one core (no-op on a wide
    # scan, so safe as the permanent guard)
    df = spread_small_input(df)
    return (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in extra],
            F.explode(grams).alias("__g"),
        )
        .select(F.col(id_col), *extra, _bucket(F.col("__g"), n_buckets))
        .groupBy(id_col, *extra, "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def langid_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    n: int = LID_NGRAM,
    n_buckets: int = LID_BUCKETS,
    features: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train the K-class model on language-labeled documents.

    Returns ``(weights, classes)``:

    - ``weights``: (lang, bucket, w_q) — per-cell quantized conditional
      log-prob, at most K·B rows (broadcast-sized by construction),
    - ``classes``: (lang, prior_q, unseen_q, n_docs, occ_tot) — one row
      per class with the quantized prior, the zero-count-bucket weight,
      and the audit counts.

    ``features`` (optional): a precomputed per-document feature relation
    from :func:`char_ngram_bucket_counts` (id, bucket, cnt) — pass the
    SAME pinned relation to :func:`langid_classify` when training and
    serving over one corpus, so the char-explode pass runs once (the
    summed cell counts are identical either way).
    """
    # cell counts are the model's whole training state (≤ K·B rows) and
    # feed two consumers (class totals, weights) — checkpoint so the
    # corpus explode+fold runs once
    if features is None:
        cells = char_ngram_bucket_counts(
            df, id_col, text_col, n, n_buckets, lang_col
        )
    else:
        cells = features.join(
            df.select(F.col(id_col), F.col(lang_col)), id_col
        )
    counts = (
        cells.groupBy(lang_col, "bucket")
        .agg(F.sum("cnt").alias("c"))
        .localCheckpoint(eager=True)
    )
    docs = df.groupBy(lang_col).agg(F.count("*").alias("n_docs"))
    return langid_model_from_counts(counts, docs, lang_col, n_buckets)


def langid_model_from_counts(
    counts: DataFrame,
    docs: DataFrame,
    lang_col: str = "lang",
    n_buckets: int = LID_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Derive (weights, classes) from the model's SUFFICIENT STATISTICS:
    ``counts`` = (lang, bucket, c) occurrence counts and ``docs`` =
    (lang, n_docs). Both are plain integer sums, so they MERGE across
    micro-batches with no approximation — the streaming trainer
    (streaming/langid_stream.py) accumulates them per batch and the
    model from the running totals is bit-identical to batch training
    over everything seen (the quality_nb nb_model_from_counts
    property, K-class form)."""
    tots = counts.groupBy(lang_col).agg(F.sum("c").alias("__tot"))
    weights = counts.join(tots, lang_col).select(
        lang_col,
        "bucket",
        F.round(
            (F.log(F.col("c") + F.lit(1)) - F.log(F.col("__tot") + F.lit(n_buckets)))
            * F.lit(LID_SCALE),
            0,
        )
        .cast("bigint")
        .alias("w_q"),
    )
    classes = (
        docs
        # a class whose every text is shorter than n has no occurrences
        .join(tots, lang_col, "left")
        .select(
            lang_col,
            F.round(F.log(F.col("n_docs") + F.lit(1)) * F.lit(LID_SCALE), 0)
            .cast("bigint")
            .alias("prior_q"),
            F.round(
                -F.log(F.coalesce(F.col("__tot"), F.lit(0)) + F.lit(n_buckets))
                * F.lit(LID_SCALE),
                0,
            )
            .cast("bigint")
            .alias("unseen_q"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.coalesce(F.col("__tot"), F.lit(0)).cast("bigint").alias("occ_tot"),
        )
    )
    return weights, classes


def langid_classify(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    classes: DataFrame,
    lang_col: str = "lang",
    n: int = LID_NGRAM,
    n_buckets: int = LID_BUCKETS,
    features: DataFrame | None = None,
) -> DataFrame:
    """Predict each document's language: (id, pred_lang, score_q) — the
    argmax class and its exact micro-nat score. One corpus scan folds to
    per-document bucket counts, each document's K class scores are exact
    BIGINT dot products against the broadcast weight table, and the
    argmax breaks ties toward the smaller class code. Documents with no
    char n-grams (text shorter than ``n``) are excluded — the classifier
    has no evidence (both engines agree by construction).
    ``features``: see :func:`langid_train`.

    Serving shape (optimization round 11, guide §2.2 "shuffle fewer
    bytes"): the former crossJoin with the K-row class table exploded
    the feature relation ×K (measured 3.3M intermediate rows at sf0.1)
    and ranked the argmax with a per-document window. Now the K class
    codes are COLLECTED (model-sized — K rows, the pq codebook
    discipline), the weight table pivots to ONE broadcast map per
    bucket, per-class sums ride as K aggregate columns over a single
    groupBy(id), and the argmax is an in-row ordered fold (earlier =
    smaller class code wins ties). Scores are the identical exact
    BIGINT sums (integer addition commutes), so output is bit-equal;
    the ×K row blowup, one broadcast join and the window Exchange are
    gone."""
    pdoc = (
        features
        if features is not None
        else char_ngram_bucket_counts(df, id_col, text_col, n, n_buckets)
    )
    cls = sorted(
        classes.select(lang_col, "prior_q", "unseen_q").collect(),
        key=lambda r: r[lang_col],
    )
    wvec = weights.groupBy("bucket").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col(lang_col), F.col("w_q")))
        ).alias("__wm")
    )
    sums = (
        pdoc.join(F.broadcast(wvec), "bucket", "left")
        .groupBy(id_col)
        .agg(
            *[
                F.sum(
                    F.col("cnt")
                    * F.coalesce(
                        F.element_at("__wm", F.lit(c[lang_col])),
                        F.lit(int(c["unseen_q"])),
                    )
                ).alias(f"__s{k}")
                for k, c in enumerate(cls)
            ]
        )
    )
    scores = F.array(
        *[
            F.struct(
                (F.lit(int(c["prior_q"])) + F.col(f"__s{k}"))
                .cast("bigint")
                .alias("score_q"),
                F.lit(k).alias("__k"),
            )
            for k, c in enumerate(cls)
        ]
    )
    langs = F.array(*[F.lit(c[lang_col]) for c in cls])
    if len(cls) == 1:
        best = F.element_at(scores, 1)
    else:
        best = F.aggregate(
            F.slice(scores, 2, len(cls) - 1),
            F.element_at(scores, 1),
            lambda acc, s: F.when(s["score_q"] > acc["score_q"], s).otherwise(
                acc
            ),
        )
    return sums.withColumn("__best", best).select(
        F.col(id_col),
        F.element_at(langs, F.col("__best.__k") + 1).alias("pred_lang"),
        F.col("__best.score_q").alias("score_q"),
    )
