"""Upsert-aware incremental near-dup: document re-delivery replaces state.

The append-only job (dedup_stream.py) assumes immutable documents; real
ingestion RE-DELIVERS them (the reference's core contract — a Document
re-delivery REPLACES its named graph, Pipeline.scala:61-93). This job
extends the persistent-band-index design with last-writer-wins versioning:

- every index entry (band row, shingle row) carries its ``batch_id`` —
  a document's CURRENT version is its max batch in the docs store, so no
  separate version log exists (the id+batch projection of the store IS
  the version relation),
- per batch, within-batch pairs come from the exact blocked join as
  before; cross-batch candidates join the new bands against prior band
  entries EXCLUDING (a) ids re-delivered in THIS batch (their old bands
  are stale and their new text already rides the within-batch join) and
  (b) entries superseded by a later re-delivery (entry batch != the
  id's latest batch — checked against the candidate-bounded version
  lookup, a broadcast-semi-joined scan of the id+batch columns only),
- emitted pairs carry BOTH endpoints' versions (a_ver, b_ver). Nothing
  is ever retracted from the pairs log — supersession happens AT READ:
  :func:`current_near_dups` keeps a pair iff both endpoints' emit
  versions are still their latest versions. An update to either
  endpoint silently invalidates the old pairs, and the update's own
  batch re-emits whatever still matches (its new bands joined the whole
  surviving corpus), so the CURRENT view always equals batch dedup over
  the corpus of latest versions (within-batch exact + cross-batch LSH
  recall, the q_streaming_near_dup contract).

Per-batch cost stays incremental: the batch's own shingle/band passes,
one band-bucket join against the index, and a version lookup bounded by
the candidate set; the only full-store read is the two-column id+batch
projection inside the read-side view.

Write discipline is dedup_stream's: every sink partitioned by batch_id
with dynamic overwrite, so a retried batch rewrites its own partitions.

Lifecycle: a long-running stream accretes one partition per batch per
sink. :func:`compact_upsert_index` (run quiescent) folds each id's
LATEST-version docs/bands entries — original batch ids preserved as a
data column, so the version relation is bit-identical — into a
``base-<F>`` generation per side, and optionally folds the pairs log to
its both-endpoints-live survivors. Commit point per side is the parquet
``_SUCCESS``; docs fold before bands, readers use the min committed
generation, cleanup runs only after both sides commit, and every crash
point resumes deterministically. Batches write pairs BEFORE the index
sides so a checkpoint replay of an already-folded batch can no-op
without losing pairs.
"""

from __future__ import annotations

import posixpath
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    doc_shingles,
    jaccard_near_dups,
    jaccard_verify_pairs,
    lsh_band_rows,
    minhash_signatures_mapside,
)
from .dedup_stream import _batch_ids, _hadoop_fs

_BASE_RE = re.compile(r"^base-(\d+)$")


def _committed_bases(spark, side_dir: str) -> dict[int, bool]:
    """{F: committed} for every ``base-<F>`` directory under a side —
    committed means the Spark write's own ``_SUCCESS`` marker landed (the
    compaction commit point; a dir without it is a crashed partial write,
    ignored by readers and swept by the next compaction)."""
    out: dict[int, bool] = {}
    fs, jpath = _hadoop_fs(spark, side_dir)
    if not fs.exists(jpath):
        return out
    jvm = spark._jvm
    for status in fs.listStatus(jpath):
        m = _BASE_RE.match(status.getPath().getName())
        if m:
            ok = fs.exists(
                jvm.org.apache.hadoop.fs.Path(
                    posixpath.join(side_dir, m.group(0), "_SUCCESS")
                )
            )
            out[int(m.group(1))] = bool(ok)
    return out


def _has_parquet_files(spark, path: str) -> bool:
    """True iff ``path`` exists and holds at least one ``*.parquet`` file
    (directly or one level down — dynamic partitionBy writes nest part
    files under partition dirs). Distinguishes a zero-row write (only
    ``_SUCCESS``) from a readable layout WITHOUT a try/except around the
    read, so genuine IO errors still propagate from the read itself."""
    fs, jpath = _hadoop_fs(spark, path)
    if not fs.exists(jpath):
        return False
    stack = [jpath]
    depth = {str(jpath): 0}
    while stack:
        cur = stack.pop()
        for status in fs.listStatus(cur):
            name = status.getPath().getName()
            if status.isFile() and name.endswith(".parquet"):
                return True
            if status.isDirectory() and depth[str(cur)] == 0:
                stack.append(status.getPath())
                depth[str(status.getPath())] = 1
    return False


def _side_fold(spark, side_dir: str) -> int | None:
    """The side's max COMMITTED base generation, or None if unfolded."""
    committed = [f for f, ok in _committed_bases(spark, side_dir).items() if ok]
    return max(committed) if committed else None


def _index_fold(spark, docs_dir: str, bands_dir: str) -> int | None:
    """The index's effective fold point: the max generation committed on
    BOTH sides. Compaction writes docs' base before bands', so after a
    mid-compaction crash docs may be one generation ahead — the common
    (older) generation is still fully readable on both sides because old
    bases and folded batch partitions are deleted only after both sides
    commit."""
    fd = _side_fold(spark, docs_dir)
    fb = _side_fold(spark, bands_dir)
    if fd is None or fb is None:
        return None
    return min(fd, fb)


def _live_batch_ids(spark, side_dir: str, fold: int | None) -> set[int]:
    """batch_id partitions under a side that the fold point does NOT
    cover (fold=None covers nothing)."""
    ids = _batch_ids(spark, side_dir)
    if fold is None:
        return ids
    return {b for b in ids if b > fold}


def _read_side(
    spark,
    side_dir: str,
    fold: int | None,
    batches: set[int],
) -> DataFrame | None:
    """Unified read of a side: the committed ``base-<fold>`` (batch_id is
    a DATA column there — compaction preserves each surviving entry's
    original version) unioned with the still-live batch_id partitions
    (batch_id recovered from the partition dirs). None when the side holds
    nothing at all."""
    parts: list[DataFrame] = []
    if fold is not None:
        base = spark.read.parquet(posixpath.join(side_dir, f"base-{fold}"))
        parts.append(base.withColumn("batch_id", F.col("batch_id").cast("long")))
    if batches:
        paths = [
            posixpath.join(side_dir, f"batch_id={b}") for b in sorted(batches)
        ]
        df = spark.read.option("basePath", side_dir).parquet(*paths)
        parts.append(df.withColumn("batch_id", F.col("batch_id").cast("long")))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_upsert_near_dup(
    docs: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Start the upsert-aware near-dup job on a document stream; a
    re-delivered ``id_col`` replaces the document (last writer wins)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        process_upsert_batch(
            batch,
            batch_id,
            index_dir=index_dir,
            pairs_dir=pairs_dir,
            id_col=id_col,
            text_col=text_col,
            n=n,
            threshold=threshold,
        )

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def process_upsert_batch(
    batch: DataFrame,
    batch_id: int,
    *,
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> None:
    bands_dir = posixpath.join(index_dir, "bands")
    docs_dir = posixpath.join(index_dir, "docs")
    if batch.isEmpty():
        return
    spark = batch.sparkSession
    fold = _index_fold(spark, docs_dir, bands_dir)
    prev = _live_batch_ids(spark, docs_dir, fold) - {batch_id}
    bands_prev = _live_batch_ids(spark, bands_dir, fold) - {batch_id}
    if bands_prev != prev:
        raise RuntimeError(
            f"upsert near-dup index at {index_dir} is incomplete: bands "
            f"has batches {sorted(bands_prev)} but docs has "
            f"{sorted(prev)} (interrupted write?)"
        )
    if any(b < 0 for b in prev):
        # compact_index folds every partition to batch_id=-1, which
        # destroys the version information this job's liveness checks and
        # read-side supersession depend on — refuse loudly instead of
        # silently emptying the current view / reviving stale entries.
        # (compact_upsert_index is the version-AWARE op for this index.)
        raise RuntimeError(
            f"upsert near-dup index at {index_dir} contains compacted "
            "(batch_id=-1) partitions; compact_index is the APPEND-ONLY "
            "job's maintenance op and is incompatible with a versioned "
            "upsert index"
        )
    if fold is not None and batch_id <= fold:
        # a checkpoint replay of a batch the compaction already folded:
        # its completed write is inside base-<fold>, and readers ignore
        # batch partitions <= fold, so re-emitting index rows or pairs
        # would be wasted (and the pair emits would duplicate). Before
        # no-opping, distinguish a genuine replay from MISUSE: restarting
        # the stream against a compacted index with a FRESH checkpoint
        # restarts batch ids at 0, and treating those as replays would
        # silently drop data. Compaction keeps every id's latest version,
        # so a genuinely-folded batch's ids ALL exist in the docs store;
        # any absent id proves this batch never ran. NECESSARY but not
        # SUFFICIENT: a fresh-checkpoint batch that only RE-delivers ids
        # already in the compacted store passes this check and is dropped
        # as a replay, silently losing those updates — content is not
        # compared (a text-hash check would catch it at the cost of
        # reading the store's text column on this path). Reuse the
        # original checkpointLocation to avoid the hazard entirely. The
        # check is one anti-join of the (micro-batch-sized) id set
        # against the store's pruned id column, paid only on this rare
        # replay path.
        store = _read_side(spark, docs_dir, fold, prev)
        missing = (
            batch.select(F.col(id_col))
            .distinct()
            .join(store.select(id_col).distinct(), id_col, "left_anti")
            .limit(1)
            .count()
        )
        if missing:
            raise RuntimeError(
                f"batch {batch_id} <= fold {fold} at {index_dir} contains "
                f"ids absent from the compacted index: this is not a "
                f"checkpoint replay of a folded batch but a NEW stream "
                f"started with a fresh checkpoint against a compacted "
                f"index (batch ids restarted at 0). Reuse the original "
                f"checkpointLocation, or point the new stream at a fresh "
                f"index_dir/pairs_dir. (Caveat: an update-only fresh "
                f"batch — every id already indexed — cannot be told "
                f"apart from a replay and would be silently dropped.)"
            )
        return

    # deterministic within-batch last-writer: at most one row per id
    # (double delivery inside one micro-batch has no order, so collapse
    # by max(text) — any pure function works as long as both engines
    # and every retry agree)
    batch = (
        batch.groupBy(F.col(id_col))
        .agg(F.max(text_col).alias(text_col))
        .localCheckpoint(eager=True)
    )
    docs_sh = doc_shingles(batch, id_col, text_col, n).localCheckpoint(
        eager=True
    )
    bands = lsh_band_rows(
        minhash_signatures_mapside(docs_sh, id_col), id_col
    ).localCheckpoint(eager=True)

    pairs = jaccard_near_dups(
        batch, id_col, text_col, n, threshold, shingles=docs_sh
    ).select(
        "a_id",
        "b_id",
        "n_common",
        "jaccard",
        F.lit(batch_id).cast("long").alias("a_ver"),
        F.lit(batch_id).cast("long").alias("b_ver"),
    )

    if prev or fold is not None:
        cur_ids = batch.select(F.col(id_col).alias("a_id"))
        old_bands = (
            _read_side(spark, bands_dir, fold, prev)
            .withColumnRenamed(id_col, "a_id")
            # (a) re-delivered THIS batch: old bands stale, new text
            # already joined within-batch
            .join(F.broadcast(cur_ids), "a_id", "left_anti")
        )
        # cands feeds two consumers (the version lookup's id set and the
        # live filter join) — checkpoint so the band-bucket join against
        # the stored index runs once per micro-batch, not twice
        cands = (
            old_bands.join(
                bands.withColumnRenamed(id_col, "b_id"), ["band", "bkey"]
            )
            .select("a_id", F.col("batch_id").alias("entry_ver"), "b_id")
            .dropDuplicates(["a_id", "entry_ver", "b_id"])
            .localCheckpoint(eager=True)
        )
        # (b) candidate-bounded version lookup: an id's latest batch over
        # the docs store's id+batch projection (columns only — the scan
        # prunes to two columns; the semi join bounds the aggregate to
        # candidate ids)
        old_docs = _read_side(spark, docs_dir, fold, prev)
        latest = (
            old_docs.select(F.col(id_col).alias("a_id"), "batch_id")
            .join(
                F.broadcast(cands.select("a_id").distinct()), "a_id"
            )
            .groupBy("a_id")
            .agg(F.max("batch_id").alias("a_ver"))
        )
        live = cands.join(latest, "a_id").filter(
            F.col("entry_ver") == F.col("a_ver")
        )
        verified = jaccard_verify_pairs(
            live.join(
                old_docs.select(
                    F.col(id_col).alias("a_id"),
                    F.col("sh").alias("a_sh"),
                    F.col("batch_id").alias("a_ver2"),
                ),
                "a_id",
            )
            .filter(F.col("a_ver2") == F.col("a_ver"))
            .join(
                docs_sh.select(
                    F.col(id_col).alias("b_id"), F.col("sh").alias("b_sh")
                ),
                "b_id",
            )
            .select("a_id", "b_id", "a_sh", "b_sh", "a_ver"),
            threshold,
            carry=("a_ver",),  # rides through the verify — no join-back
        ).select(
            "a_id",
            "b_id",
            "n_common",
            "jaccard",
            "a_ver",
            F.lit(batch_id).cast("long").alias("b_ver"),
        )
        pairs = pairs.unionByName(verified)

    def write(df: DataFrame, path: str, *extra_parts: str) -> None:
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.partitionBy("batch_id", *extra_parts)
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(path)
        )

    # pairs FIRST: the folded-batch replay no-op above is safe only if
    # "docs+bands have batch N" implies "batch N's pairs were written" —
    # compaction can then never fold a batch whose pairs are missing. A
    # crash after pairs but before the index writes is healed by the
    # checkpoint replay (batch N stays > fold, dynamic overwrite rewrites
    # its own partitions); a crash between bands and docs is caught by the
    # interrupted-write check and heals the same way.
    write(pairs, pairs_dir)
    write(bands, bands_dir, "band")
    write(docs_sh, docs_dir)


def _read_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame | None:
    """Read the pairs log — the committed ``base-<F>`` generation (written
    by compact_upsert_index's pairs fold) plus the live batch_id
    partitions — tolerating the all-empty-batches layout: if every batch
    so far emitted zero pairs, the partitioned writes leave only _SUCCESS
    markers (no parquet footers) and a bare read fails with an
    unable-to-infer-schema error — signal "no pairs" with None so the
    caller can build an empty result typed from the docs store."""
    fold = _side_fold(spark, pairs_dir)
    live = _live_batch_ids(spark, pairs_dir, fold)
    parts: list[DataFrame] = []
    if fold is not None and _has_parquet_files(
        spark, posixpath.join(pairs_dir, f"base-{fold}")
    ):
        parts.append(
            spark.read.parquet(posixpath.join(pairs_dir, f"base-{fold}"))
        )
    if live:
        # a zero-pair batch's dynamic-overwrite write leaves only _SUCCESS
        # (no parquet footers) under its batch_id= dir — include only dirs
        # that hold data files, so schema inference never fails and a
        # GENUINE IO/corruption error still surfaces from the read itself
        paths = [
            p
            for b in sorted(live)
            if _has_parquet_files(
                spark, p := posixpath.join(pairs_dir, f"batch_id={b}")
            )
        ]
        if paths:
            parts.append(
                spark.read.option("basePath", pairs_dir)
                .parquet(*paths)
                .drop("batch_id")
            )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def current_near_dups(
    spark: SparkSession,
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """The CURRENT pair view: emitted pairs whose endpoints are both still
    at their emit-time versions. One id+batch projection of the docs
    store derives the version relation; stale pairs vanish without any
    retraction write."""
    docs_dir = posixpath.join(index_dir, "docs")
    bands_dir = posixpath.join(index_dir, "bands")
    fold = _index_fold(spark, docs_dir, bands_dir)
    live = _live_batch_ids(spark, docs_dir, fold)
    if any(b < 0 for b in live):
        # a compact_index-folded (batch_id=-1) store has lost its version
        # information — latest would collapse to -1 and every stored pair
        # would be dropped (compact_upsert_index preserves versions and is
        # read here transparently via the base-<F> generation)
        raise RuntimeError(
            f"upsert near-dup index at {index_dir} contains compacted "
            "partitions; the versioned view cannot be derived"
        )
    store = _read_side(spark, docs_dir, fold, live)
    if store is None:
        raise RuntimeError(f"upsert near-dup index at {index_dir} is empty")
    latest = (
        store.groupBy(F.col(id_col).alias("id"))
        .agg(F.max("batch_id").alias("latest"))
    )
    pairs = _read_pairs(spark, pairs_dir)
    if pairs is None:
        # zero pairs emitted so far — empty view, id type from the store
        return (
            store.select(
                F.col(id_col).alias("a_id"),
                F.col(id_col).alias("b_id"),
                F.lit(0).cast("bigint").alias("n_common"),
                F.lit(0.0).alias("jaccard"),
            )
            .limit(0)
        )
    la = latest.select(F.col("id").alias("a_id"), F.col("latest").alias("la"))
    lb = latest.select(F.col("id").alias("b_id"), F.col("latest").alias("lb"))
    # cross-batch pairs put the OLD document on the a side, so an update
    # can re-emit a pair with flipped orientation — normalize to a < b
    return (
        pairs.join(la, "a_id")
        .join(lb, "b_id")
        .filter((F.col("a_ver") == F.col("la")) & (F.col("b_ver") == F.col("lb")))
        .select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
            "n_common",
            "jaccard",
        )
        .dropDuplicates(["a_id", "b_id"])
    )


def _delete_path(spark, path: str) -> None:
    fs, jpath = _hadoop_fs(spark, path)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def _sweep_uncommitted_bases(spark, side_dir: str) -> None:
    for gen, committed in _committed_bases(spark, side_dir).items():
        if not committed:
            _delete_path(spark, posixpath.join(side_dir, f"base-{gen}"))


def _cleanup_folded(spark, side_dir: str, target: int) -> None:
    """Drop state the committed ``base-<target>`` generation covers: older
    base generations and batch_id partitions <= target. Runs only after
    BOTH sides committed target, so a crash mid-cleanup leaves extra (but
    ignored) directories, never missing data."""
    for gen in _committed_bases(spark, side_dir):
        if gen < target:
            _delete_path(spark, posixpath.join(side_dir, f"base-{gen}"))
    for b in _batch_ids(spark, side_dir):
        if b <= target:
            _delete_path(spark, posixpath.join(side_dir, f"batch_id={b}"))


def _fold_sides(
    spark,
    docs_dir: str,
    bands_dir: str,
    fold: int | None,
    batches: set[int],
    target: int,
    *,
    id_col: str,
    docs_done: bool,
) -> dict[str, int]:
    """Write ``base-<target>`` for both sides (docs first — the recovery
    invariant is docs_fold >= bands_fold). The latest-version map comes
    from the docs store; every surviving entry keeps its ORIGINAL
    batch_id as a data column, so read-side supersession (max batch per
    id vs the pairs' emit versions) is unchanged by compaction."""
    stats = {"docs": 0, "bands": 0}
    if docs_done:
        # resume: docs/base-<target> is committed, its rows ARE the
        # latest map (one row per id at its latest version)
        docs_new = spark.read.parquet(
            posixpath.join(docs_dir, f"base-{target}")
        ).withColumn("batch_id", F.col("batch_id").cast("long"))
    else:
        docs_all = _read_side(spark, docs_dir, fold, batches)
        latest = docs_all.groupBy(F.col(id_col).alias("__id")).agg(
            F.max("batch_id").alias("__latest")
        )
        docs_new = (
            docs_all.join(latest, F.col(id_col) == F.col("__id"))
            .filter(F.col("batch_id") == F.col("__latest"))
            .drop("__id", "__latest")
        )
        docs_new.write.mode("overwrite").parquet(
            posixpath.join(docs_dir, f"base-{target}")
        )
        stats["docs"] = spark.read.parquet(
            posixpath.join(docs_dir, f"base-{target}")
        ).count()
    latest = docs_new.select(
        F.col(id_col).alias("__id"), F.col("batch_id").alias("__latest")
    )
    bands_fold = _side_fold(spark, bands_dir)
    bands_batches = {
        b for b in _live_batch_ids(spark, bands_dir, bands_fold) if b <= target
    }
    bands_all = _read_side(spark, bands_dir, bands_fold, bands_batches)
    bands_new = (
        bands_all.join(latest, F.col(id_col) == F.col("__id"))
        .filter(F.col("batch_id") == F.col("__latest"))
        .drop("__id", "__latest")
    )
    bands_new.write.partitionBy("band").mode("overwrite").parquet(
        posixpath.join(bands_dir, f"base-{target}")
    )
    stats["bands"] = spark.read.parquet(
        posixpath.join(bands_dir, f"base-{target}")
    ).count()
    return stats


def compact_upsert_index(
    spark: SparkSession,
    index_dir: str,
    id_col: str = "doc_id",
    pairs_dir: str | None = None,
) -> dict[str, int]:
    """Version-AWARE compaction of the upsert near-dup index.

    The append-only job's ``compact_index`` folds everything to
    ``batch_id=-1``, which destroys the version information this index's
    read-side supersession depends on (process_upsert_batch refuses such
    an index). This op instead folds each id's LATEST-version docs/bands
    entries into a ``base-<F>`` generation directory, keeping every
    surviving entry's original batch_id as a data column — so
    ``max(batch_id) per id`` (the version relation) is bit-identical
    before and after, and the current pair view is unchanged. Superseded
    versions are dropped, and the per-batch partition count resets, fixing
    the unbounded-accretion lifecycle gap (a long-running upsert stream
    otherwise accretes one partition per batch forever).

    Crash safety (run while the stream is quiescent, like compact_index):

    - the commit point per side is the parquet write's own ``_SUCCESS``
      in ``base-<F>``; partial writes lack it, are ignored by readers,
      and are swept by the next run,
    - docs' base is written before bands', so docs_fold >= bands_fold
      always; readers use the min committed generation, under which both
      sides are complete (old bases and folded batch partitions are
      deleted only AFTER both sides commit),
    - a rerun after any crash point resumes deterministically: the
      latest-version map is a pure function of the surviving store, so
      the resumed bands fold writes byte-identical content.

    When ``pairs_dir`` is given, the pairs log is folded too (after the
    index sides commit): only pairs BOTH of whose endpoints are at their
    latest versions survive into ``pairs/base-<F>`` — safe because
    liveness (``ver == latest``) can never return once lost (latest only
    grows; a re-matching update re-EMITS the pair at its new version), so
    dropped pairs are dead forever. A zero-survivor fold writes no base
    (the read side treats a footerless generation as empty).

    Returns {"docs": rows, "bands": rows, "pairs": rows} folded by THIS
    call ("pairs" only when pairs_dir is given).
    """
    docs_dir = posixpath.join(index_dir, "docs")
    bands_dir = posixpath.join(index_dir, "bands")
    # sweep crashed partial base writes (no _SUCCESS)
    for side in (docs_dir, bands_dir):
        _sweep_uncommitted_bases(spark, side)
    stats = {"docs": 0, "bands": 0}
    # resume a docs-committed / bands-missing generation first
    fd = _side_fold(spark, docs_dir)
    fb = _side_fold(spark, bands_dir)
    if fd is not None and (fb is None or fb < fd):
        s = _fold_sides(
            spark, docs_dir, bands_dir, fb, set(), fd,
            id_col=id_col, docs_done=True,
        )
        stats["bands"] += s["bands"]
        for side in (docs_dir, bands_dir):
            _cleanup_folded(spark, side, fd)
    # fresh fold over whatever live batches remain
    fold = _index_fold(spark, docs_dir, bands_dir)
    live_docs = _live_batch_ids(spark, docs_dir, fold)
    live_bands = _live_batch_ids(spark, bands_dir, fold)
    if live_docs != live_bands:
        raise RuntimeError(
            f"upsert near-dup index at {index_dir} is incomplete: bands "
            f"has batches {sorted(live_bands)} but docs has "
            f"{sorted(live_docs)} (interrupted write?) — let the streaming "
            "checkpoint retry the crashed batch, then compact"
        )
    if any(b < 0 for b in live_docs):
        raise RuntimeError(
            f"upsert near-dup index at {index_dir} contains append-only "
            "compacted (batch_id=-1) partitions; cannot version-fold them"
        )
    if not live_docs:
        if fold is not None:
            for side in (docs_dir, bands_dir):
                _cleanup_folded(spark, side, fold)
            if pairs_dir is not None:
                stats["pairs"] = _fold_pairs(
                    spark, index_dir, pairs_dir, fold, id_col
                )
        return stats
    target = max(live_docs)
    s = _fold_sides(
        spark, docs_dir, bands_dir, fold, live_docs, target,
        id_col=id_col, docs_done=False,
    )
    stats["docs"] += s["docs"]
    stats["bands"] += s["bands"]
    for side in (docs_dir, bands_dir):
        _cleanup_folded(spark, side, target)
    if pairs_dir is not None:
        stats["pairs"] = _fold_pairs(spark, index_dir, pairs_dir, target, id_col)
    return stats


def _fold_pairs(
    spark: SparkSession,
    index_dir: str,
    pairs_dir: str,
    target: int,
    id_col: str,
) -> int:
    """Fold the pairs log through generation ``target``: keep only pairs
    whose BOTH endpoints are at their latest versions (the current view's
    survivors — stale pairs are dead forever, see compact_upsert_index).
    Runs strictly AFTER the index fold commits, so the latest map read
    here already reflects generation ``target``. Writes
    ``pairs/base-<target>`` unless zero pairs survive (a footerless
    write is unreadable; the read side treats "no base" as empty), then
    drops the covered batch partitions and older pair bases."""
    _sweep_uncommitted_bases(spark, pairs_dir)
    fold_p = _side_fold(spark, pairs_dir)
    if fold_p is not None and fold_p >= target:
        # already folded through target — but a crash between the fold's
        # commit and its cleanup can leave covered dirs behind; sweep them
        _cleanup_folded(spark, pairs_dir, fold_p)
        return 0
    pairs = _read_pairs(spark, pairs_dir)
    n = 0
    if pairs is not None:
        docs_dir = posixpath.join(index_dir, "docs")
        bands_dir = posixpath.join(index_dir, "bands")
        fold_i = _index_fold(spark, docs_dir, bands_dir)
        store = _read_side(
            spark, docs_dir, fold_i, _live_batch_ids(spark, docs_dir, fold_i)
        )
        latest = store.groupBy(F.col(id_col).alias("id")).agg(
            F.max("batch_id").alias("latest")
        )
        la = latest.select(
            F.col("id").alias("a_id"), F.col("latest").alias("__la")
        )
        lb = latest.select(
            F.col("id").alias("b_id"), F.col("latest").alias("__lb")
        )
        live_pairs = (
            pairs.join(la, "a_id")
            .join(lb, "b_id")
            .filter(
                (F.col("a_ver") == F.col("__la"))
                & (F.col("b_ver") == F.col("__lb"))
            )
            .drop("__la", "__lb")
            .localCheckpoint(eager=True)
        )
        n = live_pairs.count()
        if n > 0:
            live_pairs.write.mode("overwrite").parquet(
                posixpath.join(pairs_dir, f"base-{target}")
            )
    # cleanup: older bases and covered batch partitions. When zero pairs
    # survived, no base-<target> exists — _cleanup_folded still only
    # removes state <= target, which the (empty) fold covers.
    _cleanup_folded(spark, pairs_dir, target)
    return n
