"""Update routing: apply a user-issued diff with write-back semantics.

Parity with reference Updater.scala:26-196 (SURVEY.md §3.3):

- adds WITH an explicit graph go to that graph;
- adds WITHOUT a graph are routed to a "possible context" inferred from the
  subject's existing graphs (most-populated source graph), else to the user
  graph;
- removals are applied locally; a removal from a SYNCHRONIZED source graph
  additionally asserts a negation quad in the user graph so the next sync
  cannot resurrect the triple (write-back to IMAP/files always fails in the
  reference — the negation is the durable record of the user's intent);
- adds a source rejects land in the user graph (here: sources are
  represented by a write_back callback; None means "cannot write back",
  the reference's IMAP/file behavior).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..rdf import vocab
from ..rdf.model import NEG_PREFIX, QUAD_COLUMNS, negate, negate_col
from ..rdf.store import Diff, StatementStore

SPOT = ("subject", "predicate", "object_value", "object_type")

USER_GRAPH = "urn:graph:userData"

# write_back(graph, added_df, removed_df) -> bool (True = source accepted)
WriteBack = Callable[[str, DataFrame, DataFrame], bool]


def _route_graphless_adds(store: StatementStore, adds: DataFrame) -> DataFrame:
    """Adds with NULL graph → the subject's dominant existing graph, else
    the user graph (reference 'possible contexts' inference,
    Updater.scala:109-130)."""
    subject_graphs = (
        store.quads.groupBy("subject", "graph")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("subject").orderBy(F.desc("n"), F.asc("graph"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("subject", F.col("graph").alias("target_graph"))
    )
    return (
        adds.drop("graph")
        .join(subject_graphs, "subject", "left")
        .withColumn("graph", F.coalesce(F.col("target_graph"), F.lit(USER_GRAPH)))
        .select(*QUAD_COLUMNS)
    )


def _negation_quads(removed: DataFrame) -> DataFrame:
    """Negation assertions for removals from synchronized graphs. A removed
    personal:sameAs asserts personal:differentFrom (the special pair,
    Negation.scala:21-23) rather than a prefixed quad."""
    return removed.select(
        F.col("subject"),
        negate_col(F.col("predicate")).alias("predicate"),
        F.col("object_value"),
        F.col("object_type"),
        F.col("object_datatype"),
        F.col("object_lang"),
        F.lit(USER_GRAPH).alias("graph"),
    ).select(*QUAD_COLUMNS)


def apply_update(
    store: StatementStore,
    diff: Diff,
    synchronized_graph_prefix: str = "urn:uuid:",
    write_back: WriteBack | None = None,
) -> StatementStore:
    """Apply a SPARQL-UPDATE-style diff with source write-back routing."""
    added = diff.added
    graphless = added.filter(F.col("graph").isNull())
    explicit = added.filter(F.col("graph").isNotNull())
    routed = _route_graphless_adds(store, graphless) if not graphless.isEmpty() else graphless

    # removals with NULL graph expand to ALL matching store statements
    # (reference Updater.scala:138-144 — a context-less DELETE means "this
    # triple, wherever it lives"), mirroring _route_graphless_adds
    removed = diff.removed
    graphless_rm = removed.filter(F.col("graph").isNull())
    explicit_rm = removed.filter(F.col("graph").isNotNull())
    if not graphless_rm.isEmpty():
        resolved = store.quads.join(
            graphless_rm.select(*SPOT).dropDuplicates(), on=list(SPOT), how="left_semi"
        )
        removed = explicit_rm.unionByName(resolved.select(*QUAD_COLUMNS))
    else:
        removed = explicit_rm
    sync_removed = removed.filter(F.col("graph").startswith(synchronized_graph_prefix))

    # split adds by whether they target a synchronized source graph (explicit
    # OR routed there by the possible-contexts inference) — those must go
    # through the source's write-back, like removals (Updater.scala:47-75)
    is_sync = F.col("graph").startswith(synchronized_graph_prefix)
    candidate_adds = explicit.select(*QUAD_COLUMNS).unionByName(routed.select(*QUAD_COLUMNS))
    sync_added = candidate_adds.filter(is_sync)
    other_added = candidate_adds.filter(~is_sync)

    # attempt write-back per synchronized graph over its adds AND removes;
    # a failure asserts negations (removes) / reroutes to the user graph
    # (adds — keeping them in the source graph would lose them on the next
    # idempotent document re-delivery, which is why the reference keeps
    # rejected adds in personal:userData)
    failed_removals, failed_adds, ok_adds = sync_removed, sync_added, None
    if write_back is not None:
        # ONE job materializes the whole sync diff (update diffs are
        # user-scale); grouping by graph happens driver-side, so a bulk
        # update touching many graphs costs one Spark job, not 2×G filter
        # jobs re-running the diff pipeline per graph
        tagged = (
            sync_added.select(*QUAD_COLUMNS).withColumn("__op", F.lit("add"))
            .unionByName(
                sync_removed.select(*QUAD_COLUMNS).withColumn("__op", F.lit("rm"))
            )
            .collect()
        )
        by_graph: dict[str, tuple[list, list]] = {}
        for r in tagged:
            slot = by_graph.setdefault(r["graph"], ([], []))
            (slot[0] if r["__op"] == "add" else slot[1]).append(r)
        # synchronizers may expose the row-level batch hook (no Spark work
        # inside); plain callbacks get small local DataFrames instead
        rows_fn = getattr(write_back, "write_back_rows", None)
        if rows_fn is None and hasattr(write_back, "__self__"):
            rows_fn = getattr(write_back.__self__, "write_back_rows", None)
        spark = store.quads.sparkSession
        ddl = ", ".join(f"{c} string" for c in QUAD_COLUMNS)
        accepted_graphs = []
        for g in sorted(by_graph):
            adds, rms = by_graph[g]
            if rows_fn is not None:
                ok = rows_fn(
                    g,
                    [(r["subject"], r["predicate"], r["object_value"]) for r in adds],
                    [(r["subject"], r["predicate"], r["object_value"]) for r in rms],
                )
            else:
                added_df = spark.createDataFrame(
                    [tuple(r[c] for c in QUAD_COLUMNS) for r in adds], ddl
                )
                removed_df = spark.createDataFrame(
                    [tuple(r[c] for c in QUAD_COLUMNS) for r in rms], ddl
                )
                ok = write_back(g, added_df, removed_df)
            if ok:
                accepted_graphs.append(g)
        if accepted_graphs:
            failed_removals = sync_removed.filter(~F.col("graph").isin(accepted_graphs))
            failed_adds = sync_added.filter(~F.col("graph").isin(accepted_graphs))
            ok_adds = sync_added.filter(F.col("graph").isin(accepted_graphs))

    negations = _negation_quads(failed_removals)
    all_adds = other_added.unionByName(
        failed_adds.withColumn("graph", F.lit(USER_GRAPH)).select(*QUAD_COLUMNS)
    )
    if ok_adds is not None:
        all_adds = all_adds.unionByName(ok_adds.select(*QUAD_COLUMNS))

    # a user re-add clears any matching negation quad (reference Updater.
    # scala:34-36) — otherwise a once-removed triple stays suppressed forever,
    # since add_documents anti-joins sync adds against negations on every sync
    neg_keys = all_adds.select(
        "subject",
        negate_col(F.col("predicate")).alias("predicate"),
        "object_value",
        "object_type",
    ).dropDuplicates()
    cleared_negations = store.quads.filter(
        F.col("predicate").startswith(NEG_PREFIX)
        | F.col("predicate").isin(vocab.SAME_AS, vocab.DIFFERENT_FROM)
    ).join(neg_keys, on=list(SPOT), how="left_semi")

    effective = Diff(
        all_adds.unionByName(negations),
        removed.select(*QUAD_COLUMNS).unionByName(cleared_negations.select(*QUAD_COLUMNS)),
    )
    return store.apply_diff(effective).materialize()
