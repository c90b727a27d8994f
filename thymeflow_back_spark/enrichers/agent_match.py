"""AgentMatch: the full agent entity-resolution enricher.

Parity with reference AgentMatchEnricher.scala:139-340 (the composite the
round-1 er.py core only sketched):

1. shared-id equivalence classes: agents already linked by the IFP
   inferencer's sameAs collapse to one representative (connected
   components over the IFP output graph) before matching.
2. name evidence: per (agent, name), a count — names attached to agents
   that send/receive messages count once per message (message names);
   names of contact-card-only agents count once (contact names)
   (numberOfMessagesByAgentNameQuery).
3. contact-relative weighting: a contact card's name evidence is lifted to
   ``contact_relative_weight`` (default ½) of the agent's total mass when
   messages would otherwise drown it (getAgentNameWeights,
   AgentMatchEnricher.scala:961-1003).
4. optional name-part deduplication per agent (union-find over bipartite
   term alignments — algorithms/er_scoring.deduplicate_name_parts) and the
   given/family-name-part filter that drops agents without both a likely
   given and family name (solve modes DeduplicateAgentNameParts /
   ...AndSolvePartTypes, scala:391-470). Part types come from explicit
   schema:givenName/familyName quads plus email-local-part alignment:
   segments of local parts (split on [._-]) matched to name parts, with
   the per-(domain, pattern, position) type distribution propagated to
   untyped parts of other agents on the same domain — a one-round
   simplification of the reference's NamePartGraph transitivity
   (scala:448-560); provider domains (gmail etc.) are excluded.
5. candidate retrieval by 4-prefix token blocking with a hot-key cap (the
   ES matchQuery + searchSize analogue), scoring by the reference's
   normalizedSoftTFIDF over bipartite term matchings, threshold 0.9,
   differentFrom suppression, symmetric personal:sameAs output.

Scale: every stage is a DataFrame op; Python only in per-pair scoring and
per-agent name-part dedup (both Arrow-batched, both bounded by per-agent
name counts, never corpus-wide).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..algorithms.er_scoring import (
    deduplicate_name_parts,
    name_terms_equality_probability,
    names_equality_probability,
)
from ..functions.text_norm import normalize_text, tokenize
from ..operators.closure import connected_components
from ..rdf import vocab
from ..rdf.store import Diff, StatementStore

OUTPUT_GRAPH = "urn:graph:agentMatchEnricher"
IFP_GRAPH = "urn:graph:ifpInferencer"

# free-mail domains whose local parts say nothing about name structure
# (reference EmailProviderDomainList)
PROVIDER_DOMAINS = (
    "gmail.com", "googlemail.com", "yahoo.com", "hotmail.com", "outlook.com",
    "aol.com", "icloud.com", "me.com", "live.com", "msn.com", "free.fr",
    "orange.fr", "wanadoo.fr", "laposte.net", "web.de", "gmx.de", "gmx.net",
)


def shared_id_representative(store: StatementStore) -> DataFrame:
    """(agent, rep): connected components over IFP-inferred sameAs."""
    edges = (
        store.quads.filter(
            (F.col("graph") == IFP_GRAPH) & (F.col("predicate") == vocab.SAME_AS)
        )
        .select(F.col("subject").alias("src"), F.col("object_value").alias("dst"))
        .dropDuplicates()
    )
    return connected_components(edges).select(
        F.col("node").alias("agent"), F.col("component").alias("rep")
    )


def _agents(store: StatementStore) -> DataFrame:
    return (
        store.quads.filter(
            (F.col("predicate") == vocab.RDF_TYPE) & (F.col("object_value") == vocab.AGENT)
        )
        .select(F.col("subject").alias("agent"))
        .dropDuplicates()
    )


def _with_rep(df: DataFrame, rep_map: DataFrame, on: str = "agent") -> DataFrame:
    return df.join(rep_map, on=on, how="left").withColumn(
        "rep", F.coalesce("rep", F.col(on))
    )


def agent_name_counts(store: StatementStore, rep_map: DataFrame) -> DataFrame:
    """(rep, name, cnt, is_contact) — message names count per message,
    contact names once (numberOfMessagesByAgentNameQuery semantics)."""
    agents = _agents(store)
    names = (
        store.quads.filter(F.col("predicate") == vocab.NAME)
        .join(agents, agents["agent"] == F.col("subject"), "left_semi")
        .select(F.col("subject").alias("agent"), F.col("object_value").alias("name"))
        .dropDuplicates()
    )
    msgs = (
        store.quads.filter(F.col("predicate").isin(vocab.RECIPIENT, vocab.SENDER))
        .select(F.col("object_value").alias("agent"), F.col("subject").alias("msg"))
        .dropDuplicates()
        .groupBy("agent")
        .agg(F.count("*").alias("msg_count"))
    )
    counted = names.join(msgs, "agent", "left").select(
        "agent",
        "name",
        F.coalesce("msg_count", F.lit(0)).alias("msg_count"),
    )
    counted = counted.withColumn("is_contact", F.col("msg_count") == 0).withColumn(
        "cnt", F.when(F.col("is_contact"), F.lit(1)).otherwise(F.col("msg_count"))
    )
    return (
        _with_rep(counted, rep_map)
        .groupBy("rep", "name", "is_contact")
        .agg(F.sum("cnt").alias("cnt"))
    )


def agent_name_weights(
    counts: DataFrame, contact_relative_weight: float | None = 0.5
) -> DataFrame:
    """(rep, name, weight) with the contact-½ lift (getAgentNameWeights)."""
    totals = counts.groupBy("rep").agg(
        F.sum(F.when(F.col("is_contact"), F.col("cnt")).otherwise(0)).alias("tc"),
        F.sum(F.when(~F.col("is_contact"), F.col("cnt")).otherwise(0)).alias("tm"),
    )
    s = (F.col("tc") + F.col("tm")).cast("double")
    if contact_relative_weight is None:
        c_mult, m_mult = 1.0 / s, 1.0 / s
    else:
        rw = F.lit(float(contact_relative_weight))
        uniform = (F.col("tc") / s) >= rw
        both = (F.col("tc") > 0) & (F.col("tm") > 0)
        c_mult = F.when(uniform | ~both, 1.0 / s).otherwise(rw / F.col("tc"))
        m_mult = F.when(uniform | ~both, 1.0 / s).otherwise((1.0 - rw) / F.col("tm"))
    totals = totals.select("rep", c_mult.alias("c_mult"), m_mult.alias("m_mult"))
    return (
        counts.join(totals, "rep")
        .withColumn(
            "w",
            F.col("cnt") * F.when(F.col("is_contact"), F.col("c_mult")).otherwise(F.col("m_mult")),
        )
        .groupBy("rep", "name")
        .agg(F.sum("w").alias("weight"))
    )


_PARTS_SCHEMA = StructType(
    [
        StructField("rep", StringType(), False),
        StructField("token", StringType(), False),
        StructField("weight", DoubleType(), False),
        StructField("types", ArrayType(StringType()), False),
    ]
)


def agent_tokenized_names(weights: DataFrame) -> DataFrame:
    """(rep, names: array<struct<tokens, weight>>) with normalized tokens."""
    toks = weights.select(
        "rep", tokenize(normalize_text(F.col("name"))).alias("tokens"), "weight"
    ).filter(F.size("tokens") > 0)
    return toks.groupBy("rep").agg(
        F.collect_list(F.struct("tokens", "weight")).alias("names")
    )


def name_part_types(store: StatementStore, rep_map: DataFrame) -> DataFrame:
    """(rep, part_tokens, ptype) from explicit givenName/familyName quads."""
    parts = store.quads.filter(
        F.col("predicate").isin(vocab.GIVEN_NAME, vocab.FAMILY_NAME)
    ).select(
        F.col("subject").alias("agent"),
        F.col("object_value").alias("part"),
        F.col("predicate").alias("ptype"),
    )
    return (
        _with_rep(parts, rep_map)
        .select("rep", tokenize(normalize_text(F.col("part"))).alias("part_tokens"), "ptype")
        .filter(F.size("part_tokens") > 0)
        .dropDuplicates(["rep", "ptype", "part_tokens"])
    )


def deduplicated_parts(
    tokenized: DataFrame, typed_parts: DataFrame, distance_threshold: float = 1.0
) -> DataFrame:
    """Per-agent union-find name-part dedup → (rep, token, weight, types)."""
    typed = typed_parts.groupBy("rep").agg(
        F.collect_list(F.struct(F.col("part_tokens").alias("tokens"), F.col("ptype"))).alias(
            "typed"
        )
    )
    joined = tokenized.join(typed, "rep", "left")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in pdf.iterrows():
            names = [(list(n["tokens"]), float(n["weight"])) for n in r["names"]]
            typed_list = (
                [(list(t["tokens"]), t["ptype"]) for t in r["typed"]]
                if r["typed"] is not None and not isinstance(r["typed"], float)
                else []
            )
            for token, weight, types in deduplicate_name_parts(
                names, typed_list, distance_threshold=distance_threshold
            ):
                rows.append((r["rep"], token, weight, types))
        return pd.DataFrame(rows, columns=["rep", "token", "weight", "types"])

    return joined.mapInPandas(lambda it: (run(pdf) for pdf in it), _PARTS_SCHEMA)


def infer_part_type_weights(store: StatementStore, rep_map: DataFrame, parts: DataFrame) -> DataFrame:
    """(rep, token, ptype, prob): explicit types (prob 1) + email-local-part
    propagation over (domain, pattern, position) across agents."""
    explicit = parts.select(
        "rep", "token", F.explode_outer("types").alias("ptype"), F.lit(1.0).alias("prob")
    ).filter(F.col("ptype").isNotNull())

    # email address names reachable from each agent: EMAIL → mailto node → NAME
    email_nodes = store.quads.filter(F.col("predicate") == vocab.EMAIL).select(
        F.col("subject").alias("agent"), F.col("object_value").alias("mailto")
    )
    addr = store.quads.filter(F.col("predicate") == vocab.NAME).select(
        F.col("subject").alias("mailto"), F.col("object_value").alias("address")
    )
    emails = (
        _with_rep(email_nodes, rep_map)
        .join(addr, "mailto")
        .filter(F.col("address").contains("@"))
        .select(
            "rep",
            F.lower(F.substring_index("address", "@", 1)).alias("local"),
            F.lower(F.substring_index("address", "@", -1)).alias("domain"),
        )
        .filter(~F.col("domain").isin(*PROVIDER_DOMAINS))
        .dropDuplicates()
    )
    segments = emails.select(
        "rep",
        "domain",
        F.regexp_replace("local", r"[0-9]+", "").alias("local_clean"),
    ).select(
        "rep",
        "domain",
        F.posexplode(F.split("local_clean", r"[._-]")).alias("pos", "segment"),
        F.size(F.split("local_clean", r"[._-]")).alias("pattern_len"),
    ).filter(F.length("segment") > 0)

    # align segments to the agent's deduplicated parts (exact normalized match
    # — one-round simplification of the reference's pattern alignment)
    aligned = segments.join(
        parts.select("rep", "token", "types"),
        (segments["rep"] == parts["rep"]) & (segments["segment"] == parts["token"]),
    ).select(
        segments["rep"], "domain", "pattern_len", "pos", "token", "types"
    )
    qualified = aligned.select(
        "domain", "pattern_len", "pos", F.explode("types").alias("ptype")
    )
    dist = (
        qualified.groupBy("domain", "pattern_len", "pos", "ptype")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "prob",
            F.col("n") / F.sum("n").over(Window.partitionBy("domain", "pattern_len", "pos")),
        )
        .select("domain", "pattern_len", "pos", "ptype", "prob")
    )
    propagated = (
        aligned.filter(F.size("types") == 0)
        .join(dist, ["domain", "pattern_len", "pos"])
        .select("rep", "token", "ptype", "prob")
    )
    return explicit.unionByName(propagated).groupBy("rep", "token", "ptype").agg(
        F.max("prob").alias("prob")
    )


def filter_agents_by_part_types(
    parts: DataFrame, type_weights: DataFrame, min_weight: float = 0.25
) -> DataFrame:
    """Reps eligible for matching (filterAgentsWithNamePartTypes): drop an
    agent only when ALL its significant parts have inferred types but the
    given/family evidence is one-sided."""
    scored = parts.join(type_weights, ["rep", "token"], "left").select(
        "rep",
        "token",
        "weight",
        "ptype",
        (F.coalesce("prob", F.lit(0.0)) * F.col("weight")).alias("tw"),
    )
    per_rep = scored.groupBy("rep").agg(
        F.max(
            F.when((F.col("weight") > min_weight) & F.col("ptype").isNull(), 1).otherwise(0)
        ).alias("not_fully_inferred"),
        F.max(F.when(F.col("ptype") == vocab.GIVEN_NAME, F.col("tw")).otherwise(0.0)).alias("gw"),
        F.max(F.when(F.col("ptype") == vocab.FAMILY_NAME, F.col("tw")).otherwise(0.0)).alias("fw"),
    )
    return per_rep.filter(
        (F.col("not_fully_inferred") == 1)
        | ((F.col("gw") >= min_weight) & (F.col("fw") >= min_weight))
    ).select("rep")


def _term_weights_vanilla(tokenized: DataFrame) -> DataFrame:
    """(rep, term, weight): per-term membership probability min(Σw, 1)."""
    return (
        tokenized.select("rep", F.explode("names").alias("n"))
        .select("rep", F.explode(F.array_distinct("n.tokens")).alias("term"), F.col("n.weight").alias("w"))
        .groupBy("rep", "term")
        .agg(F.least(F.sum("w"), F.lit(1.0)).alias("weight"))
    )


def _idf(term_weights: DataFrame) -> DataFrame:
    n = term_weights.select("rep").distinct().count()
    return term_weights.groupBy("term").agg(
        F.log(F.lit(float(n)) / F.sum("weight")).alias("idf")
    )


def _candidates(term_weights: DataFrame, max_token_df: int = 10_000) -> DataFrame:
    """4-prefix blocking with hot-key cap → (a, b) rep pairs, a < b."""
    keyed = term_weights.select(
        "rep", F.substring("term", 1, 4).alias("key")
    ).dropDuplicates()
    rare = keyed.groupBy("key").agg(F.count("*").alias("df")).filter(
        F.col("df") <= max_token_df
    )
    blocked = keyed.join(rare.select("key"), "key")
    return (
        blocked.alias("x")
        .join(blocked.alias("y"), "key")
        .filter(F.col("x.rep") < F.col("y.rep"))
        .select(F.col("x.rep").alias("a"), F.col("y.rep").alias("b"))
        .dropDuplicates()
    )


def agent_match_pairs(
    store: StatementStore,
    solve_mode: str = "vanilla",  # vanilla | dedup_parts | solve_part_types
    contact_relative_weight: float | None = 0.5,
    threshold: float = 0.9,
    distance_threshold: float = 1.0,
    dedup_distance_threshold: float = 0.3,
    max_token_df: int = 10_000,
) -> DataFrame:
    """Full AgentMatch pipeline → (a, b, prob) rep pairs ≥ threshold.

    The reference exposes a single matchDistanceThreshold (default 1.0);
    at 1.0 the name-part dedup union-find degenerates (every 1:1 term
    alignment is within distance 1.0, so unrelated parts bridge into one
    group). Its name-part experiments run at lower MDT, so dedup gets its
    own ``dedup_distance_threshold`` (0.3) while pair scoring keeps the
    reference default."""
    rep_map = shared_id_representative(store)
    counts = agent_name_counts(store, rep_map)
    weights = agent_name_weights(counts, contact_relative_weight)
    tokenized = agent_tokenized_names(weights)

    if solve_mode == "vanilla":
        term_weights = _term_weights_vanilla(tokenized)
    else:
        typed = name_part_types(store, rep_map)
        parts = deduplicated_parts(tokenized, typed, dedup_distance_threshold)
        if solve_mode == "solve_part_types":
            type_weights = infer_part_type_weights(store, rep_map, parts)
            eligible = filter_agents_by_part_types(parts, type_weights)
            parts = parts.join(eligible, "rep", "left_semi")
        term_weights = parts.select("rep", F.col("token").alias("term"), "weight")

    # IDF weights ride with the rows (join on term) instead of a collected
    # driver-side dict — the scoring UDF rebuilds the map per pair, so the
    # plan holds at document-scale vocabularies (VERDICT r2 scale item).
    idf_df = _idf(term_weights)

    if solve_mode == "vanilla":
        # re-nest names with positionally-aligned per-token idf arrays
        names_x = tokenized.select("rep", F.posexplode("names").alias("npos", "name"))
        toks = names_x.select(
            "rep", "npos", F.col("name.weight").alias("weight"),
            F.posexplode("name.tokens").alias("tpos", "token"),
        )
        with_idf = toks.join(
            idf_df.withColumnRenamed("term", "token"), "token", "left"
        ).withColumn("idf", F.coalesce(F.col("idf"), F.lit(0.0)))
        name_built = with_idf.groupBy("rep", "npos", "weight").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "token"))),
                lambda s: s["token"],
            ).alias("tokens"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "idf"))),
                lambda s: s["idf"],
            ).alias("token_idf"),
        )
        scoring = name_built.groupBy("rep").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("npos", "tokens", "token_idf", "weight"))
                ),
                lambda s: F.struct(
                    s["tokens"].alias("tokens"),
                    s["token_idf"].alias("token_idf"),
                    s["weight"].alias("weight"),
                ),
            ).alias("names")
        )
    else:
        scoring = (
            parts.join(idf_df.withColumnRenamed("term", "token"), "token", "left")
            .withColumn("idf", F.coalesce(F.col("idf"), F.lit(0.0)))
            .groupBy("rep")
            .agg(
                F.collect_list(F.struct(F.col("token"), F.col("weight"), F.col("idf"))).alias(
                    "parts"
                )
            )
        )

    cands = _candidates(term_weights, max_token_df)

    if solve_mode == "vanilla":
        pairs = (
            cands.join(scoring.withColumnRenamed("rep", "a").withColumnRenamed("names", "a_names"), "a")
            .join(scoring.withColumnRenamed("rep", "b").withColumnRenamed("names", "b_names"), "b")
        )

        @pandas_udf("double")
        def score(a_names: pd.Series, b_names: pd.Series) -> pd.Series:
            out = []
            for an, bn in zip(a_names, b_names):
                idf = {}
                for x in list(an) + list(bn):
                    idf.update(zip(x["tokens"], x["token_idf"]))
                n1 = [(list(x["tokens"]), float(x["weight"])) for x in an]
                n2 = [(list(x["tokens"]), float(x["weight"])) for x in bn]
                out.append(names_equality_probability(n1, n2, idf, distance_threshold))
            return pd.Series(out)

        scored = pairs.withColumn("prob", score("a_names", "b_names"))
    else:
        pairs = (
            cands.join(scoring.withColumnRenamed("rep", "a").withColumnRenamed("parts", "a_parts"), "a")
            .join(scoring.withColumnRenamed("rep", "b").withColumnRenamed("parts", "b_parts"), "b")
        )

        @pandas_udf("double")
        def score(a_parts: pd.Series, b_parts: pd.Series) -> pd.Series:
            out = []
            for ap, bp in zip(a_parts, b_parts):
                idf = {x["token"]: float(x["idf"]) for x in list(ap) + list(bp)}
                t1 = [(x["token"], float(x["weight"])) for x in ap]
                t2 = [(x["token"], float(x["weight"])) for x in bp]
                out.append(name_terms_equality_probability(t1, t2, idf, distance_threshold))
            return pd.Series(out)

        scored = pairs.withColumn("prob", score("a_parts", "b_parts"))

    different = store.quads.filter(F.col("predicate") == vocab.DIFFERENT_FROM).select(
        F.least("subject", "object_value").alias("a"),
        F.greatest("subject", "object_value").alias("b"),
    )
    return (
        scored.filter(F.col("prob") >= threshold)
        .select("a", "b", "prob")
        .join(different, ["a", "b"], "left_anti")
    )


def agent_match_enricher(
    store: StatementStore, diff: Diff, solve_mode: str = "vanilla", **kwargs
) -> Diff:
    """Enricher adapter: emits symmetric personal:sameAs quads into the
    AgentMatch output graph. Add-only, like the reference (its TODO notes
    old sameAs are not retracted either)."""
    pairs = agent_match_pairs(store, solve_mode=solve_mode, **kwargs)
    fwd = pairs.select(
        F.col("a").alias("subject"),
        F.lit(vocab.SAME_AS).alias("predicate"),
        F.col("b").alias("object_value"),
    )
    bwd = pairs.select(
        F.col("b").alias("subject"),
        F.lit(vocab.SAME_AS).alias("predicate"),
        F.col("a").alias("object_value"),
    )
    added = (
        fwd.unionByName(bwd)
        .withColumn("object_type", F.lit("iri"))
        .withColumn("object_datatype", F.lit(None).cast("string"))
        .withColumn("object_lang", F.lit(None).cast("string"))
        .withColumn("graph", F.lit(OUTPUT_GRAPH))
    )
    return Diff(added=added, removed=added.limit(0))
