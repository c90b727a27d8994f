"""IDF-weighted Jaccard dedup (operators/dedup.py weighted_jaccard_near_dups)."""

from __future__ import annotations

from pyspark.sql import functions as F

from thymeflow_back_spark.operators.dedup import (
    jaccard_near_dups,
    weighted_jaccard_near_dups,
)
from thymeflow_back_spark.queries.dedup import WJ_BOILER
from thymeflow_back_spark.tables import load


def _inject(docs):
    return docs.selectExpr(
        "doc_id",
        f"CASE WHEN doc_id % 2 = 0 THEN concat(text, ' ', '{WJ_BOILER}')"
        " ELSE text END AS text",
    )


def test_weighted_survives_boilerplate_plain_does_not(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    true_pairs = {
        (r.a_id, r.b_id)
        for r in jaccard_near_dups(docs, "doc_id", "text", 3, 0.5).collect()
    }
    injected = _inject(docs)
    weighted = {
        (r.a_id, r.b_id)
        for r in weighted_jaccard_near_dups(
            injected, "doc_id", "text", 3, 0.5
        ).collect()
    }
    plain = {
        (r.a_id, r.b_id)
        for r in jaccard_near_dups(injected, "doc_id", "text", 3, 0.5).collect()
    }
    # the weighted join keeps exactly the REAL near-dup pairs
    assert weighted == true_pairs and true_pairs
    # plain Jaccard at the same threshold drowns in boilerplate pairs:
    # every unrelated even-even pair crosses 0.5
    false_even = {
        (a, b) for a, b in plain
        if a % 2 == 0 and b % 2 == 0 and (a, b) not in true_pairs
    }
    assert len(false_even) > len(true_pairs)


def test_weight_arithmetic_tiny_fixture(spark):
    # three docs: A and B are near-identical; C shares only the common
    # boilerplate shingles x1..x4 that all three carry
    boiler = "x1 x2 x3 x4 x5 x6"
    rows = [
        (0, "alpha beta gamma delta epsilon " + boiler),
        (1, "alpha beta gamma delta zeta " + boiler),
        (2, "completely different content words here " + boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.a_id, r.b_id): r.wjac
        for r in weighted_jaccard_near_dups(
            df, "doc_id", "text", 3, 0.2, weight_scale=1000, block_df_cap=2
        ).collect()
    }
    # with only 3 docs the df=3 boilerplate shingles still weigh 1000//3,
    # so the near-identical pair lands at ~0.28 — above 0.2, while the
    # boilerplate-only pairs are not even CANDIDATES (no df<=2 shingle
    # shared), demonstrating the blocking contract
    assert (0, 1) in out
    assert (0, 2) not in out and (1, 2) not in out


def test_partitioning_invariance(spark, sf_dir):
    docs = _inject(load(spark, sf_dir, "documents").select("doc_id", "text"))
    outs = []
    for parts in (2, 13):
        outs.append(sorted(
            (r.a_id, r.b_id, r.iw, r.wjac)
            for r in weighted_jaccard_near_dups(
                docs.repartition(parts), "doc_id", "text", 3, 0.5
            ).collect()
        ))
    assert outs[0] == outs[1] and outs[0]
