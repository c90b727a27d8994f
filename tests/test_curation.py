"""Unit tests for the round-6 curation operators: keep-best dedup collapse,
cross-table LSH decontamination, and DSIR importance resampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from thymeflow_back_spark.operators import dedup as D
from thymeflow_back_spark.operators.dsir import dsir_resample, dsir_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint")


def test_keep_best_prefers_quality_then_smallest_id(spark):
    # docs 1/2/3 are near-identical (one cluster); 2 is longest; 10 is a singleton
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base, 10),
        (2, base + " iota", 99),
        (3, base, 10),
        (10, "completely different words nothing shared here at all", 7),
    ]
    out = D.dedup_keep_best(_docs(spark, rows), "doc_id", "text", "n_chars").collect()
    by_canon = {r["canonical_id"]: r for r in out}
    assert set(by_canon) == {1, 10}
    winner = by_canon[1]
    assert winner["doc_id"] == 2  # highest n_chars wins, not smallest id
    assert winner["cluster_size"] == 3
    assert winner["n_chars"] == 99
    assert by_canon[10]["doc_id"] == 10 and by_canon[10]["cluster_size"] == 1


def test_keep_best_tie_breaks_to_smallest_id(spark):
    base = "one two three four five six seven eight"
    rows = [(5, base, 42), (7, base, 42)]
    out = D.dedup_keep_best(_docs(spark, rows), "doc_id", "text", "n_chars").collect()
    assert len(out) == 1 and out[0]["doc_id"] == 5


def test_cross_contamination_lsh_matches_direct_jaccard(spark):
    # recall contract: every cross-pair the plain blocked join finds at the
    # threshold must also be found via band collisions (and values match)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = docs.filter(F.col("doc_id") % 7 != 0)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    got = {
        (r["train_id"], r["bench_id"]): (r["n_common"], round(r["jaccard"], 9))
        for r in D.cross_contamination_lsh(
            train, bench, "doc_id", "text", 3, 0.5
        ).collect()
    }
    pairs = D.jaccard_near_dups(docs, "doc_id", "text", 3, 0.5).collect()
    want = {}
    for r in pairs:
        for t, b in ((r["a_id"], r["b_id"]), (r["b_id"], r["a_id"])):
            if t % 7 != 0 and b % 7 == 0:
                want[(t, b)] = (r["n_common"], round(r["jaccard"], 9))
    assert got == want and len(want) > 0


def test_dsir_weights_favor_target_like_documents(spark):
    # target = lang 'en'; an English-bigram doc must outweigh a disjoint one
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the cat sat on the mat", "en"),
        (3, "the cat sat on the mat", "raw"),  # same bigrams, not target
        (4, "zzq qxv vnm mlp plk lkj", "raw"),  # bigrams never in target
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    w = {
        r["doc_id"]: r
        for r in dsir_weights(
            df, "doc_id", "text", F.col("lang") == "en", n_buckets=256
        ).collect()
    }
    assert set(w) == {1, 2, 3, 4}
    # docs 1-3 share buckets: target mass counts only en occurrences
    assert w[3]["weight"] == w[1]["weight"]  # same bigrams -> same masses
    assert w[4]["t_mass"] == 0  # disjoint bigrams, no target hits (unless
    # a 256-bucket collision; the chosen strings don't collide)
    assert w[1]["weight"] > w[4]["weight"]


def test_dsir_excludes_sub_bigram_docs_and_is_deterministic(spark):
    rows = [
        (1, "only", "en"),  # 1 token -> no bigrams -> excluded
        (2, "two tokens here", "en"),
        (3, "two tokens here", "raw"),
        (4, "more filler words arrive", "raw"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    sel1 = dsir_resample(df, "doc_id", "text", F.col("lang") == "en", n=2)
    sel2 = dsir_resample(df, "doc_id", "text", F.col("lang") == "en", n=2)
    ids1 = sorted(r["doc_id"] for r in sel1.collect())
    ids2 = sorted(r["doc_id"] for r in sel2.collect())
    assert ids1 == ids2 and len(ids1) == 2 and 1 not in ids1
