"""Randomized cross-checks of the eval/binning operators against pure-Python
replicas (seeded datasets — a handful of Spark jobs, not per-example runs)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from thymeflow_back_spark.operators.binning import balanced_bin_summary
from thymeflow_back_spark.operators.evalcurves import pr_curve, roc_auc


def _dataset(seed: int, n: int = 400):
    rng = random.Random(seed)
    # small score domain forces heavy ties — the hard case for both curves
    return [(i, rng.randrange(0, 25), rng.random() < 0.3) for i in range(n)]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_roc_auc_random_vs_pair_counting(spark, seed):
    rows = _dataset(seed)
    df = spark.createDataFrame(rows, "id bigint, score bigint, is_pos boolean")
    r = roc_auc(df, "score", F.col("is_pos")).collect()[0]
    pos = [s for _, s, p in rows if p]
    neg = [s for _, s, p in rows if not p]
    u2 = sum(2 if p > q else (1 if p == q else 0) for p in pos for q in neg)
    assert (r["n"], r["n_pos"], r["n_neg"]) == (len(rows), len(pos), len(neg))
    assert r["u2"] == u2
    assert r["auc"] == u2 / (2.0 * len(pos) * len(neg))


@pytest.mark.parametrize("seed", [4, 5])
def test_pr_curve_random_vs_bruteforce(spark, seed):
    rows = _dataset(seed)
    df = spark.createDataFrame(rows, "id bigint, score bigint, is_pos boolean")
    got = {r["score"]: r for r in pr_curve(df, "score", F.col("is_pos")).collect()}
    total_pos = sum(1 for _, _, p in rows if p)
    for s in {sc for _, sc, _ in rows}:
        kept = [(sc, p) for _, sc, p in rows if sc >= s]
        cum_pos = sum(1 for _, p in kept if p)
        r = got[s]
        assert (r["cum_n"], r["cum_pos"]) == (len(kept), cum_pos)
        assert r["prec"] == cum_pos / len(kept)
        assert r["recall"] == cum_pos / total_pos
    assert len(got) == len({sc for _, sc, _ in rows})


@pytest.mark.parametrize("seed,k", [(6, 3), (7, 8)])
def test_balanced_bins_random_replica_and_bound(spark, seed, k):
    rng = random.Random(seed)
    rows = [(i, rng.randrange(1, 10_000)) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, w bigint")
    got = {r["bin"]: r for r in balanced_bin_summary(df, "id", "w", k).collect()}
    # replica: round-robin over (w desc, id asc)
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    want = {b: [w for i, (_, w) in enumerate(order) if i % k == b] for b in range(k)}
    for b in range(k):
        assert got[b]["n_rows"] == len(want[b])
        assert got[b]["total_weight"] == sum(want[b])
        assert got[b]["max_weight"] == max(want[b])
    # LPT round-robin bound: adjacent ranks differ by at most one item's
    # weight per round, so bin spread <= max weight
    totals = [got[b]["total_weight"] for b in range(k)]
    assert max(totals) - min(totals) <= max(w for _, w in rows)


@pytest.mark.parametrize("seed", [0, 3])
def test_grouped_score_tertiles_vs_bruteforce(spark, seed):
    """Tertile membership must equal the brute-force per-group rank
    thirds (descending score, id tie-break) for every group size 1..9,
    including the exact ceil boundaries."""
    from thymeflow_back_spark.operators.evalcurves import grouped_score_tertiles

    rng = random.Random(seed)
    rows = []
    i = 0
    for g in range(9):
        for _ in range(g + 1):  # group sizes 1..9
            rows.append((i, f"g{g}", rng.randrange(-50, 50)))
            i += 1
    df = spark.createDataFrame(rows, "rid long, grp string, score long").repartition(5)
    got = {
        r.rid: r.bucket
        for r in grouped_score_tertiles(df, "grp", "score", "rid").collect()
    }
    by_grp: dict[str, list[tuple[int, int]]] = {}
    for rid, grp, score in rows:
        by_grp.setdefault(grp, []).append((-score, rid))
    want = {}
    for grp, members in by_grp.items():
        members.sort()
        n = len(members)
        for rn, (_, rid) in enumerate(members, start=1):
            if rn <= (n + 2) // 3:
                want[rid] = "head"
            elif rn <= (2 * n + 2) // 3:
                want[rid] = "middle"
            else:
                want[rid] = "tail"
    assert got == want
