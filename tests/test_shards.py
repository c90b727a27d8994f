"""Training-shard export (sources/shards.py): asserted on-disk layout —
one file per bin directory, deterministic intra-file row order — plus
write-once reuse and agreement with the balanced_bins operator."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from thymeflow_back_spark.operators.binning import balanced_bins
from thymeflow_back_spark.sources.shards import (
    ensure_training_shards,
    shard_path,
    write_training_shards,
)
from thymeflow_back_spark.tables import load

SF = "/root/testdata/sf0.001"
K = 4


def _data_files(d: str) -> list[str]:
    return [f for f in os.listdir(d) if f.endswith(".parquet")]


def test_layout_one_file_per_bin_in_seq_order(spark, tmp_path):
    docs = load(spark, SF, "documents")
    toks = F.size(F.expr("filter(split(text, ' '), t -> t != '')")).cast("bigint")
    path = str(tmp_path / "shards")
    write_training_shards(
        docs.withColumn("n_tok", toks), path, "doc_id", "n_tok", K, carry=("lang",)
    )
    dirs = sorted(d for d in os.listdir(path) if d.startswith("bin="))
    assert dirs == [f"bin={i}" for i in range(K)]
    n_total = 0
    for d in dirs:
        files = _data_files(os.path.join(path, d))
        assert len(files) == 1, (d, files)
        tbl = pq.read_table(os.path.join(path, d, files[0]))
        seqs = tbl.column("seq").to_pylist()
        # physical row order IS the LPT order: seq is exactly 1..n
        assert seqs == list(range(1, len(seqs) + 1))
        weights = tbl.column("weight").to_pylist()
        assert weights == sorted(weights, reverse=True)
        n_total += len(seqs)
    assert n_total == docs.count()


def test_shards_match_balanced_bins_operator(spark, tmp_path):
    docs = load(spark, SF, "documents").select(
        "doc_id", F.col("n_chars").alias("w")
    )
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", "w", K)
    got = {
        (r["doc_id"], r["bin"])
        for r in spark.read.parquet(path).select("doc_id", "bin").collect()
    }
    want = {
        (r["doc_id"], r["bin"])
        for r in balanced_bins(docs, "doc_id", "w", K).collect()
    }
    assert got == want


def test_ensure_is_write_once(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DERIVED_DIR", str(tmp_path))
    w = F.lit(1).cast("bigint")
    first = ensure_training_shards(spark, SF, "documents", "doc_id", w, K)
    path = shard_path(SF, "documents", K, weight_col=w)
    marker = os.path.join(path, "_SUCCESS")
    mtime = os.path.getmtime(marker)
    again = ensure_training_shards(spark, SF, "documents", "doc_id", w, K)
    assert os.path.getmtime(marker) == mtime
    assert first.count() == again.count() == load(spark, SF, "documents").count()


def test_layout_identity_includes_weight_and_carry(spark, tmp_path, monkeypatch):
    """Two ensure calls that differ only in weight expression (or carry)
    must NOT share a materialized layout."""
    monkeypatch.setenv("SPARK_GRAFT_DERIVED_DIR", str(tmp_path))
    by_chars = ensure_training_shards(spark, SF, "documents", "doc_id", "n_chars", K)
    by_const = ensure_training_shards(
        spark, SF, "documents", "doc_id", F.lit(1).cast("bigint"), K
    )
    assert shard_path(SF, "documents", K, weight_col="n_chars") != shard_path(
        SF, "documents", K, weight_col=F.lit(1).cast("bigint")
    )
    # the two layouts really are different materializations, not a reuse
    chars_w = {r["weight"] for r in by_chars.select("weight").distinct().collect()}
    const_w = {r["weight"] for r in by_const.select("weight").distinct().collect()}
    assert const_w == {1} and chars_w != {1}
    with_carry = shard_path(SF, "documents", K, weight_col="n_chars", carry=("lang",))
    assert with_carry != shard_path(SF, "documents", K, weight_col="n_chars")


def test_written_layout_invariant_under_shuffle_partitions(spark, tmp_path):
    """The exported shard files must be byte-stable across shuffle layouts:
    same bin membership, same seq, same intra-file row order."""
    docs = load(spark, SF, "documents").select(
        "doc_id", F.col("n_chars").alias("w")
    )
    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    contents = []
    try:
        for parts, sub in ((5, "a"), (47, "b")):
            spark.conf.set(key, str(parts))
            path = str(tmp_path / sub)
            write_training_shards(docs, path, "doc_id", "w", K)
            per_bin = {}
            for d in sorted(os.listdir(path)):
                if d.startswith("bin="):
                    [f] = _data_files(os.path.join(path, d))
                    tbl = pq.read_table(os.path.join(path, d, f))
                    per_bin[d] = list(
                        zip(tbl.column("doc_id").to_pylist(),
                            tbl.column("seq").to_pylist())
                    )
            contents.append(per_bin)
    finally:
        spark.conf.set(key, orig)
    assert contents[0] == contents[1]


def test_shuffled_order_is_deterministic_hash_order(spark, tmp_path):
    import hashlib

    docs = load(spark, SF, "documents").select(
        "doc_id", F.col("n_chars").alias("w")
    )
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", "w", K, order="shuffled")
    n_total = 0
    for i in range(K):
        d = os.path.join(path, f"bin={i}")
        [f] = _data_files(d)
        tbl = pq.read_table(os.path.join(d, f))
        ids = tbl.column("doc_id").to_pylist()
        seqs = tbl.column("seq").to_pylist()
        assert seqs == list(range(1, len(ids) + 1))
        # physical order == ascending md5('shard:'||id) within the bin
        want = sorted(ids, key=lambda i: (hashlib.md5(f"shard:{i}".encode()).hexdigest(), i))
        assert ids == want
        # NOT length-sorted (the point of the shuffled order)
        ws = tbl.column("weight").to_pylist()
        assert ws != sorted(ws, reverse=True)
        n_total += len(ids)
    assert n_total == docs.count()
    # membership is unchanged by the order choice
    want_bins = {
        (r["doc_id"], r["bin"])
        for r in balanced_bins(docs, "doc_id", "w", K).collect()
    }
    got_bins = {
        (r["doc_id"], r["bin"])
        for r in spark.read.parquet(path).select("doc_id", "bin").collect()
    }
    assert got_bins == want_bins
