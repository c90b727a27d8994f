"""Streaming IVF index maintenance (streaming/ivf_stream.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from thymeflow_back_spark.streaming.ivf_stream import (
    compact_ivf_index,
    current_ivf_topk,
    current_ivf_view,
    load_stream_centroids,
    process_ivf_batch,
    run_streaming_ivf,
)

pytestmark = pytest.mark.slow

CELLS = 4


def _vec(seed: int, d: int = 8) -> list[float]:
    # deterministic unit-ish vectors spread over a few directions
    return [((seed * (i + 3) * 2654435761) % 1000) / 1000.0 - 0.5 for i in range(d)]


def _rows(ids):
    return [(i, _vec(i)) for i in ids]


def _run(spark, base, batches):
    staging = os.path.join(base, "staging")
    index = os.path.join(base, "index")
    ckpt = os.path.join(base, "ckpt")
    schema = "vec_id long, embedding array<double>"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
        q = run_streaming_ivf(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging),
            index,
            ckpt,
            n_cells=CELLS,
        )
        q.awaitTermination()
    return index


def test_current_view_is_latest_version_per_id(spark, tmp_path):
    index = _run(
        spark,
        str(tmp_path),
        [
            _rows(range(0, 12)),
            _rows(range(12, 20)),
            [(3, [1.0] * 8), (15, [-1.0] * 8)],  # re-embeddings
        ],
    )
    view = {r.c_id: list(r.c_vec) for r in current_ivf_view(spark, index).collect()}
    assert len(view) == 20  # every id exactly once
    assert view[3] == [1.0] * 8 and view[15] == [-1.0] * 8
    assert view[4] == _vec(4)  # untouched ids keep their v0


def test_quantizer_freezes_on_first_batch(spark, tmp_path):
    base = str(tmp_path)
    index = _run(spark, base, [_rows(range(0, 12))])
    c0 = load_stream_centroids(spark, index)
    _run(spark, base, [_rows(range(12, 60))])  # many new vectors
    assert load_stream_centroids(spark, index) == c0


def test_search_sees_update_and_supersedes_stale_cell_entry(spark, tmp_path):
    index = _run(
        spark,
        str(tmp_path),
        [_rows(range(0, 16)), [(5, [1.0] * 8)], [(6, [1.0] * 8)]],
    )
    # 6's current vector is identical in direction to 5's current vector:
    # searching near [1,...,1] must put both at cosine 1.0
    queries = spark.createDataFrame(
        [(100, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    out = current_ivf_topk(
        spark, index, queries, "vec_id", "embedding", k=2, n_probe=CELLS
    ).collect()
    got = {(r.c_id, r.score) for r in out}
    assert got == {(5, 1.0), (6, 1.0)}
    # and no stale version of 5/6 ever surfaces (ranks are dense, k=2)
    assert sorted(r.rank for r in out) == [1, 2]


def test_replay_is_idempotent_and_within_batch_dup_raises(spark, tmp_path):
    base = str(tmp_path)
    index = _run(spark, base, [_rows(range(0, 12)), [(3, [1.0] * 8)]])
    before = sorted(
        (r.c_id, r.cell, tuple(r.c_vec))
        for r in current_ivf_view(spark, index).collect()
    )
    replay = spark.createDataFrame(
        [(3, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    process_ivf_batch(replay, 1, index_dir=index, n_cells=CELLS)
    after = sorted(
        (r.c_id, r.cell, tuple(r.c_vec))
        for r in current_ivf_view(spark, index).collect()
    )
    assert after == before
    dup = spark.createDataFrame(
        [(9, [1.0] * 8), (9, [0.5] * 8)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="more than once"):
        process_ivf_batch(dup, 2, index_dir=index, n_cells=CELLS)


def _view_rows(spark, index):
    return sorted(
        (r.c_id, r.cell, tuple(r.c_vec))
        for r in current_ivf_view(spark, index).collect()
    )


def _search_rows(spark, index, n=3):
    queries = spark.createDataFrame(
        [(100, [1.0] * 8), (101, [-0.5] * 8)],
        "vec_id long, embedding array<double>",
    )
    return sorted(
        (r.q_id, r.c_id, r.score, r.rank)
        for r in current_ivf_topk(
            spark, index, queries, "vec_id", "embedding", k=n, n_probe=2
        ).collect()
    )


def test_compaction_preserves_view_and_search(spark, tmp_path):
    index = _run(
        spark,
        str(tmp_path),
        [_rows(range(0, 16)), _rows(range(16, 24)), [(3, [1.0] * 8)]],
    )
    before_view = _view_rows(spark, index)
    before_search = _search_rows(spark, index)
    stats = compact_ivf_index(spark, index)
    assert stats["cells"] == 24  # one latest-version entry per id
    assert _view_rows(spark, index) == before_view
    assert _search_rows(spark, index) == before_search
    # folded batch partitions are gone; the committed base remains
    cells = os.path.join(index, "cells")
    names = set(os.listdir(cells))
    assert "base-2" in names
    assert not any(n.startswith("batch_id=") for n in names)
    assert os.path.exists(os.path.join(cells, "base-2", "_SUCCESS"))
    # idempotent: a second run folds nothing and changes nothing
    assert compact_ivf_index(spark, index)["cells"] == 0
    assert _view_rows(spark, index) == before_view


def test_post_compaction_live_batch_supersedes_base(spark, tmp_path):
    base = str(tmp_path)
    index = _run(spark, base, [_rows(range(0, 16))])
    compact_ivf_index(spark, index)
    # live batch after the fold: one update + one insert
    _run(spark, base, [[(5, [1.0] * 8), (40, [-1.0] * 8)]])
    view = {r.c_id: list(r.c_vec) for r in current_ivf_view(spark, index).collect()}
    assert len(view) == 17
    assert view[5] == [1.0] * 8 and view[40] == [-1.0] * 8
    assert view[4] == _vec(4)
    # a second compaction folds base + live tail into one generation
    stats = compact_ivf_index(spark, index)
    assert stats["cells"] == 17
    assert {r.c_id: list(r.c_vec) for r in current_ivf_view(spark, index).collect()} == view


def test_replay_after_compaction_noops_and_fresh_checkpoint_raises(spark, tmp_path):
    index = _run(spark, str(tmp_path), [_rows(range(0, 12)), [(3, [1.0] * 8)]])
    compact_ivf_index(spark, index)
    before = _view_rows(spark, index)
    # checkpoint replay of folded batch 1: all ids known -> no-op
    replay = spark.createDataFrame(
        [(3, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    process_ivf_batch(replay, 1, index_dir=index, n_cells=CELLS)
    assert _view_rows(spark, index) == before
    cells = os.path.join(index, "cells")
    assert not any(n.startswith("batch_id=") for n in os.listdir(cells))
    # fresh-checkpoint misuse: batch 0 of a NEW stream carries an unknown id
    fresh = spark.createDataFrame(
        [(99, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(RuntimeError, match="fresh checkpoint"):
        process_ivf_batch(fresh, 0, index_dir=index, n_cells=CELLS)


def test_compaction_crash_safety_sweeps_uncommitted_base(spark, tmp_path):
    import shutil

    index = _run(spark, str(tmp_path), [_rows(range(0, 12)), [(3, [1.0] * 8)]])
    before = _view_rows(spark, index)
    # simulate a crashed partial fold: base dir without _SUCCESS
    crashed = os.path.join(index, "cells", "base-1")
    os.makedirs(crashed)
    with open(os.path.join(crashed, "part-garbage.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    # readers ignore it (no _SUCCESS -> not committed)
    assert _view_rows(spark, index) == before
    stats = compact_ivf_index(spark, index)  # sweeps, then folds for real
    assert stats["cells"] == 12
    assert _view_rows(spark, index) == before
    shutil.rmtree(os.path.join(index, "cells", "base-1"), ignore_errors=True)


def test_search_read_path_prunes_base_partitions(spark, tmp_path):
    from thymeflow_back_spark.streaming.ivf_stream import current_ivf_entries

    index = _run(spark, str(tmp_path), [_rows(range(0, 16)), [(3, [1.0] * 8)]])
    compact_ivf_index(spark, index)
    df = current_ivf_entries(spark, index, cells=[0, 1])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]
