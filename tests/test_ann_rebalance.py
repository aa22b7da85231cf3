"""Streaming-IVF cell-skew watch + offline rebalance (VERDICT r19 #1).

The drain freezes its coarse quantizer at batch 0
(operators/streaming_queries.py s_incremental_ann_ivf); a drifting
stream then concentrates appends into few cell= partitions, degrading
append parallelism and probe pruning.  These tests build exactly that
pathology with the drain's own training/assignment helpers, show
ann_store_stats detecting it, and show rebalance_ann_store restoring
balance without changing the store's logical contents: every row ends
in its argmax cell under the re-trained quantizer, the (vec_id,
embedding) set is preserved, and an all-cells probe through the real
read path equals a numpy exhaustive search.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_spark_streaming_spark.fencing import (
    StaleWriterError,
    WriterFence,
)
from kafka_spark_streaming_spark.operators.store_maintenance import (
    _data_files,
    _leaf_dirs,
    ann_store_stats,
    rebalance_ann_store,
)
from kafka_spark_streaming_spark.operators.similarity import (
    _IVF_CELLS,
    _IVF_DIM,
    ivf_assign_arrow,
    ivf_init_centroids,
    lloyd_refine,
)

N_BATCH0 = 64
N_DRIFT = 500


def _emb_batch0(i: int) -> list[float]:
    """16 well-separated directions (one-hot dims 0..15) + a tiny
    distinctness component that cannot change any argmax."""
    v = np.zeros(_IVF_DIM, dtype=np.float32)
    v[i % _IVF_CELLS] = 1.0
    v[16] = 0.01 * (i / N_BATCH0)
    return [float(x) for x in v]


def _emb_drift(i: int) -> list[float]:
    """The drifted regime: a single tight cluster on a direction no
    batch-0 centroid points at — the frozen quantizer funnels ALL of
    it into whichever cell ties best."""
    v = np.zeros(_IVF_DIM, dtype=np.float32)
    v[32] = 1.0
    v[33] = 0.001 * (i - 100)
    return [float(x) for x in v]


def _build_skewed_store(spark, store_dir: str) -> np.ndarray:
    """Replay the drain's exact lifecycle by hand: batch 0 trains and
    freezes the quantizer (strided init + one Lloyd step), every batch
    appends its Arrow-matmul assignment one-file-per-touched-cell.
    Batches 1..5 are pure drift.  Returns the frozen centroid matrix."""
    b0 = spark.createDataFrame(
        [(i, _emb_batch0(i)) for i in range(N_BATCH0)],
        "vec_id long, embedding array<float>",
    )
    stride = max(N_BATCH0 // _IVF_CELLS, 1)
    init = (
        b0.filter(
            (F.col("vec_id") % stride == 0)
            & (F.col("vec_id") < stride * _IVF_CELLS)
        )
        .orderBy("vec_id")
        .collect()
    )
    cmat = ivf_init_centroids(init)
    cmat2 = lloyd_refine(ivf_assign_arrow(b0, cmat), cmat)
    with open(store_dir.rstrip("/") + ".centroids.json", "w") as fh:
        json.dump([[float(x) for x in row] for row in cmat2], fh)

    def append(df):
        (
            ivf_assign_arrow(df, cmat2)
            .repartition("cell")
            .write.mode("append")
            .partitionBy("cell")
            .parquet(store_dir)
        )

    append(b0)
    for b in range(5):
        ids = range(100 + b * 100, 100 + (b + 1) * 100)
        append(
            spark.createDataFrame(
                [(i, _emb_drift(i)) for i in ids],
                "vec_id long, embedding array<float>",
            )
        )
    return cmat2


def _store_rows(spark, store_dir: str) -> dict[int, tuple]:
    return {
        int(r.vec_id): (
            tuple(round(float(x), 6) for x in r.embedding),
            int(r.cell),
        )
        for r in spark.read.parquet(store_dir)
        .dropDuplicates(["vec_id"])
        .collect()
    }


def test_skew_watch_detects_drift_and_rebalance_restores(spark, tmp_path):
    store = str(tmp_path / "store")
    _build_skewed_store(spark, store)

    # --- the watch: the histogram names the pathology -------------------
    stats = ann_store_stats(spark, store)
    assert stats["rows"] == N_BATCH0 + N_DRIFT
    assert stats["n_cells"] == _IVF_CELLS
    # 500 of 564 rows share one frozen cell: max/mean far above healthy
    assert stats["skew"] >= 3.0, stats
    hot = max(stats["rows_per_cell"].values())
    assert hot >= N_DRIFT, (
        "precondition: the drift regime must funnel into one cell "
        f"(rows_per_cell={stats['rows_per_cell']})"
    )

    before = _store_rows(spark, store)

    # --- the response: offline re-train + re-partition ------------------
    out = rebalance_ann_store(spark, store)
    assert out["rewrote"]
    assert out["rows"] == N_BATCH0 + N_DRIFT
    assert out["skew_after"] < out["skew_before"]
    assert out["skew_after"] <= 2.0, out
    assert out["occupied_after"] >= out["occupied_before"]
    # one rewrite job -> one file per occupied leaf (compaction too)
    leaves = _leaf_dirs(store, "cell=*")
    assert all(len(_data_files(leaf)) == 1 for leaf in leaves)

    # --- invariant 1: logical contents preserved exactly ----------------
    after = _store_rows(spark, store)
    assert set(after) == set(before)
    assert all(after[k][0] == before[k][0] for k in before)

    # --- invariant 2: every row sits in its argmax cell under the new
    # quantizer (the property probe pruning is correct BY) --------------
    with open(store + ".centroids.json") as fh:
        new_cmat = np.array(json.load(fh), dtype=np.float64)
    assert new_cmat.shape == (_IVF_CELLS, _IVF_DIM)
    sdf = spark.read.parquet(store).dropDuplicates(["vec_id"])
    reassigned = {
        int(r.vec_id): int(r.cell)
        for r in ivf_assign_arrow(
            sdf.select("vec_id", "embedding"), new_cmat
        ).collect()
    }
    assert all(after[k][1] == reassigned[k] for k in after)

    # --- invariant 3: the read path over the rebalanced store equals an
    # exhaustive numpy search when every cell is probed (partition-
    # layout-independent ground truth) -----------------------------------
    ids = sorted(after)
    mat = np.array([after[i][0] for i in ids], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in (100, 0, 550):
        q = mat_n[ids.index(qid)]
        sims = mat_n @ q
        order = [
            ids[j]
            for j in np.argsort(-sims, kind="stable")
            if ids[j] != qid
        ][:3]
        got = (
            spark.read.parquet(store)
            .filter(F.col("cell").isin(list(range(_IVF_CELLS))))
            .dropDuplicates(["vec_id"])
            .filter(F.col("vec_id") != qid)
            .collect()
        )
        emb_q = np.array(after[qid][0], dtype=np.float64)
        emb_q /= np.linalg.norm(emb_q)
        scored = sorted(
            (
                -float(
                    np.dot(
                        np.array(r.embedding, dtype=np.float64)
                        / np.linalg.norm(
                            np.array(r.embedding, dtype=np.float64)
                        ),
                        emb_q,
                    )
                ),
                int(r.vec_id),
            )
            for r in got
        )
        assert [v for _, v in scored[:3]] == order, f"query {qid}"


def test_rebalance_refuses_live_writer_and_converges(spark, tmp_path):
    """Standalone rebalance refuses a live drain's token (same
    contract as compaction); a second pass on an already-balanced
    store preserves the logical contents (cell LABELS may permute —
    the quantizer is re-derived and label identity is not part of the
    store contract; the assignment invariant is) and never worsens
    balance."""
    store = str(tmp_path / "store")
    _build_skewed_store(spark, store)

    fence = WriterFence.acquire(store + ".epoch", purpose="drain")
    with pytest.raises(StaleWriterError, match="live writer"):
        rebalance_ann_store(spark, store)
    fence.idle()

    first = rebalance_ann_store(spark, store)
    rows_first = _store_rows(spark, store)
    second = rebalance_ann_store(spark, store)
    assert second["rows"] == first["rows"]
    rows_second = _store_rows(spark, store)
    assert set(rows_second) == set(rows_first)
    assert all(
        rows_second[k][0] == rows_first[k][0] for k in rows_first
    ), "a re-run must never change the store's logical contents"
    assert second["skew_after"] <= first["skew_after"] + 0.5
    # and the assignment invariant holds under the latest sidecar
    with open(store + ".centroids.json") as fh:
        cmat = np.array(json.load(fh), dtype=np.float64)
    sdf = spark.read.parquet(store).dropDuplicates(["vec_id"])
    reassigned = {
        int(r.vec_id): int(r.cell)
        for r in ivf_assign_arrow(
            sdf.select("vec_id", "embedding"), cmat
        ).collect()
    }
    assert all(rows_second[k][1] == reassigned[k] for k in rows_second)


def test_rebalance_requires_centroid_sidecar(spark, tmp_path):
    store = str(tmp_path / "not_a_store")
    os.makedirs(store)
    with pytest.raises(ValueError, match="centroid sidecar"):
        rebalance_ann_store(spark, store)


def test_pinned_export_dedup_cols_collapses_relocated_rows(
    spark, tmp_path
):
    """code-review r20: full-row dedup cannot collapse a row the
    rebalance crash window left in TWO cells (the copies differ in the
    partition column); dedup_cols=['vec_id'] — the store's logical
    key — collapses them for out-of-band exports."""
    import gc

    from kafka_spark_streaming_spark.operators.store_maintenance import (
        pinned_store_read,
    )

    store = str(tmp_path / "store")
    cmat = _build_skewed_store(spark, store)
    assert cmat is not None
    # simulate the rebalance crash window: one vector re-appended in a
    # DIFFERENT cell, originals not yet deleted
    moved = spark.createDataFrame(
        [(0, _emb_batch0(0), 15)],
        "vec_id long, embedding array<float>, cell int",
    )
    moved.write.mode("append").partitionBy("cell").parquet(store)

    fullrow = pinned_store_read(spark, store)
    n_full = fullrow.filter(F.col("vec_id") == 0).count()
    assert n_full == 2, "precondition: full-row dedup keeps both cells"
    del fullrow
    gc.collect()

    keyed = pinned_store_read(spark, store, dedup_cols=["vec_id"])
    assert keyed.filter(F.col("vec_id") == 0).count() == 1
    assert keyed.count() == N_BATCH0 + N_DRIFT
    del keyed
    gc.collect()
