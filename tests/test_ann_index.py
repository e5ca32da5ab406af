"""Incrementally-maintained IVF index (operators/ann_index.py +
streaming/incremental.py::ingest_ivf_index_stream): the FAISS
train-once/add-many lifecycle — frozen-quantizer incremental adds,
PSI drift gate, explicit retrain, versioned time travel, and the
stream wrapper's replay idempotency."""

import os

import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.ann_index import (
    IVFIndex,
    _psi_micro,
)
from batch_processing_on_aws_spark.operators.similarity import (
    _assign_cells,
    _train_centroids,
)


def _vectors(spark, n=120, dim=8, offset=0.0, start_id=0):
    """Deterministic synthetic embeddings: two well-separated blobs so
    k-means has real structure; ``offset`` shifts the whole cloud (the
    drift scenario)."""
    rows = []
    for i in range(n):
        blob = 10.0 if i % 2 else 0.0
        vec = [
            blob + offset + ((i * 7 + j * 13) % 17) / 17.0
            for j in range(dim)
        ]
        rows.append((start_id + i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def index_root(tmp_path):
    return str(tmp_path / "ivf_index")


def test_incremental_add_equals_one_shot_assignment(spark, index_root):
    """The load-bearing identity: build(d1) + add(d2) == one-shot
    assignment of d1 ∪ d2 under the SAME frozen quantizer."""
    full = _vectors(spark, n=120)
    d1 = full.where(F.col("vec_id") < 60)
    d2 = full.where(F.col("vec_id") >= 60)
    idx = IVFIndex(index_root, n_cells=4, n_train=64)
    idx.build(d1)
    out = idx.add(d2)
    assert out["version"] == 2 and out["n"] == 60

    centers, _ = idx._load_model(spark)
    expected = {
        (r["vec_id"], r["cell"])
        for r in _assign_cells(
            full.select("vec_id", F.col("embedding").alias("c_vec")), centers
        ).collect()
    }
    got = {
        (r["vec_id"], r["cell"])
        for r in idx.table.read(spark).select("vec_id", "cell").collect()
    }
    assert got == expected and len(got) == 120


def test_add_is_upsert_not_append(spark, index_root):
    d1 = _vectors(spark, n=60)
    idx = IVFIndex(index_root, n_cells=4, n_train=64)
    idx.build(d1)
    idx.add(d1)  # re-delivery of the same ids
    assert idx.table.read(spark).count() == 60


def test_topk_matches_probe_of_standing_assignments(spark, index_root):
    full = _vectors(spark, n=120)
    idx = IVFIndex(index_root, n_cells=4, n_train=64)
    idx.build(full.where(F.col("vec_id") < 60))
    idx.add(full.where(F.col("vec_id") >= 60))
    queries = full.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = idx.topk(spark, queries, n_probe=4, k=5).collect()
    assert len(got) == 15  # 3 queries x k
    for r in got:
        assert r["vec_id"] != r["query_id"] and 1 <= r["rank"] <= 5


def test_drift_gate_flags_shifted_batch(spark, index_root):
    idx = IVFIndex(index_root, n_cells=4, n_train=64)
    idx.build(_vectors(spark, n=60))
    same = idx.add(_vectors(spark, n=60, start_id=1000))
    assert not same["needs_retrain"]  # same distribution: low PSI
    shifted = idx.add(_vectors(spark, n=60, offset=100.0, start_id=2000))
    assert shifted["psi_micro"] > same["psi_micro"]
    assert shifted["needs_retrain"]
    hist = {
        r["version"]: r["needs_retrain"]
        for r in idx.drift_history(spark).collect()
    }
    assert hist == {2: False, 3: True}


def test_refresh_retrains_and_keeps_old_version_readable(spark, index_root):
    idx = IVFIndex(index_root, n_cells=4, n_train=64)
    idx.build(_vectors(spark, n=60))
    idx.add(_vectors(spark, n=60, offset=100.0, start_id=2000))
    import numpy as np

    before, _ = idx._load_model(spark)
    out = idx.refresh(spark)
    after, _ = idx._load_model(spark)
    assert out["version"] == 3 and out["n"] == 120
    assert not np.allclose(before, after)  # quantizer actually moved
    # retrained centroids match the shared trainer run on the table
    expected = _train_centroids(
        idx.table.read(spark).select("vec_id", "c_vec"),
        n_cells=4, seed=42, max_iter=8, n_train=64,
    )
    assert np.allclose(after, expected)
    # time travel: the pre-refresh index state stays readable
    assert idx.table.read(spark, version=2).count() == 120


def test_psi_micro_convention():
    assert _psi_micro([10, 10, 10, 10], [10, 10, 10, 10]) == 0
    # mass concentrating into one cell is a big positive PSI
    assert _psi_micro([10, 10, 10, 10], [40, 0, 0, 0]) > 250_000
    # symmetric in magnitude ordering: more skew, more PSI
    assert _psi_micro([10, 10, 10, 10], [20, 10, 5, 5]) < _psi_micro(
        [10, 10, 10, 10], [40, 0, 0, 0]
    )


def test_stream_replay_is_idempotent(spark, tmp_path):
    """The wrapper's exactly-once contract: draining the same input
    twice (same checkpoint) mints no new version; a genuinely new
    delivery does."""
    from batch_processing_on_aws_spark.streaming.incremental import (
        ingest_ivf_index_stream,
    )

    root = str(tmp_path / "ivf_stream")
    inp, index_root, ckpt = (
        os.path.join(root, d) for d in ("in", "index", "ckpt")
    )
    full = _vectors(spark, n=120)
    schema = full.schema
    full.where(F.col("vec_id") < 60).coalesce(1).write.mode("append").parquet(inp)
    ingest_ivf_index_stream(
        spark, inp, schema, index_root, ckpt, n_cells=4, n_train=64
    )
    idx = IVFIndex(index_root, n_cells=4, n_train=64)
    assert idx.table.latest_version() == 1
    # drain again with nothing new: no-op
    ingest_ivf_index_stream(
        spark, inp, schema, index_root, ckpt, n_cells=4, n_train=64
    )
    assert idx.table.latest_version() == 1
    # second delivery: one upsert version, assignments complete
    full.where(F.col("vec_id") >= 60).coalesce(1).write.mode("append").parquet(inp)
    ingest_ivf_index_stream(
        spark, inp, schema, index_root, ckpt, n_cells=4, n_train=64
    )
    assert idx.table.latest_version() == 2
    assert idx.table.read(spark).count() == 120
