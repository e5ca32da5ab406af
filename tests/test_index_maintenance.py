"""The UNIFIED standing-index maintenance contract (round-12 task):
all four standing indexes — TextIndex, IVFIndex, ClusterIndex,
SemDedupIndex — expose ``compact()`` (fold upsert-accreted small
files, content-identical) and ``history()`` (DESCRIBE HISTORY,
metadata-only), and compaction is probe-INVARIANT: the index answers
identically before and after. Plus the round's deletion surface:
``IVFIndex.delete`` (topk excludes deleted vec_ids, replayed delete
epochs skip) and ``ClusterIndex.remove_docs`` (membership removal;
the docstring documents why true label retraction needs the pair
ledger)."""

import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.ann_index import IVFIndex
from batch_processing_on_aws_spark.operators.cluster_index import ClusterIndex
from batch_processing_on_aws_spark.operators.semdedup_index import SemDedupIndex
from batch_processing_on_aws_spark.operators.text_index import TextIndex


def _vectors(spark, n=80, dim=8, start_id=0):
    rows = []
    for i in range(n):
        blob = 10.0 if i % 2 else 1.0
        vec = [blob + ((i * 7 + j * 13) % 17) / 17.0 for j in range(dim)]
        rows.append((start_id + i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _docs(spark, n=40, start_id=0):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (
            start_id + i,
            " ".join(words[(i + j) % len(words)] for j in range(5 + i % 4)),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------- compaction


def test_ivf_compact_probe_invariant(spark, tmp_path):
    idx = IVFIndex(str(tmp_path / "ivf"), n_cells=4, n_train=32, n_buckets=4)
    full = _vectors(spark, n=80)
    idx.build(full.where(F.col("vec_id") < 40))
    idx.add(full.where(F.col("vec_id") >= 40))
    queries = full.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = _collect_sorted(idx.topk(spark, queries, n_probe=3, k=5))
    v = idx.compact(spark)
    assert v is not None  # two upsert commits accreted foldable files
    assert _collect_sorted(idx.topk(spark, queries, n_probe=3, k=5)) == before
    ops = [h["operation"] for h in idx.history()]
    assert "compact" in ops


def test_cluster_compact_label_invariant(spark, tmp_path):
    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    pairs1 = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_id_a long, doc_id_b long"
    )
    pairs2 = spark.createDataFrame(
        [(3, 10), (20, 21)], "doc_id_a long, doc_id_b long"
    )
    idx.apply(pairs1, txn={"app": "m", "epoch": 0})
    idx.apply(pairs2, txn={"app": "m", "epoch": 1})
    before = _collect_sorted(idx.labels(spark))
    assert idx.compact(spark) is not None
    assert _collect_sorted(idx.labels(spark)) == before
    assert "compact" in [h["operation"] for h in idx.history()]


def test_semdedup_compact_audit_invariant(spark, tmp_path):
    idx = SemDedupIndex(
        str(tmp_path / "sdx"), n_cells=2, tau=0.95, n_train=16, n_buckets=4
    )
    full = _vectors(spark, n=60)
    idx.build(full.where(F.col("vec_id") < 30))
    idx.add(full.where(F.col("vec_id") >= 30))
    before = _collect_sorted(idx.audit(spark))
    assert idx.compact(spark) is not None
    assert _collect_sorted(idx.audit(spark)) == before
    assert "compact" in [h["operation"] for h in idx.history()]


def test_text_compact_search_invariant(spark, tmp_path):
    idx = TextIndex(str(tmp_path / "tix"), n_buckets=4)
    idx.build(_docs(spark, n=30))
    idx.add(_docs(spark, n=20, start_id=100))
    q = ["alpha", "gamma"]
    before = _collect_sorted(idx.search(spark, q, top_k=8))
    out = idx.compact(spark)
    assert out["postings"] is not None
    assert _collect_sorted(idx.search(spark, q, top_k=8)) == before
    hist = idx.history()
    assert "compact" in [h["operation"] for h in hist["postings"]]


# ---------------------------------------------------------------- deletion


def test_ivf_delete_excludes_from_topk(spark, tmp_path):
    idx = IVFIndex(str(tmp_path / "ivfd"), n_cells=4, n_train=32, n_buckets=4)
    full = _vectors(spark, n=80)
    idx.build(full.where(F.col("vec_id") < 40))
    idx.add(full.where(F.col("vec_id") >= 40))
    queries = full.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hit_pre = {
        r["vec_id"]
        for r in idx.topk(spark, queries, n_probe=4, k=10).collect()
    }
    gone = full.where(F.col("vec_id") % 5 == 1).select("vec_id")
    assert hit_pre & {r["vec_id"] for r in gone.collect()}, "fixture weak"
    idx.delete(gone, txn={"app": "del", "epoch": 0})
    hits = {
        r["vec_id"]
        for r in idx.topk(spark, queries, n_probe=4, k=10).collect()
    }
    assert not hits & {r["vec_id"] for r in gone.collect()}
    assert idx.table.read(spark).where(
        F.col("vec_id") % 5 == 1
    ).count() == 0


def test_ivf_delete_time_travel_and_replay(spark, tmp_path):
    idx = IVFIndex(str(tmp_path / "ivft"), n_cells=2, n_train=16, n_buckets=4)
    idx.build(_vectors(spark, n=40))
    v_before = idx.table.latest_version()
    gone = spark.createDataFrame([(4,), (9,)], "vec_id long")
    idx.delete(gone, txn={"app": "del", "epoch": 0})
    # prior version still reads the deleted rows (rollback path)
    assert (
        idx.table.read(spark, version=v_before)
        .where(F.col("vec_id").isin(4, 9))
        .count()
        == 2
    )
    # replayed delete epoch is detectable (the stream wrapper skips)
    assert idx.table.txn_applied("del", 0)
    ops = [h["operation"] for h in idx.history()]
    assert "delete_keys" in ops


def test_cluster_remove_docs_membership(spark, tmp_path):
    idx = ClusterIndex(str(tmp_path / "crm"), n_buckets=4)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_id_a long, doc_id_b long"
    )
    idx.apply(pairs, txn={"app": "r", "epoch": 0})
    idx.remove_docs(
        spark.createDataFrame([(2,)], "doc_id long"),
        txn={"app": "rm", "epoch": 0},
    )
    ids = {r["doc_id"] for r in idx.labels(spark).collect()}
    assert ids == {1, 3}
    # remaining members keep the conservative over-grouping (doc 3
    # stays labeled with the min-id root even though the bridge left)
    labs = {
        r["doc_id"]: r["cluster_id"] for r in idx.labels(spark).collect()
    }
    assert labs[3] == labs[1]
    assert idx.table.txn_applied("rm", 0)
