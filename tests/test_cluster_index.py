"""Incrementally-maintained duplicate clusters
(operators/cluster_index.py): contraction onto existing labels,
min-label confluence across delivery orders, cross-delivery chain
merges, replay idempotency, and the singleton-coalescing view."""

import itertools

import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.cluster_index import ClusterIndex
from batch_processing_on_aws_spark.operators.clustering import dup_clusters


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_id_a long, doc_id_b long")


def _labels(idx, spark):
    return {
        (r["doc_id"], r["cluster_id"])
        for r in idx.labels(spark).collect()
    }


def _oneshot(spark, rows):
    return {
        (r["doc_id"], r["cluster_id"])
        for r in dup_clusters(_pairs(spark, rows)).collect()
    }


EDGES = [
    (1, 2), (2, 3),          # chain 1-2-3
    (10, 11),                # pair
    (20, 21), (21, 22), (22, 23),  # chain 20..23
    (3, 10),                 # bridges chain1 and the 10-11 pair
]


def test_any_delivery_order_matches_oneshot(spark, tmp_path):
    """Confluence: folding the edge set in thirds, in several
    permutations, always lands in the one-shot CC fixpoint."""
    want = _oneshot(spark, EDGES)
    thirds = [EDGES[:2], EDGES[2:4], EDGES[4:]]
    for i, perm in enumerate(itertools.permutations(range(3))):
        idx = ClusterIndex(str(tmp_path / f"cidx_{i}"), n_buckets=4)
        for j, p in enumerate(perm):
            idx.apply(_pairs(spark, thirds[p]), txn={"app": "t", "epoch": j})
        assert _labels(idx, spark) == want, f"order {perm}"


def test_cross_delivery_merge_relabels_members(spark, tmp_path):
    """Two established clusters merge when a later delivery bridges
    them: every member of the absorbed cluster is relabeled, not
    just its root."""
    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    idx.apply(_pairs(spark, [(5, 6), (6, 7)]))      # cluster 5
    idx.apply(_pairs(spark, [(1, 2), (2, 3)]))      # cluster 1
    assert _labels(idx, spark) == {
        (5, 5), (6, 5), (7, 5), (1, 1), (2, 1), (3, 1),
    }
    out = idx.apply(_pairs(spark, [(7, 3)]))        # bridge
    assert out["relabeled_nodes"] >= 1
    assert _labels(idx, spark) == {
        (5, 1), (6, 1), (7, 1), (1, 1), (2, 1), (3, 1),
    }


def test_internal_pairs_are_noop(spark, tmp_path):
    """A delivery whose pairs are all internal to existing clusters
    changes nothing (and still commits the txn stamp)."""
    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    idx.apply(_pairs(spark, [(1, 2), (2, 3)]), txn={"app": "t", "epoch": 0})
    before = _labels(idx, spark)
    out = idx.apply(_pairs(spark, [(1, 3), (2, 1)]), txn={"app": "t", "epoch": 1})
    assert out["relabeled_nodes"] == 0
    assert _labels(idx, spark) == before
    assert idx.table.txn_applied("t", 1)


def test_replayed_epoch_skips(spark, tmp_path):
    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    idx.apply(_pairs(spark, [(1, 2)]), txn={"app": "t", "epoch": 0})
    idx.apply(_pairs(spark, [(2, 3)]), txn={"app": "t", "epoch": 1})
    snap = _labels(idx, spark)
    v = idx.table.latest_version()
    out = idx.apply(_pairs(spark, [(2, 3)]), txn={"app": "t", "epoch": 1})
    assert out.get("replayed") is True
    assert idx.table.latest_version() == v
    assert _labels(idx, spark) == snap


def test_labels_for_coalesces_singletons(spark, tmp_path):
    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    idx.apply(_pairs(spark, [(1, 2)]))
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "lonely")], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in idx.labels_for(docs).collect()
    }
    assert got == {(1, 1), (2, 1), (9, 9)}


def test_time_travel_pins_pre_merge_state(spark, tmp_path):
    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    idx.apply(_pairs(spark, [(1, 2)]))
    v1 = idx.table.latest_version()
    idx.apply(_pairs(spark, [(2, 3)]))
    assert {
        (r["doc_id"], r["cluster_id"])
        for r in idx.labels(spark, version=v1).collect()
    } == {(1, 1), (2, 1)}
    assert _labels(idx, spark) == {(1, 1), (2, 1), (3, 1)}
