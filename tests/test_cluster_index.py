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


def test_first_delivery_noop_with_txn_does_not_brick(spark, tmp_path):
    """Round-13 ADVICE regression: a FRESH index whose first txn'd
    delivery contracts to empty (all self-pairs/nulls) mints version 1
    with zero data files. That version must stay readable (typed empty
    frame via the manifest schema) so every later apply()/labels()
    works — before the fix the second apply raised
    ValueError('version 1 is empty') forever (stream crash-loop)."""
    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    out = idx.apply(
        _pairs(spark, [(1, 1), (2, 2), (None, 3)]),
        txn={"app": "t", "epoch": 0},
    )
    assert out["relabeled_nodes"] == 0
    assert idx.table.txn_applied("t", 0)  # stamp minted on delivery 1
    assert _labels(idx, spark) == set()   # readable, empty
    # the replayed epoch skips cleanly
    out = idx.apply(_pairs(spark, [(1, 1)]), txn={"app": "t", "epoch": 0})
    assert out.get("replayed") is True
    # and a real second delivery folds in normally
    idx.apply(_pairs(spark, [(1, 2), (2, 3)]), txn={"app": "t", "epoch": 1})
    assert _labels(idx, spark) == {(1, 1), (2, 1), (3, 1)}


def test_remove_all_docs_keeps_index_usable(spark, tmp_path):
    """Deleting EVERY label row (the ADVICE medium trap on the delete
    surfaces) leaves a readable empty assignment, and the index keeps
    folding later deliveries."""
    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    idx.apply(_pairs(spark, [(1, 2), (2, 3)]))
    idx.remove_docs(
        spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    )
    assert _labels(idx, spark) == set()
    idx.apply(_pairs(spark, [(7, 8)]))
    assert _labels(idx, spark) == {(7, 7), (8, 7)}


# -- true label retraction from the pair ledger (round-13) -------------

LEDGER = [
    (1, 2), (2, 3), (3, 4),   # chain 1-2-3-4: 3 bridges {1,2,3} to {4}... and
    (10, 11), (11, 12),       # chain 10-11-12: 11 is the bridge
    (20, 21), (21, 22), (20, 22),  # triangle: no bridges
]


def _retracted_oneshot(spark, rows, removed):
    """Oracle: one-shot CC over the ledger minus removed-incident
    edges — what the standing labels must equal after retract_docs."""
    keep = [
        (a, b) for a, b in rows if a not in removed and b not in removed
    ]
    return _oneshot(spark, keep) if keep else set()


def test_retract_bridge_splits_cluster(spark, tmp_path):
    """Removing a bridge doc splits members connected only THROUGH it
    — the takedown gap membership removal cannot close."""
    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    ledger = _pairs(spark, LEDGER)
    idx.apply(ledger)
    assert _labels(idx, spark) == _oneshot(spark, LEDGER)
    out = idx.retract_docs(
        ledger,
        spark.createDataFrame([(11,), (2,)], "doc_id long"),
        txn={"app": "rt", "epoch": 0},
    )
    want = _retracted_oneshot(spark, LEDGER, {11, 2})
    # 2 removed from chain 1-2-3-4: splits into {1} (edgeless, implicit
    # singleton) and {3,4}; 11 removed from 10-11-12: both survivors
    # edgeless singletons; triangle untouched
    assert _labels(idx, spark) == want
    assert out["relabeled_nodes"] >= 1  # 3-4 relabeled from 1 to 3


def test_retract_non_bridge_leaves_labels_identical(spark, tmp_path):
    """Non-bridge removal: survivors keep their exact labels (the
    relabel commit writes zero rows) — only the removed doc's row and
    the rows the removal left edgeless drop out."""
    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    ledger = _pairs(spark, LEDGER)
    idx.apply(ledger)
    before = _labels(idx, spark)
    out = idx.retract_docs(
        ledger, spark.createDataFrame([(22,)], "doc_id long")
    )
    # triangle minus one vertex is still connected: 20-21 survive with
    # the same label; no other cluster touched
    assert out["relabeled_nodes"] == 0
    assert _labels(idx, spark) == before - {(22, 20)}


def test_retract_min_label_doc_relabels_to_new_min(spark, tmp_path):
    """Removing the cluster's MIN doc (its label id): survivors
    re-close to the new min — labels are min-labels, not foreign
    keys, so the old id must vanish from the assignment."""
    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    ledger = _pairs(spark, [(1, 2), (2, 3), (1, 3)])
    idx.apply(ledger)
    idx.retract_docs(ledger, spark.createDataFrame([(1,)], "doc_id long"))
    assert _labels(idx, spark) == {(2, 2), (3, 2)}


def test_retract_replay_and_crash_between_commits(spark, tmp_path):
    """Exactly-once under the two sub-stamps: a full replay skips
    without reading data; a crash BETWEEN the relabel and delete
    commits re-runs to the same final state (the removed docs' rows
    still carry their pre-retraction labels, so the affected set is
    re-derivable)."""
    from batch_processing_on_aws_spark.operators import versioned as V

    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    ledger = _pairs(spark, LEDGER)
    idx.apply(ledger)
    want = _retracted_oneshot(spark, LEDGER, {11})
    rm = spark.createDataFrame([(11,)], "doc_id long")

    # crash between commits: delete_keys raises once
    real = V.VersionedTable.delete_keys
    calls = {"n": 0}

    def boom(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash before delete commit")
        return real(self, *a, **k)

    try:
        V.VersionedTable.delete_keys = boom
        with pytest.raises(RuntimeError, match="injected crash"):
            idx.retract_docs(ledger, rm, txn={"app": "rt", "epoch": 0})
        out = idx.retract_docs(ledger, rm, txn={"app": "rt", "epoch": 0})
    finally:
        V.VersionedTable.delete_keys = real
    assert _labels(idx, spark) == want
    assert out.get("replayed") is None
    # full replay: both stamps applied -> skip
    v = idx.table.latest_version()
    out = idx.retract_docs(ledger, rm, txn={"app": "rt", "epoch": 0})
    assert out.get("replayed") is True
    assert idx.table.latest_version() == v
    assert _labels(idx, spark) == want


def test_retract_singleton_doc_is_noop_on_structure(spark, tmp_path):
    """Retracting a doc with no label row (implicit singleton): no
    cluster touched, nothing relabeled, nothing deleted."""
    idx = ClusterIndex(str(tmp_path / "cidx"), n_buckets=4)
    ledger = _pairs(spark, [(1, 2)])
    idx.apply(ledger)
    before = _labels(idx, spark)
    out = idx.retract_docs(
        ledger, spark.createDataFrame([(99,)], "doc_id long")
    )
    assert out["relabeled_nodes"] == 0
    assert _labels(idx, spark) == before
