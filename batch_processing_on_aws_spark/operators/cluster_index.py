"""Incrementally-maintained duplicate-cluster index (extension
surface; the standing-table sibling of ``clustering.dup_clusters``).

``dup_clusters`` closes a FULL pair set into connected components —
correct for a one-shot curation run, wrong for the production shape:
a crawl appended to daily, whose near-dup pair miners emit a small
edge batch per delivery while the accumulated cluster assignment of
billions of documents must stay current. Re-running CC over every
pair ever emitted is O(history) per day; this module folds each edge
batch in O(batch + touched clusters):

- **contract** — every endpoint of the batch's edges maps to its
  EXISTING cluster label (or itself if unlabeled): existing clusters
  become super-nodes, so the graph CC actually runs on has one node
  per touched cluster/new doc and one edge per batch pair — batch-
  sized, never corpus-sized.
- **close** — ``clustering.connected_components`` (min-label
  propagation) over the contracted graph. Because a cluster's label
  is the MIN doc id of its members, the min over a contracted
  component of labels IS the min doc id over the union of the merged
  clusters' members — min-label CC is confluent, so folding edges in
  ANY delivery order lands in the same fixpoint as one-shot CC over
  the union of all edges (the property the
  ``incremental_dup_clusters`` golden pins hash-exact).
- **relabel** — rows to rewrite are the batch's endpoints plus the
  members of clusters whose root label changed (a broadcast semi-join
  of the label table against the remap — the scan reads the NARROW
  (doc_id, cluster_id) label table, never document payloads, and the
  WRITE touches only affected buckets of the
  :class:`~.versioned.VersionedTable`).

Crash contract: one keyed upsert commit per batch, stamped with the
caller's writer txn — a replayed epoch is detected by ``txn_applied``
and skipped (``ingest_cluster_stream`` wires the availableNow loop).

At 100 TB: the label table is ~16 B/row metadata, orders below the
corpus; the per-batch CC input is O(batch); the one non-O(batch)
term is the relabel semi-scan of the label table, stated here (a
cluster-bucketed secondary layout would prune it; not needed while
the label table is millions-of-rows narrow). Reference scope:
extension beyond the reference pipeline; the versioned-commit
pattern mirrors its Redshift COPY+UPSERT load
(`airflow/dags/proc_2_s3_to_redshifht_dag.py:31-43`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .clustering import connected_components
from .versioned import VersionedTable

LABELS_DIR = "labels"


class ClusterIndex:
    """A persisted, incrementally-maintained (doc_id, cluster_id)
    assignment rooted at ``root/labels``, fed by near-dup pair
    batches. Docs that never appear in a pair carry no row —
    :meth:`labels_for` coalesces them to their own id, exactly like
    ``clustering.assign_clusters``."""

    def __init__(self, root: str, n_buckets: int = 32):
        self.root = root
        self.table = VersionedTable(
            os.path.join(root, LABELS_DIR),
            keys=["doc_id"],
            n_buckets=n_buckets,
        )

    def exists(self) -> bool:
        return self.table.latest_version() > 0

    def apply(
        self,
        pairs: DataFrame,
        id_a: str = "doc_id_a",
        id_b: str = "doc_id_b",
        txn: dict | None = None,
    ) -> dict:
        """Fold one edge batch into the standing assignment — ONE
        keyed upsert commit (idempotent under the txn stamp)."""
        spark = pairs.sparkSession
        if txn is not None and self.table.txn_applied(
            txn["app"], txn["epoch"]
        ):
            return {"version": self.table.latest_version(), "replayed": True}
        edges = pairs.select(
            F.col(id_a).alias("a"), F.col(id_b).alias("b")
        ).where(F.col("a").isNotNull() & F.col("b").isNotNull())
        have_labels = self.exists()
        if have_labels:
            cur = self.table.read(spark).select("doc_id", "cluster_id")
            la = cur.withColumnRenamed("doc_id", "a").withColumnRenamed(
                "cluster_id", "ca"
            )
            lb = cur.withColumnRenamed("doc_id", "b").withColumnRenamed(
                "cluster_id", "cb"
            )
            contracted = (
                edges.join(la, "a", "left")
                .join(lb, "b", "left")
                .select(
                    F.coalesce("ca", F.col("a")).alias("src"),
                    F.coalesce("cb", F.col("b")).alias("dst"),
                )
            )
        else:
            contracted = edges.select(
                F.col("a").alias("src"), F.col("b").alias("dst")
            )
        contracted = contracted.where(
            F.col("src") != F.col("dst")
        ).localCheckpoint(eager=True)
        if contracted.isEmpty():
            # every pair already internal to one cluster (or the whole
            # batch was self-pairs/nulls): no-op commit still mints the
            # txn stamp so a replay skips cleanly — in BOTH branches;
            # a first-delivery no-op that skipped the stamp would be
            # re-run on every replay (benign but inconsistent with the
            # labeled branch's contract)
            if txn is not None:
                empty = (
                    self.table.read(spark).limit(0)
                    if have_labels
                    else edges.select(
                        F.col("a").alias("doc_id"),
                        F.col("a").alias("cluster_id"),
                    ).limit(0)
                )
                v = self.table.upsert(spark, empty, txn=txn)
                return {"version": v, "relabeled_nodes": 0}
            return {"version": self.table.latest_version(),
                    "relabeled_nodes": 0}
        comp = connected_components(
            contracted, src="src", dst="dst", check_every=2
        ).localCheckpoint(eager=True)
        # comp: (n = contracted node, component = new root). Rows to
        # write: 1) the contracted nodes themselves (old roots and
        # fresh docs), 2) members of clusters whose root moved.
        node_rows = comp.select(
            F.col("n").alias("doc_id"), F.col("component").alias("cluster_id")
        )
        if have_labels:
            remap = comp.where(F.col("n") != F.col("component")).select(
                F.col("n").alias("cluster_id"),
                F.col("component").alias("__new"),
            )
            relabeled = (
                cur.join(F.broadcast(remap), "cluster_id")
                .select("doc_id", F.col("__new").alias("cluster_id"))
            )
            rows = node_rows.unionByName(relabeled)
        else:
            rows = node_rows
        # a doc may appear both as a contracted node and a relabeled
        # member — identical label either way; keep one
        rows = rows.groupBy("doc_id").agg(
            F.min("cluster_id").alias("cluster_id")
        )
        moved = comp.where(F.col("n") != F.col("component")).count()
        v = self.table.upsert(spark, rows, txn=txn)
        return {"version": v, "relabeled_nodes": int(moved)}

    def labels(self, spark: SparkSession, version: int | None = None):
        """The standing (doc_id, cluster_id) assignment — paired docs
        only (singletons are implicit)."""
        return self.table.read(spark, version=version).select(
            "doc_id", "cluster_id"
        )

    def labels_for(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        version: int | None = None,
    ) -> DataFrame:
        """All of ``docs`` with a ``cluster_id`` — the standing-index
        form of ``clustering.assign_clusters``: component label for
        paired docs, own id for singletons."""
        spark = docs.sparkSession
        lab = self.labels(spark, version=version).withColumnRenamed(
            "doc_id", id_col
        )
        return docs.join(lab, id_col, "left").withColumn(
            "cluster_id", F.coalesce("cluster_id", F.col(id_col))
        )

    # -- maintenance (the shared standing-index contract) --------------

    def remove_docs(self, keys: DataFrame, txn: dict | None = None) -> int:
        """MEMBERSHIP removal only (corpus retention, takedown): drop
        the docs' label rows so :meth:`labels` / :meth:`labels_for`
        stop reporting them. One keyed ``delete_keys`` commit, txn
        stamped, prior versions time-travel readable.

        What this deliberately does NOT do: true label RETRACTION
        (splitting a cluster whose members were only connected
        through the removed doc) is impossible from the label table
        alone — labels are the min-label fixpoint of the edge set,
        and the index stores the fixpoint, not the edges; the same
        economy that makes :meth:`apply` O(batch) forfeits the
        information a split needs. That is :meth:`retract_docs`,
        which takes the persisted pair LEDGER and runs the O(touched
        clusters) recompute as an explicit audited maintenance pass.
        Membership removal is the right default for near-dup
        curation: remaining members' labels stay a conservative
        over-grouping (docs once transitively near-dup stay
        grouped), which biases toward MORE dedup, never less."""
        spark = keys.sparkSession
        return self.table.delete_keys(
            spark, keys.select("doc_id").distinct(), txn=txn
        )

    @staticmethod
    def _sub(txn: dict | None, part: str) -> dict | None:
        if txn is None:
            return None
        return {"app": f"{txn['app']}.{part}", "epoch": txn["epoch"]}

    def _applied(self, txn: dict | None, part: str) -> bool:
        if txn is None:
            return False
        return self.table.txn_applied(f"{txn['app']}.{part}", txn["epoch"])

    def retract_docs(
        self,
        pairs: DataFrame,
        keys: DataFrame,
        id_a: str = "doc_id_a",
        id_b: str = "doc_id_b",
        txn: dict | None = None,
    ) -> dict:
        """TRUE label retraction (takedown second half, round-13):
        remove the docs AND split any cluster whose remaining members
        were only connected through them, from the persisted pair
        LEDGER the near-dup miners emitted (``pairs`` — the same
        frame :meth:`apply` folded in, which the pipeline persists
        for replay). An explicit audited maintenance pass, never
        inline in the hot add path; O(touched clusters), never
        O(ledger):

        1. affected clusters = standing labels of the removed docs
           (docs without a label row are implicit singletons — no
           structure to retract);
        2. the ledger is filtered to edges INSIDE those clusters
           (clusters are closed under ledger edges, so a member
           semi-join on both endpoints prunes the scan) minus edges
           incident to a removed doc;
        3. ``connected_components`` re-closes just those edges —
           min-label CC over component-identical edge sets, so the
           result equals one-shot CC over (full ledger − removed-
           incident edges) restricted to the touched clusters (the
           ``dup_clusters_retracted`` golden pins this hash-exact);
        4. ONE keyed upsert rewrites only the labels that CHANGED
           (non-bridge removal rewrites nothing — pinned by test),
           then ONE ``delete_keys`` drops the removed docs and the
           members the split left edgeless (singletons are implicit,
           exactly as in :meth:`apply`).

        Crash contract: relabel commits BEFORE delete (sub-stamps
        ``.r`` / ``.d``, the ``TextIndex`` multi-commit pattern) —
        after a crash between the two, the removed docs' rows still
        exist and still carry their pre-retraction labels, so the
        re-run re-derives the same affected set, re-lands the (now
        value-equal, hence empty) relabel, and completes the delete;
        after both stamps the replay returns without reading data."""
        spark = keys.sparkSession
        if (
            txn is not None
            and self._applied(txn, "r")
            and self._applied(txn, "d")
        ):
            return {"version": self.table.latest_version(), "replayed": True}
        removed = (
            keys.select("doc_id").distinct().localCheckpoint(eager=True)
        )
        cur = self.labels(spark)
        affected = (
            cur.join(removed, "doc_id", "left_semi")
            .select("cluster_id")
            .distinct()
        )
        members = (
            cur.join(F.broadcast(affected), "cluster_id", "left_semi")
            .localCheckpoint(eager=True)
        )
        mem_a = members.select(F.col("doc_id").alias("a"))
        mem_b = members.select(F.col("doc_id").alias("b"))
        edges = (
            pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
            .where(F.col("a").isNotNull() & F.col("b").isNotNull())
            .where(F.col("a") != F.col("b"))
            .join(mem_a, "a", "left_semi")
            .join(mem_b, "b", "left_semi")
            .join(removed.withColumnRenamed("doc_id", "a"), "a", "left_anti")
            .join(removed.withColumnRenamed("doc_id", "b"), "b", "left_anti")
            .localCheckpoint(eager=True)
        )
        if edges.isEmpty():
            relabels = members.limit(0)
            with_edges = members.select("doc_id").limit(0)
        else:
            comp = connected_components(
                edges, src="a", dst="b", check_every=2
            ).localCheckpoint(eager=True)
            relabels = comp.select(
                F.col("n").alias("doc_id"),
                F.col("component").alias("cluster_id"),
            )
            with_edges = relabels.select("doc_id")
        # write only labels that actually moved: a non-bridge removal
        # leaves every survivor's component intact, so the relabel
        # commit is an audited no-op (content byte-identical)
        changed = (
            relabels.join(
                members.withColumnRenamed("cluster_id", "__old"), "doc_id"
            )
            .where(F.col("cluster_id") != F.col("__old"))
            .select("doc_id", "cluster_id")
            .localCheckpoint(eager=True)
        )
        dels = (
            removed.unionByName(
                members.select("doc_id").join(with_edges, "doc_id", "left_anti")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_changed = changed.count()
        if txn is None or not self._applied(txn, "r"):
            self.table.upsert(spark, changed, txn=self._sub(txn, "r"))
        if txn is None or not self._applied(txn, "d"):
            v = self.table.delete_keys(spark, dels, txn=self._sub(txn, "d"))
        else:
            v = self.table.latest_version()
        return {
            "version": v,
            "relabeled_nodes": int(n_changed),
            "deleted_rows": int(dels.count()),
        }

    def compact(self, spark: SparkSession, min_files: int = 2) -> int | None:
        """Fold upsert-accreted small files in the label table —
        content-identical (labels invariant, pinned by test)."""
        return self.table.compact(spark, min_files=min_files)

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY of the label table (metadata-only)."""
        return self.table.history()

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Reclaim unreferenced data files (VersionedTable.vacuum);
        see ``IVFIndex.vacuum`` for the contract."""
        return self.table.vacuum(keep_last=keep_last)
