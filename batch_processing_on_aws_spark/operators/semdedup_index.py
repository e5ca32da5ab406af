"""Incrementally-maintained SemDeDup corpus (the standing-index
sibling of ``similarity.semantic_dedup``).

``semantic_dedup`` re-trains the quantizer and re-compares the whole
corpus on every call — correct one-shot, wrong for a corpus that a
crawl appends to daily. This module composes the frozen-quantizer
pattern of :class:`~.ann_index.IVFIndex` (train once on the first
delivery, assign-only ever after) with SemDeDup's within-cell cosine
ball (Abbas et al. 2023, arXiv:2303.09540):

- **state** — ONE VersionedTable keyed on ``vec_id`` holding every
  vector ever delivered with its frozen-cell assignment and its
  ``kept`` flag. Dropped rows are retained, not discarded: SemDeDup's
  drop rule quantifies over ALL smaller-id neighbors (a vector
  dropped because of an even-smaller neighbor still drops ITS larger
  neighbors), so dropped rows stay comparators forever. ``kept`` is
  the audit surface, exactly the one-shot operator's output frame.
- **add is O(batch × touched-cell density)** — assign the batch
  against the frozen centroids (shuffle-free Arrow matmul), read the
  standing rows of only the CELLS the batch touches (cell predicate
  pushed to the parquet scan), then one cell-keyed equi-join decides
  both directions: a batch row is dropped iff SOME smaller-id
  same-cell row (standing or in-batch) sits within the ball, and a
  standing KEPT row is retracted iff a NEW smaller-id batch row
  lands within its ball. The union's drop set is monotone — rows
  only ever flip kept→dropped — which is what makes delivery order
  irrelevant: after any sequence of adds the flags equal the
  one-shot ``semantic_dedup`` of the union under the same frozen
  quantizer (pinned hash-exact by the ``streamed_semantic_corpus``
  golden).
- **contract** — a ``vec_id``'s embedding is immutable (ids are
  content hashes in a real pipeline); value-equal re-deliveries are
  idempotent (the recomputed flag can only confirm or tighten).
  A value-CHANGING re-delivery breaks monotonicity and is out of
  contract — route it as a delete + new id.

At 100 TB: the model is n_cells × dim (kilobytes, rides task
closures); state is O(corpus) but the add path never rescans it —
the cell filter prunes the standing read to the batch's touched
cells, and n_cells scales ∝ N (the paper's ~0.1 %·N) so cells stay
bounded. The state table is bucketed by ``vec_id`` for keyed
upserts; at warehouse scale you would additionally cluster files by
``cell`` (``VersionedTable.compact(zorder_by=...)``) so the
touched-cell read prunes at file rather than row-group level.

Reference scope: extension beyond the reference pipeline (no vector
surface there); the versioned-commit pattern mirrors its Redshift
COPY+UPSERT warehouse load (reference
`airflow/dags/proc_2_s3_to_redshifht_dag.py:31-43`) applied to a
curation ledger instead of a fact table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    _as_double,
    _assign_cells,
    _train_centroids,
)
from .versioned import VersionedTable

MODEL_DIR = "model"
STATE_DIR = "state"
DRIFT_DIR = "drift"


class SemDedupIndex:
    """A persisted, incrementally-maintained SemDeDup ledger rooted at
    ``root``: ``root/model`` (frozen quantizer), ``root/state``
    (VersionedTable of (vec_id, c_vec, cell, kept) keyed on
    ``vec_id``)."""

    def __init__(
        self,
        root: str,
        n_cells: int = 16,
        tau: float = 0.92,
        seed: int = 42,
        max_iter: int = 8,
        n_train: int = 4096,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_buckets: int = 32,
        drift_threshold_micro: int = 250_000,
        max_cell_population: int = 100_000,
    ):
        self.root = root
        self.n_cells = n_cells
        self.tau = tau
        self.seed = seed
        self.max_iter = max_iter
        self.n_train = n_train
        self.id_col = id_col
        self.vec_col = vec_col
        self.drift_threshold_micro = drift_threshold_micro
        self.max_cell_population = max_cell_population
        self.model_path = os.path.join(root, MODEL_DIR)
        self.drift_path = os.path.join(root, DRIFT_DIR)
        self.table = VersionedTable(
            os.path.join(root, STATE_DIR), keys=["vec_id"], n_buckets=n_buckets
        )

    # -- model state ---------------------------------------------------

    def _canon(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.id_col).alias("vec_id"),
            _as_double(F.col(self.vec_col)).alias("c_vec"),
        )

    def _write_model(self, spark: SparkSession, centers, base_hist) -> None:
        rows = [
            (i, [float(x) for x in ctr], float((ctr**2).sum() / 2.0), int(n))
            for i, (ctr, n) in enumerate(zip(centers, base_hist))
        ]
        (
            spark.createDataFrame(
                rows,
                "cell int, centroid array<double>, half_sq double, base_n long",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(self.model_path)
        )

    def _load_model(self, spark: SparkSession):
        """(centers ndarray ordered by cell, base histogram list)."""
        import numpy as np

        rows = spark.read.parquet(self.model_path).orderBy("cell").collect()
        centers = np.asarray([r["centroid"] for r in rows], dtype=np.float64)
        return centers, [int(r["base_n"]) for r in rows]

    def exists(self) -> bool:
        return self.table.latest_version() > 0

    # -- the drop rule (shared by build and add) -----------------------

    @staticmethod
    def _dropped_ids(candidates: DataFrame, comparators: DataFrame, tau: float):
        """ids of ``candidates`` rows having SOME strictly-smaller-id
        same-cell comparator within the cosine ball — the shared
        salted-slice ball join (``similarity.ball_dropped_ids``;
        round-13: a hot cell's quadratic compare splits across slice
        tasks instead of serializing on one). Comparators include
        dropped rows — SemDeDup's rule quantifies over all smaller-id
        neighbors, not just survivors."""
        from .similarity import ball_dropped_ids

        return ball_dropped_ids(candidates, comparators, tau)

    def _guard_hot_cells(self, rows: DataFrame, where: str) -> None:
        """Fail LOUD before a degenerate quantizer goes quadratic
        silently (round-13: the PSI gate only flags drift AFTER the
        expensive add): ``_dropped_ids`` joins within cells with
        O(population²) pair candidates, so any touched cell whose
        comparator population exceeds ``max_cell_population`` aborts
        the fold with the cell ids and counts — the
        ``max_bucket_size`` escape of the LSH miners, applied to
        quantizer cells. One cheap hash-agg over the join input; the
        caller's state is untouched (no commit has happened yet).
        Recovery is the documented drift path: ``refresh()`` retrains
        the quantizer (or raise the cap deliberately)."""
        hot = (
            rows.groupBy("cell")
            .count()
            .where(F.col("count") > self.max_cell_population)
            .orderBy(F.col("count").desc())
            .limit(5)
            .collect()
        )
        if hot:
            detail = ", ".join(f"cell {r['cell']}={r['count']}" for r in hot)
            raise ValueError(
                f"SemDedupIndex.{where}: touched-cell population exceeds "
                f"max_cell_population={self.max_cell_population} "
                f"({detail}) — the within-cell comparison would go "
                "quadratic; the quantizer no longer matches the data. "
                "Run refresh() to retrain, or raise max_cell_population "
                "deliberately."
            )

    def _flag(self, rows: DataFrame, dropped: DataFrame) -> DataFrame:
        return (
            rows.join(dropped.withColumn("__drop", F.lit(True)), "vec_id", "left")
            .select(
                "vec_id",
                "c_vec",
                "cell",
                F.coalesce(~F.col("__drop"), F.lit(True)).alias("kept"),
            )
        )

    # -- lifecycle -----------------------------------------------------

    def build(self, corpus: DataFrame, txn: dict | None = None) -> dict:
        """Train the quantizer on a bounded deterministic sample of the
        FIRST delivery, freeze it, and commit the delivery's full
        (vec_id, cell, kept) frame as version 1. Deterministic, so a
        crash-replayed build epoch converges (same model bytes, same
        flags)."""
        from .ann_index import _cell_histogram

        spark = corpus.sparkSession
        c = self._canon(corpus)
        centers = _train_centroids(
            c,
            n_cells=self.n_cells,
            seed=self.seed,
            max_iter=self.max_iter,
            n_train=self.n_train,
        )
        assigned = _assign_cells(c, centers).localCheckpoint(eager=True)
        base_hist = _cell_histogram(assigned, len(centers))
        self._write_model(spark, centers, base_hist)
        # guard the FIRST delivery too (round-14): near-identical
        # embeddings collapse the fresh quantizer into one cell, and
        # build's within-cell compare is exactly as quadratic as add's
        self._guard_hot_cells(assigned, "build")
        rows = self._flag(assigned, self._dropped_ids(assigned, assigned, self.tau))
        version = self.table.overwrite(rows, txn=txn)
        return {"version": version, "psi_micro": 0}

    def add(self, batch: DataFrame, txn: dict | None = None) -> dict:
        """Fold a delivery in: assign against the FROZEN quantizer,
        compare within touched cells in both directions, commit ONE
        keyed upsert (new rows with their flags + retractions of
        standing survivors newly shadowed by smaller-id arrivals)."""
        from .ann_index import _cell_histogram, _psi_micro

        spark = batch.sparkSession
        centers, base_hist = self._load_model(spark)
        assigned = _assign_cells(self._canon(batch), centers).localCheckpoint(
            eager=True
        )
        cells = [r["cell"] for r in assigned.select("cell").distinct().collect()]
        standing = (
            self.table.read(spark)
            .where(F.col("cell").isin(cells))
            .select("vec_id", "c_vec", "cell", "kept")
            .localCheckpoint(eager=True)
        )
        # batch rows compare against the union-so-far (standing rows
        # kept OR dropped, plus the batch itself); for a re-delivered
        # id the standing copy is excluded by the strict b_id < a_id
        comparators = assigned.unionByName(
            standing.select("vec_id", "c_vec", "cell")
        )
        self._guard_hot_cells(comparators, "add")
        batch_rows = self._flag(
            assigned, self._dropped_ids(assigned, comparators, self.tau)
        )
        # standing survivors retracted by new smaller-id arrivals;
        # re-delivered ids are re-flagged via batch_rows (upsert wins
        # by key), so exclude them here to keep one row per key
        retracted_ids = self._dropped_ids(
            standing.where(F.col("kept")), assigned, self.tau
        ).join(assigned.select("vec_id"), "vec_id", "left_anti")
        retractions = (
            standing.join(retracted_ids, "vec_id")
            .select("vec_id", "c_vec", "cell", F.lit(False).alias("kept"))
        )
        version = self.table.upsert(
            spark, batch_rows.unionByName(retractions), txn=txn
        )
        # PSI drift gate, same convention as IVFIndex.add: the frozen
        # quantizer stops matching the data (new domain, new embedding
        # model) → within-cell balls stop meaning "semantic near-dup"
        # and recall of true dups decays. Above-threshold batches flag
        # needs_retrain; the index never retrains itself mid-add.
        batch_hist = _cell_histogram(assigned, len(centers))
        psi = _psi_micro(base_hist, batch_hist)
        needs_retrain = psi > self.drift_threshold_micro
        drift_row = spark.createDataFrame(
            [(version, sum(batch_hist), psi, needs_retrain)],
            "version long, batch_n long, psi_micro long, needs_retrain boolean",
        )
        epoch = (txn or {}).get("epoch")
        (
            drift_row.withColumn(
                "__epoch", F.lit(-1 if epoch is None else int(epoch))
            )
            .write.mode("overwrite" if epoch is not None else "append")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(self.drift_path)
        )
        return {
            "version": version,
            "psi_micro": psi,
            "needs_retrain": needs_retrain,
        }

    def apply(self, batch: DataFrame, txn: dict | None = None) -> dict:
        """build() on an empty index, add() after — the streaming
        entrypoint's decision, factored for reuse."""
        if not self.exists():
            return self.build(batch, txn=txn)
        return self.add(batch, txn=txn)

    def refresh(self, spark: SparkSession, txn: dict | None = None) -> dict:
        """The drift-triggered retrain (same contract as
        ``IVFIndex.refresh``): re-fit centroids on the CURRENT state's
        vectors (bounded-sample trainer), re-assign everything, and
        recompute EVERY kept flag with the one-shot drop rule — flags
        are a function of the cell structure, so a quantizer swap
        invalidates them wholesale; recomputing only some would mix
        two geometries. Commits as a new version (prior flags stay
        time-travel readable — rollback from a bad retrain is a
        version pin); never runs itself mid-add, because a quantizer
        swap inside a micro-batch breaks replay idempotency.

        NOTE refresh can UN-drop: a row dropped under the old cells
        may have no smaller-id in-ball neighbor in its new cell. That
        is correct — the monotone-drop contract is per-quantizer, and
        refresh starts a new one (audited by the commit boundary)."""
        from .ann_index import _cell_histogram

        current = self.table.read(spark).select("vec_id", "c_vec")
        centers = _train_centroids(
            current,
            n_cells=self.n_cells,
            seed=self.seed,
            max_iter=self.max_iter,
            n_train=self.n_train,
        )
        assigned = _assign_cells(current, centers).localCheckpoint(eager=True)
        base_hist = _cell_histogram(assigned, len(centers))
        self._write_model(spark, centers, base_hist)
        # a retrain on genuinely degenerate data can still land one
        # hot cell — same loud abort as build/add (raise the cap
        # deliberately if the density is real)
        self._guard_hot_cells(assigned, "refresh")
        rows = self._flag(
            assigned, self._dropped_ids(assigned, assigned, self.tau)
        )
        version = self.table.overwrite(rows, txn=txn)
        return {"version": version, "psi_micro": 0}

    # -- read surface ----------------------------------------------------

    def audit(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The full (vec_id, cell, kept) frame — the one-shot
        ``semantic_dedup`` output shape, for dedup-rate audits and the
        parity oracle. ``version`` time-travels."""
        return self.table.read(spark, version=version).select(
            "vec_id", "cell", "kept"
        )

    def survivors(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Kept vectors only — what downstream training actually reads."""
        return (
            self.table.read(spark, version=version)
            .where(F.col("kept"))
            .select("vec_id", "cell")
        )

    def drift_history(self, spark: SparkSession) -> DataFrame:
        """The per-add drift audit (version, batch_n, psi_micro,
        needs_retrain) — the monitoring feed a retrain scheduler
        consumes; same shape as ``IVFIndex.drift_history``."""
        return spark.read.parquet(self.drift_path).drop("__epoch")

    # -- maintenance (the shared standing-index contract) ----------------

    @staticmethod
    def _sub(txn: dict | None, part: str) -> dict | None:
        if txn is None:
            return None
        return {"app": f"{txn['app']}.{part}", "epoch": txn["epoch"]}

    def _applied(self, txn: dict | None, part: str) -> bool:
        if txn is None:
            return False
        return self.table.txn_applied(f"{txn['app']}.{part}", txn["epoch"])

    def delete(
        self,
        keys: DataFrame,
        txn: dict | None = None,
        recompute: bool = False,
    ) -> int:
        """Remove vectors from the ledger (corpus retention, takedown).

        Default (``recompute=False``): one ``delete_keys`` commit,
        and the asymmetry with :meth:`add` stands — removing a row
        does NOT resurrect larger-id rows it once shadowed (survivor
        flags are a curation decision; cheapest, right for routine
        retention).

        ``recompute=True`` is the takedown-then-re-evaluate second
        half (round-13): re-run the one-shot drop rule over ONLY the
        affected cells' SURVIVING rows (:meth:`recompute_cells` —
        cell-pruned read, same shape as :meth:`add`), so a row
        shadowed solely by a removed vector resurfaces; unaffected
        cells' flags are untouched (drop decisions never cross
        cells). Crash contract mirrors ``ClusterIndex.retract_docs``:
        the flag recompute commits BEFORE the delete (sub-stamps
        ``.r`` / ``.d``) — between the two commits the deleted keys
        still exist, so a re-run re-derives the same affected cells
        and survivor set and converges; after both stamps the replay
        returns without reading data. The ``semantic_corpus_after_
        removal`` golden pins the result hash-exact against the
        one-shot rule over the surviving union."""
        spark = keys.sparkSession
        k = (
            keys.select(F.col(self.id_col).alias("vec_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if not recompute:
            return self.table.delete_keys(spark, k, txn=txn)
        if (
            txn is not None
            and self._applied(txn, "r")
            and self._applied(txn, "d")
        ):
            return self.table.latest_version()
        cells = [
            r["cell"]
            for r in self.table.read(spark)
            .join(k, "vec_id", "left_semi")
            .select("cell")
            .distinct()
            .collect()
        ]
        if txn is None or not self._applied(txn, "r"):
            self.recompute_cells(
                spark, cells, exclude=k, txn=self._sub(txn, "r")
            )
        if txn is None or not self._applied(txn, "d"):
            return self.table.delete_keys(spark, k, txn=self._sub(txn, "d"))
        return self.table.latest_version()

    def recompute_cells(
        self,
        spark: SparkSession,
        cells: list,
        exclude: DataFrame | None = None,
        txn: dict | None = None,
    ) -> int:
        """Re-run the one-shot drop rule over the given cells' rows
        (minus ``exclude`` keys — the about-to-be-deleted vectors,
        threaded separately so the recompute can commit BEFORE the
        delete) and upsert only the flags that CHANGED — the audited
        O(affected cells) maintenance pass that closes the un-drop
        gap. Cell predicate pushed to the parquet scan exactly as in
        :meth:`add`; rows outside ``cells`` are never read or
        written. An empty ``cells`` (the deleted keys were absent
        from the ledger) is a no-op that still mints the txn stamp,
        so the two-commit crash contract replays symmetrically — but
        ONLY under a txn: the stamp is the empty commit's sole
        purpose, so an untxn'd empty recompute skips the commit
        instead of minting a useless version (the ``TextIndex``
        empty-delta convention)."""
        cells = list(cells)
        if not cells:
            if txn is None:
                return self.table.latest_version()
            empty = (
                self.table.read(spark)
                .select("vec_id", "c_vec", "cell", "kept")
                .limit(0)
            )
            return self.table.upsert(spark, empty, txn=txn)
        rows = (
            self.table.read(spark)
            .where(F.col("cell").isin(list(cells)))
            .select("vec_id", "c_vec", "cell", "kept")
        )
        if exclude is not None:
            rows = rows.join(exclude, "vec_id", "left_anti")
        rows = rows.localCheckpoint(eager=True)
        self._guard_hot_cells(rows, "recompute_cells")
        survivors = rows.select("vec_id", "c_vec", "cell")
        new_flags = self._flag(
            survivors, self._dropped_ids(survivors, survivors, self.tau)
        )
        changed = (
            new_flags.join(
                rows.select("vec_id", F.col("kept").alias("__old")), "vec_id"
            )
            .where(F.col("kept") != F.col("__old"))
            .select("vec_id", "c_vec", "cell", "kept")
        )
        return self.table.upsert(spark, changed, txn=txn)

    def compact(self, spark: SparkSession, min_files: int = 2) -> int | None:
        """Fold upsert-accreted small files; content-identical."""
        return self.table.compact(spark, min_files=min_files)

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY of the state table (metadata-only)."""
        return self.table.history()

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Reclaim unreferenced data files (VersionedTable.vacuum);
        see ``IVFIndex.vacuum`` for the contract."""
        return self.table.vacuum(keep_last=keep_last)
