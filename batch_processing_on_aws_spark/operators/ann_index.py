"""Incrementally-maintained IVF ANN index (extension surface; the
standing-index sibling of ``similarity.ivf_topk``).

``ivf_topk`` re-trains the coarse quantizer and re-assigns the whole
corpus on every call — correct for a one-shot query, wrong for a
standing index that new embedding batches keep arriving into (the
production shape: an embedding store that a crawl appends to daily).
This module is the FAISS ``train()`` / ``add()`` split re-expressed
on engine primitives:

- **train once** — ``IVFIndex.build`` fits k-means centroids on a
  bounded deterministic sample of the initial corpus (the exact
  trainer ``similarity._train_centroids`` uses) and freezes them in a
  tiny model table (n_cells rows: centroid, ‖c‖²/2, and the base
  per-cell occupancy histogram the drift gate compares against).
- **add many** — ``IVFIndex.add`` assigns a new batch against the
  FROZEN centroids (the shuffle-free Arrow matmul) and commits
  assign-only rows into a :class:`~.versioned.VersionedTable` keyed
  on the vector id. Cost is O(batch): the standing corpus is never
  rescanned, never reshuffled; re-delivered ids upsert in place.
  Because assignment is a pure per-row function of the frozen model,
  an index built incrementally over ANY delivery order equals the
  one-shot assignment of the union — the property the
  ``incremental_ivf_topk`` golden pins hash-exact against DuckDB.
- **drift gate** — every ``add`` measures how far the batch's
  per-cell occupancy moved from the base histogram as a PSI
  (population stability index) in the engine's micro-unit integer
  convention (``audit.psi_numeric_drift``: add-one smoothed shares,
  Σ(p−q)·ln(p/q), quantized once to 1e-6 units). A batch above the
  threshold flags ``needs_retrain`` in the drift audit — the signal
  that the frozen quantizer no longer matches the data (new domain,
  new embedding model) and recall is at risk.
- **retrain** — ``IVFIndex.refresh`` re-fits centroids on the CURRENT
  table contents and re-assigns everything as a new version; the old
  index stays time-travel readable (rollback = read the prior
  version). This is the explicit, audited operation the drift flag
  triggers — never silently mid-stream, because a quantizer swap
  inside a micro-batch would break the replay-idempotency contract.

At 100 TB: model state is n_cells × dim — kilobytes, rides every task
closure; the assignment table is O(corpus) but bucketed by vec_id so
an add touches only the buckets its batch hashes into (the
VersionedTable manifest shares untouched buckets' files); queries
probe n_probe cells via the same broadcast equi-join as ``ivf_topk``.
Reference scope: extension beyond the reference pipeline (which has
no vector surface); the versioned-commit pattern mirrors its
Redshift COPY+UPSERT warehouse load (reference
`airflow/dags/proc_2_s3_to_redshifht_dag.py:31-43`) applied to
an index instead of a fact table.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    _as_double,
    _assign_cells,
    _ivf_probe_topk,
    _train_centroids,
)
from .versioned import VersionedTable

MODEL_DIR = "model"
ASSIGN_DIR = "assign"
DRIFT_DIR = "drift"


def _cell_histogram(assigned: DataFrame, n_cells: int) -> list[int]:
    """Per-cell occupancy counts as a dense length-``n_cells`` list —
    one hash-agg over the cell key (bounded cardinality), merged on
    the driver. Model-sized state, like the centroids themselves."""
    counts = {
        r["cell"]: r["n"]
        for r in assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return [int(counts.get(i, 0)) for i in range(n_cells)]


def _psi_micro(base: list[int], batch: list[int]) -> int:
    """PSI between two per-cell histograms in micro-units (BIGINT),
    the ``audit.psi_numeric_drift`` convention: add-one smoothing so
    empty cells contribute finite terms, Σ(p−q)·ln(p/q) quantized
    once to 1e-6. Driver-side math over n_cells-sized lists — the
    inputs are model-sized, not data-sized."""
    c = len(base)
    tot_b = sum(base) + c
    tot_n = sum(batch) + c
    psi = 0.0
    for ob, nb in zip(base, batch):
        p = (ob + 1) / tot_b
        q = (nb + 1) / tot_n
        psi += (p - q) * math.log(p / q)
    return int(round(psi * 1_000_000.0))


class IVFIndex:
    """A persisted, incrementally-maintained IVF index rooted at
    ``root``: ``root/model`` (frozen quantizer + base histogram),
    ``root/assign`` (VersionedTable of cell assignments keyed on
    ``vec_id``), ``root/drift`` (per-add PSI audit, epoch-partitioned
    so crash-replayed epochs overwrite their own rows)."""

    def __init__(
        self,
        root: str,
        n_cells: int = 16,
        seed: int = 42,
        max_iter: int = 8,
        n_train: int = 4096,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_buckets: int = 32,
        drift_threshold_micro: int = 250_000,
    ):
        self.root = root
        self.n_cells = n_cells
        self.seed = seed
        self.max_iter = max_iter
        self.n_train = n_train
        self.id_col = id_col
        self.vec_col = vec_col
        self.drift_threshold_micro = drift_threshold_micro
        self.model_path = os.path.join(root, MODEL_DIR)
        self.drift_path = os.path.join(root, DRIFT_DIR)
        self.table = VersionedTable(
            os.path.join(root, ASSIGN_DIR), keys=["vec_id"], n_buckets=n_buckets
        )

    # -- model state -------------------------------------------------

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

    # -- lifecycle ---------------------------------------------------

    def build(self, corpus: DataFrame, txn: dict | None = None) -> dict:
        """Train the quantizer on a deterministic sample of ``corpus``
        and commit the full assignment as version 1. Deterministic:
        rebuilding from the same rows writes the same model bytes and
        the same assignments, which is what makes a crash-replayed
        build epoch idempotent."""
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
        version = self.table.overwrite(assigned, txn=txn)
        return {"version": version, "n": sum(base_hist), "psi_micro": 0}

    def add(self, batch: DataFrame, txn: dict | None = None) -> dict:
        """Assign ``batch`` against the FROZEN quantizer and upsert
        the rows — O(batch), the corpus is untouched. Records the
        batch-vs-base PSI drift row; above-threshold batches flag
        ``needs_retrain`` (the caller decides when to
        :meth:`refresh` — an index never retrains itself mid-add)."""
        spark = batch.sparkSession
        centers, base_hist = self._load_model(spark)
        assigned = _assign_cells(self._canon(batch), centers).localCheckpoint(
            eager=True
        )
        batch_hist = _cell_histogram(assigned, len(centers))
        psi = _psi_micro(base_hist, batch_hist)
        needs_retrain = psi > self.drift_threshold_micro
        version = self.table.upsert(spark, assigned, txn=txn)
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
            "n": sum(batch_hist),
            "psi_micro": psi,
            "needs_retrain": needs_retrain,
        }

    def refresh(self, spark: SparkSession, txn: dict | None = None) -> dict:
        """The drift-triggered retrain: re-fit centroids on the
        CURRENT table contents (same bounded-sample trainer) and
        re-assign everything as a new version. Prior versions stay
        readable — rollback from a bad retrain is a version pin."""
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
        version = self.table.overwrite(assigned, txn=txn)
        return {"version": version, "n": sum(base_hist), "psi_micro": 0}

    # -- query -------------------------------------------------------

    def topk(
        self,
        spark: SparkSession,
        queries: DataFrame,
        n_probe: int = 12,
        k: int = 10,
        query_id_col: str = "query_id",
        version: int | None = None,
    ) -> DataFrame:
        """Probe the standing index — the identical probe/rescore/rank
        tail as ``ivf_topk`` (shared ``_ivf_probe_topk``), reading the
        assignment table instead of re-deriving it. ``version`` pins a
        historical index state (time travel)."""
        centers, _ = self._load_model(spark)
        assigned = self.table.read(spark, version=version).select(
            "vec_id", "c_vec", "cell"
        )
        return _ivf_probe_topk(
            assigned,
            queries,
            centers,
            n_probe,
            k,
            query_id_col=query_id_col,
            vec_col=self.vec_col,
        )

    def drift_history(self, spark: SparkSession) -> DataFrame:
        """The per-add drift audit (version, batch_n, psi_micro,
        needs_retrain) — the monitoring feed a retrain scheduler
        consumes."""
        return spark.read.parquet(self.drift_path).drop("__epoch")

    # -- maintenance (the shared standing-index contract) --------------

    def delete(self, keys: DataFrame, txn: dict | None = None) -> dict:
        """Remove vectors from the standing index (corpus retention,
        takedown, re-crawl churn) — before this, a vector removed
        from the corpus stayed in the index forever and kept
        surfacing in ``topk``. One keyed ``delete_keys`` commit:
        touched buckets are a pure function of the ids (O(batch)
        bucket discovery, untouched buckets file-shared), prior
        versions stay time-travel readable, and the ``txn`` stamp
        makes a crash-replayed delete epoch skip cleanly.

        The model is untouched: the frozen quantizer and its base
        occupancy histogram describe the distribution the index was
        trained on, which deletion does not retrain away — a corpus
        whose composition drifts through heavy deletion flags on the
        NEXT add's PSI gate, and :meth:`refresh` resets both."""
        spark = keys.sparkSession
        version = self.table.delete_keys(
            spark, keys.select(F.col(self.id_col).alias("vec_id")), txn=txn
        )
        return {"version": version}

    def compact(self, spark: SparkSession, min_files: int = 2) -> int | None:
        """Fold upsert-accreted small files in the assignment table —
        content-identical (probe results invariant, pinned by test);
        every streaming add appends one file per touched bucket and
        this is the OPTIMIZE pass that heals the accretion."""
        return self.table.compact(spark, min_files=min_files)

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY of the assignment table (metadata-only):
        build/add/delete/compact commits with their txn stamps."""
        return self.table.history()

    def vacuum(self, keep_last: int = 2) -> list[str]:
        """Reclaim data files only pre-compact/pre-delete versions
        reference (VersionedTable.vacuum; txn stamps survive at any
        ``keep_last`` via the fold-forward map). Trades time-travel
        depth for disk — run after :meth:`compact` in the same
        maintenance window."""
        return self.table.vacuum(keep_last=keep_last)
