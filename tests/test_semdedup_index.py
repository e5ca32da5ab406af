"""Incrementally-maintained SemDeDup (operators/semdedup_index.py +
streaming wrapper): frozen-quantizer incremental folds, retroactive
retraction by smaller-id arrivals, re-delivery idempotency, and the
union-invariant that pins it all — flags after N deliveries equal the
one-shot drop rule over the union under the same frozen model."""

import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.semdedup_index import (
    SemDedupIndex,
)
from batch_processing_on_aws_spark.operators.similarity import _assign_cells


def _vectors(spark, n=80, dim=8, start_id=0):
    """Two well-separated blobs (k-means has real structure), plus
    per-row jitter so cosine neighborhoods are nontrivial."""
    rows = []
    for i in range(n):
        blob = 10.0 if i % 2 else 1.0
        vec = [
            blob + ((i * 7 + j * 13) % 17) / 17.0 for j in range(dim)
        ]
        rows.append((start_id + i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "semdedup_index")


def _flags(idx, spark):
    return {
        r["vec_id"]: r["kept"] for r in idx.audit(spark).collect()
    }


def test_incremental_equals_union_drop_rule(spark, root):
    """build(d1) + add(d2) == the one-shot drop rule over d1 ∪ d2
    under the SAME frozen quantizer (assign union with the index's
    model, drop iff some smaller-id same-cell neighbor in-ball)."""
    full = _vectors(spark, n=80)
    d1 = full.where(F.col("vec_id") < 40)
    d2 = full.where(F.col("vec_id") >= 40)
    idx = SemDedupIndex(root, n_cells=4, tau=0.95, n_train=32)
    idx.build(d1)
    idx.add(d2)

    centers, _ = idx._load_model(spark)
    assigned = _assign_cells(
        full.select("vec_id", F.col("embedding").alias("c_vec")), centers
    ).localCheckpoint(eager=True)
    dropped = {
        r["vec_id"]
        for r in SemDedupIndex._dropped_ids(
            assigned, assigned, idx.tau
        ).collect()
    }
    expected = {
        r["vec_id"]: r["vec_id"] not in dropped
        for r in assigned.select("vec_id").collect()
    }
    assert _flags(idx, spark) == expected and len(expected) == 80


def test_smaller_id_arrival_retracts_standing_survivor(spark, root):
    """The hard direction: delivery 2 brings a near-identical vector
    with a SMALLER id than a delivery-1 survivor — the survivor must
    flip kept→dropped (one-shot semantics over the union)."""
    d1 = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (20, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    idx = SemDedupIndex(root, n_cells=1, tau=0.9, n_train=8)
    idx.build(d1)
    assert _flags(idx, spark) == {10: True, 20: True}
    d2 = spark.createDataFrame(
        [(1, [1.0, 0.001, 0.0]), (30, [0.0, 1.0, 0.001])],
        "vec_id long, embedding array<double>",
    )
    idx.add(d2)
    # 1 shadows 10 (retraction); 30 is shadowed by 20 on arrival
    assert _flags(idx, spark) == {1: True, 10: False, 20: True, 30: False}


def test_dropped_rows_still_drop_larger_neighbors(spark, root):
    """SemDeDup's rule quantifies over ALL smaller-id neighbors: a
    row dropped by an even-smaller neighbor still drops ITS larger
    neighbors — dropped rows must remain comparators."""
    import math

    def at(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    # 1 at 0°, 2 at 18° (cos 0.951 ≥ τ: dropped by 1), 3 at 36°:
    # cos(3,1)=0.809 < τ but cos(3,2)=0.951 ≥ τ — 3 is in-ball ONLY
    # of the dropped row 2
    d1 = spark.createDataFrame(
        [(1, at(0)), (2, at(18))], "vec_id long, embedding array<double>"
    )
    idx = SemDedupIndex(root, n_cells=1, tau=0.95, n_train=8)
    idx.build(d1)
    d2 = spark.createDataFrame(
        [(3, at(36))], "vec_id long, embedding array<double>"
    )
    idx.add(d2)
    assert _flags(idx, spark) == {1: True, 2: False, 3: False}


def test_redelivery_is_idempotent(spark, root):
    full = _vectors(spark, n=40)
    d1 = full.where(F.col("vec_id") < 20)
    d2 = full.where(F.col("vec_id") >= 20)
    idx = SemDedupIndex(root, n_cells=2, tau=0.95, n_train=16)
    idx.build(d1)
    idx.add(d2)
    before = _flags(idx, spark)
    idx.add(d2)  # value-equal re-delivery
    assert _flags(idx, spark) == before
    assert idx.table.read(spark).count() == 40


def test_survivors_and_audit_shapes(spark, root):
    idx = SemDedupIndex(root, n_cells=2, tau=0.95, n_train=16)
    idx.build(_vectors(spark, n=30))
    audit = idx.audit(spark)
    assert audit.columns == ["vec_id", "cell", "kept"]
    surv = idx.survivors(spark)
    kept_ids = {r["vec_id"] for r in audit.where("kept").collect()}
    assert {r["vec_id"] for r in surv.collect()} == kept_ids


def test_delete_removes_rows(spark, root):
    idx = SemDedupIndex(root, n_cells=2, tau=0.95, n_train=16)
    idx.build(_vectors(spark, n=30))
    gone = spark.createDataFrame([(0,), (2,)], "vec_id long")
    idx.delete(gone)
    ids = {r["vec_id"] for r in idx.audit(spark).collect()}
    assert 0 not in ids and 2 not in ids and len(ids) == 28


def test_drift_gate_flags_shifted_batch(spark, root):
    """A delivery from a different distribution (all vectors shifted
    into one blob) must flag needs_retrain via the PSI gate — the
    frozen quantizer stops matching the data."""
    idx = SemDedupIndex(
        root, n_cells=4, tau=0.95, n_train=32,
        drift_threshold_micro=100_000,
    )
    idx.build(_vectors(spark, n=60))
    shifted = spark.createDataFrame(
        [(1000 + i, [50.0 + j for j in range(8)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    out = idx.add(shifted)
    assert out["needs_retrain"] and out["psi_micro"] > 100_000
    hist = idx.drift_history(spark).collect()
    assert any(r["needs_retrain"] for r in hist)


def test_refresh_retrains_and_recomputes_flags(spark, root):
    """After a drifted delivery, refresh() re-fits the quantizer on
    the CURRENT state and recomputes every flag with the one-shot
    drop rule under the new model — verified by recomputing that
    rule directly from the refreshed model."""
    idx = SemDedupIndex(root, n_cells=4, tau=0.95, n_train=64)
    idx.build(_vectors(spark, n=40))
    shifted = spark.createDataFrame(
        [(1000 + i, [50.0 + (i % 3) * 0.001 + j for j in range(8)])
         for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    out = idx.add(shifted)
    v = idx.refresh(spark)
    assert v["version"] > out["version"]

    centers, _ = idx._load_model(spark)
    state = idx.table.read(spark).select("vec_id", "c_vec")
    assigned = _assign_cells(state, centers).localCheckpoint(eager=True)
    dropped = {
        r["vec_id"]
        for r in SemDedupIndex._dropped_ids(
            assigned, assigned, idx.tau
        ).collect()
    }
    expected = {
        r["vec_id"]: r["vec_id"] not in dropped
        for r in assigned.select("vec_id").collect()
    }
    assert _flags(idx, spark) == expected
    # prior flags remain time-travel readable
    assert idx.table.read(spark, version=out["version"]).count() == 60


def test_vacuum_reclaims_and_flags_survive(spark, root):
    idx = SemDedupIndex(root, n_cells=2, tau=0.95, n_train=16, n_buckets=4)
    full = _vectors(spark, n=40)
    idx.build(full.where(F.col("vec_id") < 20))
    idx.add(full.where(F.col("vec_id") >= 20))
    before = _flags(idx, spark)
    idx.compact(spark)
    deleted = idx.vacuum(keep_last=1)
    assert deleted  # pre-compact files reclaimed
    assert _flags(idx, spark) == before


def test_stream_replay_skips_applied_epoch(spark, root, tmp_path):
    """The foreachBatch guard: an already-stamped epoch is skipped
    (apply() not re-run) — the exactly-once contract the stream
    wrapper provides."""
    idx = SemDedupIndex(root, n_cells=2, tau=0.95, n_train=16)
    idx.apply(_vectors(spark, n=20), txn={"app": "sx", "epoch": 0})
    v1 = idx.table.latest_version()
    assert idx.table.txn_applied("sx", 0)
    assert not idx.table.txn_applied("sx", 1)
    idx.apply(
        _vectors(spark, n=10, start_id=100), txn={"app": "sx", "epoch": 1}
    )
    assert idx.table.latest_version() == v1 + 1


# -- takedown-then-re-evaluate + hot-cell guard (round-13) -------------


def test_delete_recompute_resurfaces_shadowed_rows(spark, root):
    """The un-drop half of takedown: after deleting the smaller-id
    shadow WITH recompute, a row dropped solely because of it
    resurfaces; the default (no recompute) keeps the curation flag."""
    d1 = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (20, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    idx = SemDedupIndex(root, n_cells=1, tau=0.9, n_train=8)
    idx.build(d1)
    idx.add(spark.createDataFrame(
        [(1, [1.0, 0.001, 0.0])], "vec_id long, embedding array<double>"
    ))
    assert _flags(idx, spark) == {1: True, 10: False, 20: True}
    idx.delete(
        spark.createDataFrame([(1,)], "vec_id long"), recompute=True
    )
    # 1 gone; 10 had no other smaller-id in-ball neighbor -> kept again
    assert _flags(idx, spark) == {10: True, 20: True}


def test_delete_default_keeps_curation_flags(spark, root):
    """recompute=False (the routine-retention default) preserves the
    documented asymmetry: the shadowed row stays dropped."""
    d1 = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    idx = SemDedupIndex(root, n_cells=1, tau=0.9, n_train=8)
    idx.build(d1)
    idx.add(spark.createDataFrame(
        [(1, [1.0, 0.001, 0.0])], "vec_id long, embedding array<double>"
    ))
    idx.delete(spark.createDataFrame([(1,)], "vec_id long"))
    assert _flags(idx, spark) == {10: False}


def test_delete_recompute_only_touches_affected_cells(spark, root):
    """Flags outside the deleted vectors' cells are byte-identical
    after the recompute — the drop rule never crosses cells, so the
    cell-pruned pass must not rewrite them (checked via the audit
    AND via the state rows' full content)."""
    # two orthogonal blobs -> two cells under a 2-cell quantizer
    rows = [(i, [1.0 + i * 0.001, 0.0, 0.0]) for i in (1, 10)] + [
        (j, [0.0, 1.0 + j * 0.001, 0.0]) for j in (2, 20)
    ]
    d1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = SemDedupIndex(root, n_cells=2, tau=0.9, n_train=8)
    idx.build(d1)
    before = {
        (r["vec_id"], r["cell"], r["kept"])
        for r in idx.table.read(spark).collect()
    }
    cell_of = {r["vec_id"]: r["cell"] for r in idx.audit(spark).collect()}
    other_cell = {v for v in (2, 20)}
    idx.delete(
        spark.createDataFrame([(1,)], "vec_id long"), recompute=True
    )
    after = {
        (r["vec_id"], r["cell"], r["kept"])
        for r in idx.table.read(spark).collect()
    }
    # 10 resurfaces in its cell; 2/20's rows are exactly as before
    assert (10, cell_of[10], True) in after
    for v in other_cell:
        assert {t for t in before if t[0] == v} == {
            t for t in after if t[0] == v
        }


def test_delete_recompute_crash_between_commits(spark, root):
    """Sub-stamp crash contract: a crash between the flag-recompute
    commit and the delete commit re-runs to the same final state; a
    full replay skips without new versions."""
    from batch_processing_on_aws_spark.operators import versioned as V

    d1 = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (20, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    idx = SemDedupIndex(root, n_cells=1, tau=0.9, n_train=8)
    idx.build(d1)
    idx.add(spark.createDataFrame(
        [(1, [1.0, 0.001, 0.0])], "vec_id long, embedding array<double>"
    ))
    gone = spark.createDataFrame([(1,)], "vec_id long")

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
            idx.delete(gone, txn={"app": "td", "epoch": 0}, recompute=True)
        idx.delete(gone, txn={"app": "td", "epoch": 0}, recompute=True)
    finally:
        V.VersionedTable.delete_keys = real
    assert _flags(idx, spark) == {10: True, 20: True}
    v = idx.table.latest_version()
    idx.delete(gone, txn={"app": "td", "epoch": 0}, recompute=True)
    assert idx.table.latest_version() == v


def test_hot_cell_guard_trips_before_commit(spark, root):
    """A degenerate quantizer concentrating everything into one cell
    aborts add() loudly BEFORE any commit — the quadratic within-cell
    join never runs and the standing state is untouched."""
    d1 = _vectors(spark, n=8)
    idx = SemDedupIndex(
        root, n_cells=1, tau=0.95, n_train=8, max_cell_population=10
    )
    idx.build(d1)
    v = idx.table.latest_version()
    with pytest.raises(ValueError, match="max_cell_population"):
        idx.add(_vectors(spark, n=5, start_id=100))
    assert idx.table.latest_version() == v
    # a healthy-sized delivery still folds
    idx.add(_vectors(spark, n=1, start_id=200))
    assert idx.table.read(spark).count() == 9


def test_delete_recompute_of_absent_keys_is_noop(spark, root):
    """Takedown of keys that were never in the ledger: no cell is
    affected, flags are untouched, and the txn'd two-commit pass
    still replays cleanly (the recompute stamp is minted even for
    the empty cell set)."""
    idx = SemDedupIndex(root, n_cells=1, tau=0.9, n_train=8)
    idx.build(_vectors(spark, n=6))
    before = _flags(idx, spark)
    idx.delete(
        spark.createDataFrame([(999,)], "vec_id long"),
        txn={"app": "absent", "epoch": 0},
        recompute=True,
    )
    assert _flags(idx, spark) == before
    v = idx.table.latest_version()
    idx.delete(
        spark.createDataFrame([(999,)], "vec_id long"),
        txn={"app": "absent", "epoch": 0},
        recompute=True,
    )
    assert idx.table.latest_version() == v  # full replay skips


def test_hot_cell_guard_trips_on_build(spark, root):
    """The guard covers the FIRST delivery too (round-14): a fresh
    quantizer collapsing everything into one oversized cell aborts
    build() loudly before the quadratic compare — and before any
    commit, so the index simply does not exist afterwards."""
    idx = SemDedupIndex(
        root, n_cells=1, tau=0.95, n_train=8, max_cell_population=10
    )
    with pytest.raises(ValueError, match="max_cell_population"):
        idx.build(_vectors(spark, n=20))
    assert not idx.exists()


def test_untxnd_empty_recompute_mints_no_version(spark, root):
    """recompute_cells([]) without a txn skips the commit entirely —
    the empty upsert's only purpose is the replay stamp, so an
    untxn'd no-op must not churn a useless version (the TextIndex
    empty-delta convention). With a txn the stamp is still minted."""
    idx = SemDedupIndex(root, n_cells=1, tau=0.9, n_train=8)
    idx.build(_vectors(spark, n=6))
    v = idx.table.latest_version()
    idx.recompute_cells(spark, [])
    assert idx.table.latest_version() == v
    idx.recompute_cells(spark, [], txn={"app": "er", "epoch": 0})
    assert idx.table.latest_version() == v + 1
    assert idx.table.txn_applied("er", 0)
