"""Optimistic-concurrency commits on VersionedTable (round-9 verdict
task 9): two writers that read the same parent version interleave —
disjoint-bucket upserts BOTH land via the bounded rebase-retry;
overlapping buckets and non-commutative interleaves fail loudly.
Exercised on both filesystem connectors (_LocalFS plain path,
_HadoopFS file:// URI)."""

import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.versioned import (
    VersionedTable,
)

TS = "2024-01-01T00:00:00+00:00"
N_BUCKETS = 8


def _table(spark, path):
    vt = VersionedTable(path, keys=["k"], n_buckets=N_BUCKETS)
    base = spark.createDataFrame(
        [(k, 0) for k in range(32)], "k long, v long"
    )
    assert vt.overwrite(base, committed_at=TS) == 1
    buckets = {
        r["k"]: r["b"]
        for r in base.select(
            "k", F.pmod(F.hash("k"), F.lit(N_BUCKETS)).alias("b")
        ).collect()
    }
    return vt, buckets


def _keys_in_distinct_buckets(buckets):
    """(key_a, key_b, key_b2): a and b in DIFFERENT buckets; b2 in
    the SAME bucket as a (b2 != a)."""
    by_bucket = {}
    for k, b in sorted(buckets.items()):
        by_bucket.setdefault(b, []).append(k)
    multi = [b for b, ks in sorted(by_bucket.items()) if len(ks) >= 2]
    assert multi, "fixture needs a bucket with two keys"
    ba = multi[0]
    key_a, key_b2 = by_bucket[ba][0], by_bucket[ba][1]
    bb = next(b for b in sorted(by_bucket) if b != ba)
    key_b = by_bucket[bb][0]
    return key_a, key_b, key_b2


def _stale_reader(vt, stale_version):
    """Make the NEXT latest_version() call on ``vt`` return a stale
    value (the interleave window: writer B read its parent before
    writer A committed); later calls — the rebase path — see the real
    listing."""
    calls = {"n": 0}
    real = VersionedTable.latest_version

    def fake():
        calls["n"] += 1
        return stale_version if calls["n"] == 1 else real(vt)

    vt.latest_version = fake
    return vt


def _upd(spark, key, val):
    return spark.createDataFrame([(key, val)], "k long, v long")


@pytest.mark.parametrize("fs_kind", ["local", "hadoop"])
def test_disjoint_upserts_both_land(spark, tmp_path, fs_kind):
    path = str(tmp_path / "t")
    if fs_kind == "hadoop":
        path = "file://" + path
    vt_a, buckets = _table(spark, path)
    key_a, key_b, _ = _keys_in_distinct_buckets(buckets)

    vt_b = _stale_reader(
        VersionedTable(path, keys=["k"], n_buckets=N_BUCKETS), 1
    )
    # writer A lands first; writer B (parent read = 1) collides on the
    # exclusive rename, rebases, retries, and lands as version 3
    assert vt_a.upsert(spark, _upd(spark, key_a, 100), committed_at=TS) == 2
    assert vt_b.upsert(spark, _upd(spark, key_b, 200), committed_at=TS) == 3

    final = {r["k"]: r["v"] for r in vt_a.read(spark).collect()}
    assert final[key_a] == 100  # A's write survived B's rebase
    assert final[key_b] == 200
    assert len(final) == 32
    assert sum(1 for v in final.values() if v == 0) == 30  # rest intact
    m = vt_a._manifest(3)
    assert m["parent"] == 2 and m["operation"] == "upsert"


@pytest.mark.parametrize("fs_kind", ["local", "hadoop"])
def test_overlapping_buckets_fail_loudly(spark, tmp_path, fs_kind):
    path = str(tmp_path / "t")
    if fs_kind == "hadoop":
        path = "file://" + path
    vt_a, buckets = _table(spark, path)
    key_a, _, key_b2 = _keys_in_distinct_buckets(buckets)

    vt_b = _stale_reader(
        VersionedTable(path, keys=["k"], n_buckets=N_BUCKETS), 1
    )
    assert vt_a.upsert(spark, _upd(spark, key_a, 100), committed_at=TS) == 2
    with pytest.raises(RuntimeError, match="rewrote bucket"):
        vt_b.upsert(spark, _upd(spark, key_b2, 999), committed_at=TS)
    # the loser left no committed version behind
    assert vt_a.latest_version() == 2
    final = {r["k"]: r["v"] for r in vt_a.read(spark).collect()}
    assert final[key_a] == 100 and final[key_b2] == 0


def test_non_commutative_interleave_fails_loudly(spark, tmp_path):
    path = str(tmp_path / "t")
    vt_a, buckets = _table(spark, path)
    _, key_b, _ = _keys_in_distinct_buckets(buckets)
    vt_b = _stale_reader(
        VersionedTable(path, keys=["k"], n_buckets=N_BUCKETS), 1
    )
    # A rewrites the whole table; B's survivors are stale however
    # disjoint its keys look
    base2 = spark.createDataFrame(
        [(k, 7) for k in range(32)], "k long, v long"
    )
    assert vt_a.overwrite(base2, committed_at=TS) == 2
    with pytest.raises(RuntimeError, match="non-commutative"):
        vt_b.upsert(spark, _upd(spark, key_b, 200), committed_at=TS)


def test_retry_budget_exhausts_loudly(spark, tmp_path):
    """Every retry collides again (an adversarial committer fills each
    next slot) — the bounded budget ends in the loud error, not an
    unbounded loop."""
    path = str(tmp_path / "t")
    vt_a, buckets = _table(spark, path)
    key_a, key_b, _ = _keys_in_distinct_buckets(buckets)
    vt_b = VersionedTable(path, keys=["k"], n_buckets=N_BUCKETS)

    real_commit = VersionedTable._commit

    def racing_commit(*args, **kwargs):
        # before B's every attempt, A sneaks in another commutative
        # commit so the target version is always taken
        vt_a.upsert(spark, _upd(spark, key_a, 1), committed_at=TS)
        return real_commit(*args, **kwargs)

    vt_b._commit = lambda *a, **kw: racing_commit(vt_b, *a, **kw)
    with pytest.raises(RuntimeError, match="NOT applied"):
        vt_b.upsert(spark, _upd(spark, key_b, 2), committed_at=TS)


def test_replace_keys_also_rebases(spark, tmp_path):
    path = str(tmp_path / "t")
    vt_a, buckets = _table(spark, path)
    key_a, key_b, _ = _keys_in_distinct_buckets(buckets)
    vt_b = _stale_reader(
        VersionedTable(path, keys=["k"], n_buckets=N_BUCKETS), 1
    )
    assert vt_a.upsert(spark, _upd(spark, key_a, 100), committed_at=TS) == 2
    v = vt_b.replace_keys(
        spark, _upd(spark, key_b, 300), match_cols=["k"], committed_at=TS
    )
    assert v == 3
    final = {r["k"]: r["v"] for r in vt_a.read(spark).collect()}
    assert final[key_a] == 100 and final[key_b] == 300
