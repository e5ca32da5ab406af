from pyspark.sql import functions as F  # noqa: F401

from batch_processing_on_aws_spark.operators.versioned import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val string")


def _snap(spark, vt, version=None):
    return {
        (r["id"], r["val"]) for r in vt.read(spark, version).collect()
    }


def test_time_travel_upsert_and_rollback(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "t"), keys=["id"], n_buckets=4)
    v1 = vt.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    v2 = vt.upsert(spark, _df(spark, [(2, "B"), (4, "d")]))
    assert (v1, v2) == (1, 2)
    # latest sees the merge; v1 is untouched time travel
    assert _snap(spark, vt) == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
    assert _snap(spark, vt, 1) == {(1, "a"), (2, "b"), (3, "c")}
    # rollback restores v1's CONTENT as a new audited version
    v3 = vt.rollback(1)
    assert v3 == 3
    assert _snap(spark, vt) == _snap(spark, vt, 1)
    assert _snap(spark, vt, 2) == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_structural_file_sharing(spark, tmp_path):
    """An upsert touching one bucket must NOT rewrite the others: the
    child manifest shares the parent's files for untouched buckets —
    the Delta/Iceberg snapshot-sharing property at file granularity."""
    vt = VersionedTable(str(tmp_path / "t"), keys=["id"], n_buckets=8)
    vt.overwrite(_df(spark, [(i, f"v{i}") for i in range(40)]))
    m1 = vt._manifest(1)["buckets"]
    vt.upsert(spark, _df(spark, [(0, "NEW")]))  # touches 0's bucket only
    m2 = vt._manifest(2)["buckets"]
    shared = [b for b in m1 if m1[b] == m2.get(b)]
    changed = [b for b in m1 if m1[b] != m2.get(b)]
    assert len(changed) == 1          # exactly the touched bucket rewritten
    assert len(shared) == len(m1) - 1  # everything else file-shared


def test_upsert_idempotent_across_versions(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "t"), keys=["id"], n_buckets=4)
    vt.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    inc = [(2, "B"), (3, "c")]
    vt.upsert(spark, _df(spark, inc))
    vt.upsert(spark, _df(spark, inc))  # re-running the same increment
    assert _snap(spark, vt) == {(1, "a"), (2, "B"), (3, "c")}
    assert vt.latest_version() == 3    # audited as a (content-equal) version
    assert _snap(spark, vt, 2) == _snap(spark, vt, 3)


def test_vacuum_keeps_recent_versions_readable(spark, tmp_path):
    vt = VersionedTable(str(tmp_path / "t"), keys=["id"], n_buckets=4)
    vt.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    vt.upsert(spark, _df(spark, [(2, "B")]))
    vt.upsert(spark, _df(spark, [(1, "A")]))
    deleted = vt.vacuum(keep_last=2)
    assert vt.versions() == [2, 3]
    # kept versions still read correctly after the file reclaim
    assert _snap(spark, vt, 3) == {(1, "A"), (2, "B")}
    assert _snap(spark, vt, 2) == {(1, "a"), (2, "B")}
    assert deleted  # v1-only files were reclaimed
