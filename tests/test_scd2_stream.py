"""Streaming SCD2 dimension maintenance: real availableNow deliveries
into a VersionedTable must equal the one-shot batch collapse, with one
audited commit per non-empty epoch."""

import shutil
from datetime import datetime

import pytest
from pyspark.sql import types as T

from batch_processing_on_aws_spark.operators.scd import scd2_collapse
from batch_processing_on_aws_spark.operators.versioned import VersionedTable
from batch_processing_on_aws_spark.streaming.incremental import (
    ingest_scd2_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("tier", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("obs_id", T.LongType()),
    ]
)


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


ROWS = [
    (1, "a", _ts(1), 1),
    (2, "x", _ts(2), 2),
    (1, "a", _ts(3), 3),   # extends the run
    (1, "b", _ts(5), 4),
    (2, "x", _ts(6), 5),
    (3, "q", _ts(7), 6),   # new key in second delivery
    (1, "b", _ts(8), 7),
    (1, "c", _ts(9), 8),
]


def _rowset(df):
    return {
        (
            r["user_id"], r["tier"], r["valid_from"], r["valid_to"],
            r["is_current"], r["run_tiebreak"],
        )
        for r in df.collect()
    }


@pytest.fixture()
def scratch(tmp_path):
    root = str(tmp_path)
    yield {
        "in": f"{root}/in",
        "table": f"{root}/table",
        "ckpt": f"{root}/ckpt",
    }
    shutil.rmtree(root, ignore_errors=True)


def test_streamed_scd2_equals_batch_collapse(spark, scratch):
    d1 = [r for r in ROWS if r[2] < _ts(6)]
    d2 = [r for r in ROWS if r[2] >= _ts(6)]
    for delivery in (d1, d2):
        spark.createDataFrame(delivery, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(scratch["in"])
        ingest_scd2_stream(
            spark, scratch["in"], SCHEMA, scratch["table"],
            ["user_id"], ["tier"], "ts", "obs_id",
            scratch["ckpt"], n_buckets=4,
        )
    vt = VersionedTable(scratch["table"], keys=["user_id", "valid_from"])
    got = _rowset(vt.read(spark))
    want = _rowset(
        scd2_collapse(
            spark.createDataFrame(ROWS, SCHEMA),
            ["user_id"], ["tier"], "ts", "obs_id",
            tiebreak_out="run_tiebreak",
        )
    )
    assert got == want
    # one audited commit per non-empty delivery
    assert vt.latest_version() == 2
    # epoch stamps recorded: a crash-replay of either epoch is a no-op
    assert vt.txn_applied("scd2", 0) and vt.txn_applied("scd2", 1)


def test_streamed_scd2_intermediate_state_is_the_prefix_collapse(
    spark, scratch
):
    d1 = [r for r in ROWS if r[2] < _ts(6)]
    spark.createDataFrame(d1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(scratch["in"])
    ingest_scd2_stream(
        spark, scratch["in"], SCHEMA, scratch["table"],
        ["user_id"], ["tier"], "ts", "obs_id",
        scratch["ckpt"], n_buckets=4,
    )
    vt = VersionedTable(scratch["table"], keys=["user_id", "valid_from"])
    got = _rowset(vt.read(spark))
    want = _rowset(
        scd2_collapse(
            spark.createDataFrame(d1, SCHEMA),
            ["user_id"], ["tier"], "ts", "obs_id",
            tiebreak_out="run_tiebreak",
        )
    )
    assert got == want
    # time travel: after the second delivery, v1 still reads as this
    d2 = [r for r in ROWS if r[2] >= _ts(6)]
    spark.createDataFrame(d2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(scratch["in"])
    ingest_scd2_stream(
        spark, scratch["in"], SCHEMA, scratch["table"],
        ["user_id"], ["tier"], "ts", "obs_id",
        scratch["ckpt"], n_buckets=4,
    )
    assert _rowset(vt.read(spark, version=1)) == want


def test_streamed_scd2_run_merging_reobservation_leaves_no_stale_row(
    spark, scratch
):
    """The ADVICE round-8 hazard: a same-timestamp re-observation with
    a higher tiebreak whose value EQUALS the prior run's attrs merges
    two runs — the recompute has FEWER (key, valid_from) rows than
    stored. The commit must REPLACE the key's rows (replace_keys), not
    upsert-by-row-key, or the stale run start survives and the key
    ends up with two is_current rows."""
    d1 = [(1, "a", _ts(1), 1), (1, "b", _ts(2), 2)]
    # same ts as the 'b' run start, higher tiebreak, value back to 'a'
    # -> the collapse merges everything into ONE run [a: t1, ∞)
    d2 = [(1, "a", _ts(2), 3)]
    for delivery in (d1, d2):
        spark.createDataFrame(delivery, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(scratch["in"])
        ingest_scd2_stream(
            spark, scratch["in"], SCHEMA, scratch["table"],
            ["user_id"], ["tier"], "ts", "obs_id",
            scratch["ckpt"], n_buckets=4,
        )
    vt = VersionedTable(scratch["table"], keys=["user_id", "valid_from"])
    got = _rowset(vt.read(spark))
    want = _rowset(
        scd2_collapse(
            spark.createDataFrame(d1 + d2, SCHEMA),
            ["user_id"], ["tier"], "ts", "obs_id",
            tiebreak_out="run_tiebreak",
        )
    )
    assert got == want
    current = [r for r in vt.read(spark).collect() if r["is_current"]]
    assert len(current) == 1 and current[0]["tier"] == "a"


# ------------------------------------------- CDC -> SCD2 reconstruction

def test_scd2_from_table_history(spark, tmp_path):
    from pyspark.sql import functions as F

    from batch_processing_on_aws_spark.operators.scd import (
        scd2_from_table_history,
    )

    path = str(tmp_path / "t1table")
    vt = VersionedTable(path, keys=["k"], n_buckets=4)
    df = lambda rows: spark.createDataFrame(rows, "k long, tier string")  # noqa: E731
    vt.overwrite(df([(1, "a"), (2, "x"), (3, "m")]))          # v1
    vt.upsert(spark, df([(1, "b"), (4, "n")]))                 # v2: update+insert
    vt.delete(spark, F.col("k") == 2)                          # v3: delete
    vt.upsert(spark, df([(2, "y")]))                           # v4: re-insert
    hist = scd2_from_table_history(vt, spark, ["tier"])
    got = {
        (
            r["k"], r["tier"], r["is_deleted"],
            r["valid_from_version"], r["valid_to_version"], r["is_current"],
        )
        for r in hist.collect()
    }
    want = {
        (1, "a", False, 1, 2, False),
        (1, "b", False, 2, None, True),
        (2, "x", False, 1, 3, False),
        (2, None, True, 3, 4, False),
        (2, "y", False, 4, None, True),
        (3, "m", False, 1, None, True),
        (4, "n", False, 2, None, True),
    }
    assert got == want


def test_scd2_from_table_history_matches_snapshot_replay(spark, tmp_path):
    """Property: for every version v, the reconstruction's rows whose
    interval contains v (non-deleted) must equal read(version=v)."""
    from pyspark.sql import functions as F

    from batch_processing_on_aws_spark.operators.scd import (
        scd2_from_table_history,
    )

    path = str(tmp_path / "t1b")
    vt = VersionedTable(path, keys=["k"], n_buckets=4)
    df = lambda rows: spark.createDataFrame(rows, "k long, tier string")  # noqa: E731
    vt.overwrite(df([(i, f"t{i % 3}") for i in range(10)]))
    vt.upsert(spark, df([(i, f"u{i % 2}") for i in range(0, 10, 2)]))
    vt.delete(spark, F.col("k") % 3 == 0)
    vt.upsert(spark, df([(0, "z"), (11, "w")]))
    hist = scd2_from_table_history(vt, spark, ["tier"]).collect()
    for v in vt.versions():
        snap = {
            (r["k"], r["tier"]) for r in vt.read(spark, version=v).collect()
        }
        pit = {
            (r["k"], r["tier"])
            for r in hist
            if not r["is_deleted"]
            and r["valid_from_version"] <= v
            and (r["valid_to_version"] is None or v < r["valid_to_version"])
        }
        assert pit == snap, v


# ----------------------------------------- stream-static PIT enrichment

def test_stream_pit_enrich_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from batch_processing_on_aws_spark.operators.rangejoin import (
        interval_join,
    )
    from batch_processing_on_aws_spark.streaming.incremental import (
        stream_pit_enrich,
    )

    intervals = spark.createDataFrame(
        [
            (1, "bronze", _ts(1), _ts(5)),
            (1, "gold", _ts(5), None),
            (2, "silver", _ts(2), None),
        ],
        "user_id long, tier string, valid_from timestamp, valid_to timestamp",
    )
    pts_schema = "event_id long, user_id long, ts timestamp"
    points = [
        (1, 1, _ts(2)),
        (2, 1, _ts(6)),
        (3, 2, _ts(3)),
        (4, 3, _ts(4)),   # no interval: dropped in inner mode
        (5, 1, _ts(9)),
    ]
    d1, d2 = points[:3], points[3:]
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    pts_t = T.StructType.fromDDL(pts_schema)
    for delivery in (d1, d2):
        spark.createDataFrame(delivery, pts_t).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        stream_pit_enrich(
            spark, inp, pts_t, intervals,
            on=["user_id"], point_ts="ts",
            start_col="valid_from", end_col="valid_to",
            out_dir=out, checkpoint_dir=ckpt,
            open_end_ts=F.lit(_ts(31)),
        )
    got = {
        (r["event_id"], r["tier"])
        for r in spark.read.parquet(out).collect()
    }
    batch = interval_join(
        spark.createDataFrame(points, pts_t), intervals,
        on=["user_id"], point_ts="ts",
        start_col="valid_from", end_col="valid_to",
        bin_width_seconds=86400, open_end_ts=F.lit(_ts(31)),
    )
    want = {(r["event_id"], r["tier"]) for r in batch.collect()}
    assert got == want
    assert got == {(1, "bronze"), (2, "gold"), (3, "silver"), (5, "gold")}
