"""Streaming sessionization: gap-closed sessions emitted through a
real streaming query, matching the batch operator's boundaries."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts string, value double").select(
        "user_id", F.to_timestamp("ts").alias("ts"), "value"
    ).coalesce(1).write.mode("append").parquet(path)


def test_sessionize_stream_emits_closed_sessions(spark, tmp_path):
    from batch_processing_on_aws_spark.streaming.sessionize import (
        sessionize_stream,
    )

    inp = str(tmp_path / "ev")
    # user 1: two sessions separated by > 30 min; user 2: one session,
    # delivered out of order inside the batch
    _write(
        spark,
        inp,
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:10:00", 2.0),
            (1, "2024-01-01 01:00:00", 4.0),  # new session (50 min gap)
            (2, "2024-01-01 00:05:00", 8.0),
            (2, "2024-01-01 00:01:00", 16.0),  # out of order
        ],
    )
    stream = spark.readStream.schema(SCHEMA).parquet(inp)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from sessions_out").collect()
    # only user 1's FIRST session closed (a 50-min gap inside the
    # batch); the open sessions stay in state awaiting timeout
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1
    assert r["n_events"] == 2
    assert r["sum_value"] == 3.0
    assert (r["session_end"] - r["session_start"]).total_seconds() == 600


def test_sessionize_stream_batch_boundaries_match_batch_operator(spark, tmp_path):
    """Feed the same (in-order) events to the streaming and batch
    sessionizers; closed streaming sessions must agree with the batch
    rollup."""
    from batch_processing_on_aws_spark.operators.sessions import session_stats
    from batch_processing_on_aws_spark.streaming.sessionize import (
        sessionize_stream,
    )

    rows = [
        (7, "2024-01-01 00:00:00", 1.0),
        (7, "2024-01-01 00:20:00", 2.0),
        (7, "2024-01-01 02:00:00", 3.0),
        (7, "2024-01-01 02:10:00", 4.0),
        (7, "2024-01-01 05:00:00", 5.0),  # third session, stays open
    ]
    inp = str(tmp_path / "ev2")
    _write(spark, inp, rows)

    stream = spark.readStream.schema(SCHEMA).parquet(inp)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_cmp")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sessions_cmp").collect()
    }

    batch_events = spark.createDataFrame(
        [(uid, ts, i, v) for i, (uid, ts, v) in enumerate(rows)],
        "user_id long, ts string, event_id long, value double",
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "event_id", "value")
    batch = {
        (r["session_start"], r["session_end"], r["n_events"], float(r["sum_value"]))
        for r in session_stats(batch_events, gap_minutes=30).collect()
    }
    # every closed streaming session appears identically in the batch
    # result (the still-open third session is the expected difference)
    assert streamed <= batch
    assert len(streamed) == 2
