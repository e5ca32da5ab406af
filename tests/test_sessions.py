from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _events(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1.0),
        (2, "2024-01-01 10:10:00", 2.0),   # same session (10 min gap)
        (3, "2024-01-01 11:00:00", 3.0),   # 50 min gap → new session
        (4, "2024-01-01 09:00:00", 4.0),   # other user
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts string, value double"
    ).select(
        "event_id",
        F.to_timestamp("ts").alias("ts"),
        F.when(F.col("event_id") == 4, 99).otherwise(7).alias("user_id"),
        "value",
    )


def test_sessionize_gap_splits(spark):
    out = {r["event_id"]: r["session_id"]
           for r in sessionize(_events(spark), gap_minutes=30,
                               tiebreak_col="event_id").collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_session_stats(spark):
    stats = {(r["user_id"], r["session_id"]): r
             for r in session_stats(_events(spark), gap_minutes=30,
                                    tiebreak_col="event_id").collect()}
    s1 = stats[(7, 1)]
    assert s1["n_events"] == 2
    assert float(s1["sum_value"]) == 3.0
    assert s1["duration_s"] == 600
    assert stats[(7, 2)]["n_events"] == 1
    assert stats[(99, 1)]["n_events"] == 1


def test_sessionize_single_shuffle(spark):
    """Both windows + the rollup share the user_id partitioning — the
    plan must contain exactly one Exchange (scale contract)."""
    plan = session_stats(_events(spark), 30, tiebreak_col="event_id")
    physical = plan._jdf.queryExecution().executedPlan().toString()
    n_exchanges = physical.count("Exchange hashpartitioning")
    assert n_exchanges <= 1, physical
