"""Sessionization (extension surface; SURVEY.md §2.8 notes the
reference has no window/stateful ops — this is the engine's standard
event-analytics addition).

Gap-based sessions via the classic two-window plan:
lag(ts) per user → new-session flag on gap > threshold → running sum
of flags = session index. Both windows partition on ``user_id``, so
the whole operator costs ONE shuffle (the second window reuses the
first's partitioning; Catalyst plans a single Exchange).

Streaming twin: ``F.session_window(ts, gap)`` in a watermarked
streaming aggregate gives the same semantics incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign a per-user session_id (1-based, in time order).
    ``tiebreak_col`` makes the ordering total when timestamps can
    collide (determinism contract, as in operators/dedup.py)."""
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_s = gap_minutes * 60
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_s),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: bounds, event count, value sum, duration.
    GroupBy on (user, session) lands on the same partitioning as the
    sessionize windows — AQE/Catalyst avoid a second full shuffle.
    value sum is decimal-exact (accumulation-order independent)."""
    s = sessionize(events, gap_minutes, user_col, ts_col, tiebreak_col)
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("sum_value"),
            (
                F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
            ).alias("duration_s"),
        )
    )
