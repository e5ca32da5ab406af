"""Stateful streaming sessionization via ``applyInPandasWithState``.

The batch twin (``operators.sessions``) assigns gap-based sessions
with one window pass; on an unbounded stream that window is
unbounded state. The streaming form keeps exactly ONE open session
per key in managed state, emits a session row whenever a gap closes
it, and lets a processing-time timeout flush sessions that go quiet —
the standard custom-stateful-operator shape Structured Streaming
offers Python (Arrow-batched, grouped state keyed by user).

Semantics vs the batch operator: identical session boundaries for
in-order input within a micro-batch run; out-of-order arrivals within
a batch are sorted before folding, across batches they extend or
close the open session in arrival order (streaming can't retro-split
an emitted session — the documented trade of online sessionization).

Scale: state is one small tuple per active key, partitioned by the
grouping key across executors; no global sort, no unbounded buffers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1_000)


def _fold_sessions(key, pdf_iter, state: GroupState, gap_s: float, timeout: bool):
    """Fold this batch's events (sorted by ts) into the open session;
    emit every session that a gap or timeout closes."""
    gap_us = int(gap_s * 1_000_000)
    (user_id,) = key
    closed: list[tuple] = []

    if timeout and state.hasTimedOut:
        if state.exists:
            s0, s1, n, sv = state.get
            closed.append((user_id, s0, s1, n, sv))
            state.remove()
    else:
        open_s = list(state.get) if state.exists else None
        for pdf in pdf_iter:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                t = _us(ts)
                if open_s is None:
                    open_s = [t, t, 0, 0.0]
                elif t - open_s[1] > gap_us:
                    closed.append((user_id, *open_s))
                    open_s = [t, t, 0, 0.0]
                open_s[1] = max(open_s[1], t)
                open_s[2] += 1
                open_s[3] += float(value)
        if open_s is not None:
            state.update(tuple(open_s))
            if timeout:
                state.setTimeoutDuration(int(gap_s * 1000))

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
                "sum_value": [round(c[4], 2) for c in closed],
            }
        )


def sessionize_stream(
    events: DataFrame, gap_minutes: float = 30.0, timeout: bool = False
) -> DataFrame:
    """Gap-closed session rows from a streaming events frame with
    columns (user_id, ts, value).

    ``timeout=True`` arms a processing-time timeout that flushes
    sessions which go quiet for the gap duration — use it ONLY with a
    continuous trigger: under ``trigger(availableNow=True)`` a pending
    timer keeps the drain loop alive with empty micro-batches until
    the wall-clock timeout fires, so the query never terminates.
    With ``timeout=False`` (default, the drain-and-stop shape) open
    sessions simply persist in checkpointed state for the next run —
    the same contract as the batch-incremental pipeline."""
    gap_s = gap_minutes * 60.0

    def fold(key, pdf_iter, state):
        yield from _fold_sessions(key, pdf_iter, state, gap_s, timeout)

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
