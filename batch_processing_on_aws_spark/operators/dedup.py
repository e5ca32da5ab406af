"""Deduplication operators (SURVEY.md §2.5 A3-A4; M2).

The reference uses ``dropDuplicates([key])``
(reference: journey-data-transformation.py:102,150), which keeps an
*arbitrary* row per key — nondeterministic across runs/partitionings.
This engine makes the winner explicit: ``row_number() over (partition
by key order by tiebreak) = 1``. One shuffle on the key either way;
determinism is free.

At 100 TB: the window shuffles on ``keys`` exactly like dropDuplicates
would; skewed keys are handled by AQE skew-join/partition splitting.
For the common "latest record per entity" case, order by the event-time
column descending.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """A3 — whole-row (or subset) distinct. Hash aggregate with
    map-side partial aggregation; the direct analog of the reference's
    ``select distinct`` (journey-data-transformation.py:73-75)."""
    return df.distinct() if subset is None else df.dropDuplicates(list(subset))


def dedup_deterministic(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """A4, hardened — keep exactly one row per key, deterministically.

    ``order_by`` defines the winner (e.g. ``[F.col('ts').desc(),
    F.col('event_id').desc()]`` for last-write-wins). The tiebreak
    chain should reach a unique column so the result is total-ordered.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
