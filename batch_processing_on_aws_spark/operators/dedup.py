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


def bow_fingerprint(col: Column) -> Column:
    """Order-insensitive bag-of-words fingerprint: md5 of the sorted
    whitespace-token array. Catches shuffled/reordered near-copies
    that a raw-text md5 misses — the cheap middle ground between
    exact dedup and MinHash. Tokens are compared bytewise
    (``array_sort`` binary ordering), so the fingerprint is
    engine-portable for ASCII text."""
    from .textstats import tokens

    return F.md5(F.concat_ws(" ", F.array_sort(tokens(col))))


def dedup_against_ledger(
    batch: DataFrame,
    ledger: DataFrame,
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Cross-batch incremental dedup: drop every batch row whose
    fingerprint already appears in the seen-ledger (the standard
    ingest-time exact-dedup against all previously accepted data).

    LEFT ANTI join on the fingerprint — null-safe by construction
    (anti join drops only on MATCH; a null fingerprint never matches
    and survives to be handled by upstream validation). At 100 TB the
    ledger is a bucketed table on the fingerprint so the join
    co-locates without shuffling the ledger; the batch side shuffles
    O(batch), never O(ledger). New fingerprints append to the ledger
    afterwards via the merge writer (operators/merge.py), keeping the
    pass idempotent.
    """
    return batch.join(
        ledger.select(fingerprint_col), on=fingerprint_col, how="left_anti"
    )
