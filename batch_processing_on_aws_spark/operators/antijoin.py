"""Anti-join / new-key discovery (SURVEY.md §2.4 J1; M3).

The reference finds journey stations missing from the stations
dimension with a SQL ``NOT IN`` subquery over two columns
(reference: journey-data-transformation.py:65-90). Catalyst plans
NOT IN as a *null-aware* anti join, which degrades to
BroadcastNestedLoopJoin when the key is nullable. The idiomatic engine
form is an explicit ``left_anti`` equi-join — identical results when
the dimension key contains no nulls (which the dimension load
guarantees), and it stays a broadcast/shuffled hash join at any scale.

At 100 TB: the dimension side is small (the reference's is 808 rows) →
broadcast; the fact side never shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unknown_keys(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Distinct ``fact_key`` values with no match in ``dim.dim_key``.

    Null fact keys are excluded up front — NOT IN's null semantics
    (null key ⇒ whole predicate unknown ⇒ row dropped) and left_anti's
    (null never matches ⇒ row kept) diverge exactly on them, so the
    explicit filter pins the reference's NOT IN behavior.
    """
    right = dim.select(F.col(dim_key).alias("__k")).where(F.col("__k").isNotNull())
    if broadcast_dim:
        right = F.broadcast(right)
    return (
        fact.select(F.col(fact_key))
        .where(F.col(fact_key).isNotNull())
        .distinct()
        .join(right, on=F.col(fact_key) == F.col("__k"), how="left_anti")
    )


def new_keys(
    fact: DataFrame,
    fact_keys: Sequence[str],
    dim: DataFrame,
    dim_key: str,
) -> DataFrame:
    """The reference's two-column variant: union the start/end station
    candidate sets, then anti-join the dimension
    (journey-data-transformation.py:65-90 — CTE + UNION + NOT IN).

    Returns one column named ``key``.
    """
    parts = [
        fact.select(F.col(k).alias("key")).where(F.col(k).isNotNull()).distinct()
        for k in fact_keys
    ]
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.union(p)
    cand = cand.distinct()  # SQL UNION semantics (dedup) — SURVEY §2.7 U1
    right = F.broadcast(
        dim.select(F.col(dim_key).alias("__k")).where(F.col("__k").isNotNull())
    )
    return cand.join(right, on=F.col("key") == F.col("__k"), how="left_anti")
