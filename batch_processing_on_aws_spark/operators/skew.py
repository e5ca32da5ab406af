"""Skew mitigation: salted joins and two-phase aggregation.

At 100 TB a handful of hot keys (a viral document, a default user id,
an empty-string bucket) can put one reducer hours behind the rest.
AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
on in our session defaults) handles sort-merge joins transparently;
these operators cover the cases AQE cannot:

- ``salted_join``: hot-key join where the build side must be
  replicated. Left keys gain a random salt in [0, n); the right side
  is exploded n× with every salt value; the join runs on
  (key, salt) — each hot key now spreads over n reducers. Right-side
  replication costs n×|R| rows, so use it when R is the small side
  but too big (or too skewed) to broadcast outright.
- ``two_phase_agg``: aggregate by (key, salt) first, then re-aggregate
  by key. Spark's partial aggregation already gives map-side combine;
  the explicit two-phase form matters for aggregates whose partial
  state is large (collect_set, exact distinct) where one reducer
  would otherwise hold the whole hot key's state.

Random salts use a seeded ``rand`` so runs are reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add_salt(df: DataFrame, n_salts: int, seed: int = 42) -> DataFrame:
    """Uniform random salt column ``__salt`` in [0, n_salts)."""
    return df.withColumn(
        "__salt", (F.rand(seed) * n_salts).cast("int")
    )


def explode_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate every row once per salt value (build-side of a
    salted join)."""
    return df.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the left side salted and the right side
    replicated ``n_salts``×, spreading each hot key over ``n_salts``
    reducers. Results are identical to ``left.join(right, on, how)``
    for left-preserving equi-joins with deterministic inputs.

    Right-preserving joins (right/full outer) are rejected: the
    replicated right side would emit ``n_salts`` copies of every
    unmatched right key. Salt the right side instead, or broadcast.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "semi",
               "left_semi", "leftsemi", "anti", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is right-preserving; the replicated "
            "right side would duplicate unmatched right keys"
        )
    keys = [on] if isinstance(on, str) else list(on)
    l2 = add_salt(left, n_salts, seed)
    r2 = explode_salts(right, n_salts)
    return l2.join(r2, on=[*keys, "__salt"], how=how).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Aggregate by (keys, salt) then by keys. ``partial_aggs``
    produce intermediate columns; ``final_aggs`` combine them (e.g.
    partial ``sum(x) as s`` → final ``sum(s) as total``)."""
    keys = list(keys)
    salted = add_salt(df, n_salts, seed)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
