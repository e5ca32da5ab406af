"""Range (interval) join via bucketed equi-join.

Semantics: pair (l, r) where ``l.on == r.on`` and ``r.ts`` falls in
``[l.ts + lower_s, l.ts + upper_s]`` (inclusive bounds, seconds).

A naive theta-join (``BETWEEN`` inside a non-equi condition) plans as
BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, hopeless at scale.
The standard distributed plan instead buckets time into windows of
width = interval span: every right row lands in one bucket, every
left row's interval overlaps at most two consecutive buckets, so an
equi-join on ``(key, bucket)`` generates a candidate set only a
constant factor above the true result, then an exact ``BETWEEN``
refine keeps true pairs. One shuffle on a well-distributed composite
key; no nested loop anywhere.

The reference has no range join (SURVEY.md §2.4); extension surface
for time-windowed attribution / feature generation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    lower_s: float,
    upper_s: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Sequence[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Inner range join; right payload columns return as
    ``<name><suffix>``. ``lower_s``/``upper_s`` bound
    ``r.ts - l.ts`` in seconds (e.g. ``(-3600, 0)`` = right events in
    the hour up to and including the left timestamp)."""
    if upper_s < lower_s:
        raise ValueError("upper_s must be >= lower_s")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = (
        list(payload)
        if payload is not None
        else [c for c in right.columns if c not in keys]
    )
    span_us = max(int((upper_s - lower_s) * 1_000_000), 1)
    lo_us = int(lower_s * 1_000_000)
    hi_us = int(upper_s * 1_000_000)

    # cast("timestamp") is a no-op on TIMESTAMP and an exact conversion
    # on TIMESTAMP_NTZ under the UTC session tz; unix_micros accepts
    # only TIMESTAMP.
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))

    l2 = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((l_us + F.lit(lo_us)) / F.lit(span_us)),
                F.floor((l_us + F.lit(hi_us)) / F.lit(span_us)),
            )
        ),
    ).withColumn("__l_us", l_us)
    r2 = right.select(
        *keys,
        F.floor(r_us / F.lit(span_us)).alias("__bucket"),
        r_us.alias("__r_us"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
    joined = l2.join(r2, on=[*keys, "__bucket"]).where(
        F.col("__r_us").between(
            F.col("__l_us") + F.lit(lo_us), F.col("__l_us") + F.lit(hi_us)
        )
    )
    return joined.drop("__bucket", "__l_us", "__r_us")
