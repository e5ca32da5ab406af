"""As-of (point-in-time) join — an operator Spark's join enum lacks.

Semantics: for each left row, attach the single right row with the
greatest ``right_ts`` ≤ ``left_ts`` (backward; ``strict`` ⇒ <) or the
smallest ``right_ts`` ≥ ``left_ts`` (forward), matched within equal
``on`` keys. Unmatched left rows survive with nulls (left-outer
semantics), mirroring pandas ``merge_asof`` / DuckDB ``ASOF LEFT
JOIN``.

Implementation is the scalable sort-based plan, not a per-key loop:
tag both inputs, union them, and run ONE window
(``partitionBy(on).orderBy(ts, side)`` with an unbounded-preceding
frame) carrying the right payload forward via ``last(ignorenulls)``.
Cost = one shuffle + sort of |L|+|R| rows on the join key — the same
exchange a sort-merge join would pay, with no build-side state and no
range explosion. Skewed keys amortize like any other window
(AQE-splittable at the exchange).

The reference has no as-of join (SURVEY.md §2.4: equi/anti only);
this is part of the extension surface for time-series / feature
pipelines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    strict: bool = False,
    payload: Sequence[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_matched",
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join. ``payload`` = right columns to attach (default:
    everything except the keys); each comes back as ``<name><suffix>``.

    With duplicate right timestamps inside a key, the winner is the
    row with the greatest ``tiebreak`` value (pass one for determinism
    — without it Spark's sort is free to order equal keys arbitrarily).

    ``tolerance`` (an interval Column, e.g. ``F.expr("INTERVAL 1
    DAY")``) voids matches whose timestamp lies further from the left
    row than the bound — the pandas ``merge_asof(tolerance=)``
    semantics; voided rows keep left-outer NULLs. Applied as a
    post-filter on the carried match, so the plan shape (one shuffle +
    one running window) is unchanged.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload_cols = (
        list(payload)
        if payload is not None
        else [c for c in right.columns if c not in keys]
    )

    l2 = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    r2 = (
        right.select(
            *keys,
            F.col(right_ts).alias("__ts"),
            # __bts rides along for the tolerance check; it is never
            # emitted (only payload_cols are selected at the end).
            F.struct(
                *[F.col(c) for c in payload_cols],
                F.col(right_ts).alias("__bts"),
            ).alias("__p"),
        )
        .withColumn("__side", F.lit(0))
    )
    unified = l2.unionByName(r2, allowMissingColumns=True)

    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    # Non-strict: right rows at an equal timestamp must be visible to
    # the left row's frame ⇒ sort right (side 0) first. Strict: sort
    # them after the left row so the running last() cannot see them.
    side_order = F.col("__side").desc() if strict else F.col("__side").asc()
    order = [ts_order, side_order]
    if tiebreak is not None:
        # Only right rows carry the tiebreak; make the preferred right
        # row the last one the frame sees.
        order.append(F.col("__p")[tiebreak].asc_nulls_first())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unified.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    if tolerance is None:
        out_cols = [
            F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in payload_cols
        ]
    else:
        if direction == "backward":
            in_tol = F.col("__m.__bts") >= F.col("__ts") - tolerance
        else:
            in_tol = F.col("__m.__bts") <= F.col("__ts") + tolerance
        out_cols = [
            F.when(in_tol, F.col(f"__m.{c}")).alias(f"{c}{suffix}")
            for c in payload_cols
        ]
    return matched.where(F.col("__side") == 1).select(*left.columns, *out_cols)
