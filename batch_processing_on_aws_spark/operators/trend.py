"""Per-group OLS trend from exact integer sums (extension surface;
metric drift / corpus-growth analytics).

``group_trend`` fits y = slope·x + intercept per group with the
closed-form least-squares solution, but accumulates every sufficient
statistic (n, Σx, Σy, Σx², Σy², Σxy) as BIGINT over integer-cast
inputs — the float enters exactly once, in the final division — so
the result is bit-portable across engines and partitionings (integer
addition is associative; a DOUBLE running sum would depend on task
order). This is the cross-engine-exactness pattern the golden-oracle
float traps taught (tests/test_golden_registry.py): the oracle
replays the same BIGINT sums and the same one-shot double expression.

Scale shape: one hash-aggregate over the grouped input — map-side
partial sums, no window, no second pass. Works for any "is this
metric trending" question over a keyed time series: events per day
per type, tokens per source per snapshot, dup-rate per crawl.

Bounds: inputs are cast to BIGINT; the BIGINT cross terms stay exact
while |n·Σxy| < 2⁶³ — with x pre-shifted to a small origin (day
index, not epoch-day) that holds to ~10¹⁸ row-units. The r² quotient
squares ``cov`` in DOUBLE (exact for |cov| < 2⁵³) to keep the
headroom.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col,
    y_col,
    out_prefix: str = "",
) -> DataFrame:
    """Per-group slope / intercept / r² of y over x.

    ``x_col`` / ``y_col`` are integer-valued columns (or expressions);
    rows where either is NULL are excluded (SQL regr_* convention).
    A single-point or zero-x-variance group yields NULL slope (the
    line is undefined); a zero-y-variance group yields NULL r².
    """
    g = list(group_cols)
    t = df.select(
        *g,
        F.col(x_col).cast("long").alias("__x")
        if isinstance(x_col, str)
        else x_col.cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y")
        if isinstance(y_col, str)
        else y_col.cast("long").alias("__y"),
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    agg = t.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
    )
    n = F.col("n_points")
    vx = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    vy = (n * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast("double")
    cov = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    slope = F.when(vx > 0, cov / vx)
    intercept = F.when(
        vx > 0,
        (F.col("__sy").cast("double") - (cov / vx) * F.col("__sx").cast("double"))
        / n.cast("double"),
    )
    r2 = F.when((vx > 0) & (vy > 0), (cov * cov) / (vx * vy))
    p = out_prefix
    return agg.select(
        *g,
        "n_points",
        F.round(slope, 6).alias(f"{p}slope"),
        F.round(intercept, 6).alias(f"{p}intercept"),
        F.round(r2, 6).alias(f"{p}r2"),
    )
