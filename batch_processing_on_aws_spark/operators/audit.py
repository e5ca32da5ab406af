"""Data-quality audit operators (SURVEY.md §2.5 A1-A2; M7).

The reference profiles missing values with a one-pass conditional
count per column — ``count(when(isnan(c) | isNull(c), c))`` —
(reference: init-data-transformation.py:41,67-77) and eyeballs the
output. This engine keeps the single-pass shape (ONE hash aggregate,
partial+final, regardless of column count) and adds asserted
thresholds so the audit is a test, not a printout.

``isnan`` is only defined on float/double (SURVEY §1.3); for other
types only ``isNull`` applies — handled per-column here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _missing_pred(df: DataFrame, col: str) -> Column:
    dtype = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.isnan(c) | c.isNull()
    return c.isNull()


def missing_value_counts(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """A1 — per-column null/NaN counts in one aggregate pass."""
    cols = list(cols or df.columns)
    return df.agg(
        *[
            F.count(F.when(_missing_pred(df, c), c)).alias(c)
            for c in cols
        ]
    )


def missing_value_ratios(
    df: DataFrame, cols: Sequence[str] | None = None, decimals: int = 2
) -> DataFrame:
    """A2 — per-column missing ratio (reference: init-data-transformation.py:76
    computes count(when)/count(lit(1)) with F.round)."""
    cols = list(cols or df.columns)
    total = F.count(F.lit(1))
    return df.agg(
        *[
            F.round(
                F.count(F.when(_missing_pred(df, c), c)) / total, decimals
            ).alias(c)
            for c in cols
        ]
    )


def assert_max_missing_ratio(
    df: DataFrame, thresholds: dict[str, float]
) -> dict[str, float]:
    """Threshold-asserted audit: raise if any column's missing ratio
    exceeds its bound. Encodes the reference's manual '>70% null ⇒
    drop' rule (init-data-transformation.py:80-85) as a check."""
    ratios = missing_value_ratios(df, list(thresholds), decimals=6).collect()[0].asDict()
    bad = {c: r for c, r in ratios.items() if r is not None and r > thresholds[c]}
    if bad:
        raise AssertionError(f"missing-ratio thresholds exceeded: {bad}")
    return ratios


def drop_sparse_columns(df: DataFrame, max_missing_ratio: float = 0.7) -> DataFrame:
    """The reference's sparse-column drop (init-data-transformation.py:80-85),
    generalized: drop every column whose missing ratio exceeds the bound.
    One aggregate pass to decide, one projection to apply."""
    ratios = missing_value_ratios(df, decimals=6).collect()[0].asDict()
    keep = [c for c in df.columns if (ratios[c] or 0.0) <= max_missing_ratio]
    return df.select(*keep)
