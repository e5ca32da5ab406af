"""Slowly-changing-dimension (SCD Type 2) history builder —
extension surface; the warehouse-versioning primitive that turns a
keyed change stream into validity intervals.

``scd2_collapse(df, ...)`` takes observation rows
``(key, attrs..., ts)`` and emits one row per RUN of consecutive
equal attribute values per key: ``(key, attrs, valid_from, valid_to,
is_current)`` with half-open ``[valid_from, valid_to)`` intervals and
``valid_to IS NULL`` on the current row — the Kimball Type-2
dimension shape, built declaratively.

Plan shape: one shuffle on the key, then two window passes over the
SAME ``(key, ts)`` sort order (lag to find change points, lead for
interval ends — Spark reuses the sort between them), no self-join,
no explode. Scale: per-key history is processed sequentially, which
is inherent to run-length semantics; keys distribute freely, so the
operator is shuffle-bounded at any corpus size.

Determinism: duplicate observations at the same ``(key, ts)`` are
pre-collapsed to the row with the greatest ``tiebreak`` — without
this, which duplicate starts a run would depend on partition order.

NULL attribute values are compared null-safely (NULL == NULL is the
SAME value, so a run of NULLs is one interval, matching warehouse
practice).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Collapse a keyed observation stream into SCD2 intervals.

    Output columns: ``key_cols + attr_cols + [valid_from, valid_to,
    is_current]``; one row per maximal run of consecutive equal
    ``attr_cols`` values in ``ts_col`` order, ``valid_to`` = the next
    run's ``valid_from`` (NULL for the open current run).
    """
    keys = list(key_cols)
    attrs = list(attr_cols)

    # one observation per (key, ts): greatest tiebreak wins
    w_dedup = Window.partitionBy(*keys, ts_col).orderBy(F.col(tiebreak).desc())
    obs = (
        df.select(*keys, *attrs, ts_col, tiebreak)
        .withColumn("__rn", F.row_number().over(w_dedup))
        .where(F.col("__rn") == 1)
        .drop("__rn", *([tiebreak] if tiebreak not in attrs + keys else []))
    )

    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    changed = F.lit(False)
    for a in attrs:
        prev = F.lag(a).over(w)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    # the first row of a key has lag NULL for every attr; eqNullSafe
    # against a genuinely-NULL first value would wrongly read
    # "unchanged", so the row_number==1 case is forced to True.
    first = F.row_number().over(w) == 1
    starts = obs.withColumn("__chg", first | changed).where(F.col("__chg"))

    w2 = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    return (
        starts.select(
            *keys,
            *attrs,
            F.col(ts_col).alias(valid_from_col),
            F.lead(ts_col).over(w2).alias(valid_to_col),
        )
        .withColumn(current_col, F.col(valid_to_col).isNull())
    )
