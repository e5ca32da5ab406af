"""Datetime scalar functions (SURVEY.md §2.6, F1-F4).

The reference projects 7 datetime parts out of each journey timestamp
to build dim_datetime (reference: journey-data-transformation.py:117-140)
and parses 'dd/MM/yyy HH:mm' strings (:41-43 — note the 3-'y' pattern,
which Spark 2.4's legacy parser tolerated). We standardize on the
CORRECTED parser with a 4-'y' pattern and document the deviation.

``dayofweek`` follows Spark/ISO-SQL convention 1=Sunday..7=Saturday —
the reference's dashboard weekday chart depends on it
(journey-data-transformation.py:121, README.md:35-41). All parts are
cast to LongType for a stable cross-engine schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JOURNEY_TS_FORMAT = "dd/MM/yyyy HH:mm"

# name -> part extractor; order matches the reference's dim_datetime
# projection (journey-data-transformation.py:119-127).
_PARTS = {
    "second": F.second,
    "minute": F.minute,
    "hour": F.hour,
    "day": F.dayofmonth,
    "month": F.month,
    "week_day": F.dayofweek,  # 1 = Sunday
    "year": F.year,
}


def parse_timestamp(col: Column | str, fmt: str = JOURNEY_TS_FORMAT) -> Column:
    """F1 — to_timestamp with an explicit pattern (reference :41-43)."""
    return F.to_timestamp(F.col(col) if isinstance(col, str) else col, fmt)


def to_date_col(col: Column | str) -> Column:
    """F2/F4 — to_date (reference: journey-data-transformation.py:46)."""
    return F.to_date(F.col(col) if isinstance(col, str) else col)


def datetime_parts(
    df: DataFrame, ts_col: str, id_col: str = "datetime_id"
) -> DataFrame:
    """F3/P3 — project a timestamp into the dim_datetime shape:
    (datetime_id, second, minute, hour, day, month, week_day, year)
    (reference: journey-data-transformation.py:117-140; CyclingERD.sql:49-58).

    A narrow projection — no shuffle; Catalyst prunes the scan to
    ``ts_col`` alone.
    """
    c = F.col(ts_col)
    return df.select(
        c.alias(id_col),
        *[fn(c).cast("long").alias(name) for name, fn in _PARTS.items()],
    )
