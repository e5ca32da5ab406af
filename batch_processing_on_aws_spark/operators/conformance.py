"""Conformance operators (SURVEY.md §2.3, P1-P8; M1).

The reference conforms each raw table to the warehouse DDL with ad-hoc
chains of withColumnRenamed / drop / cast / withColumn
(reference: init-data-transformation.py:32-35,55-61;
journey-data-transformation.py:38-46,95,110). Here the steps are data,
not code: a ``ConformanceSpec`` declares renames, drops, casts, and
derived columns, and ``conform`` applies them as ONE narrow projection —
a single Catalyst Project node, zero shuffles, column-pruned at the
scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ConformanceSpec:
    """Declarative rename/drop/cast/derive bundle.

    renames: raw name -> conformed name (P1)
    drops:   raw names to exclude (P2) — applied before renames
    casts:   conformed name -> Spark type string (P5)
    derived: new column name -> Column expression over RAW columns (P4)
    """

    renames: dict[str, str] = field(default_factory=dict)
    drops: tuple[str, ...] = ()
    casts: dict[str, str] = field(default_factory=dict)
    derived: dict[str, Column] = field(default_factory=dict)


def conform(df: DataFrame, spec: ConformanceSpec) -> DataFrame:
    """Apply a ConformanceSpec as a single select().

    Equivalent to the reference's rename→drop→cast→withColumn chains
    but emitted as one projection so the plan stays a single Project
    over the scan regardless of how many rules the spec carries.
    """
    cols: list[Column] = []
    for name in df.columns:
        if name in spec.drops:
            continue
        out = spec.renames.get(name, name)
        c = F.col(f"`{name}`")
        if out in spec.casts:
            c = c.cast(spec.casts[out])
        cols.append(c.alias(out))
    for out, expr in spec.derived.items():
        c = expr.cast(spec.casts[out]) if out in spec.casts else expr
        cols.append(c.alias(out))
    return df.select(*cols)


# Reference conformance specs, encoded verbatim -----------------------------

# Stations dim (reference: init-data-transformation.py:32-35).
STATIONS_SPEC = ConformanceSpec(
    renames={
        "Station.Id": "station_id",
        "StationName": "station_name",
    },
)

# Journey fact (reference: journey-data-transformation.py:38-46,110).
JOURNEY_SPEC = ConformanceSpec(
    renames={
        "Rental Id": "rental_id",
        "Bike Id": "bike_id",
        "End Date": "end_date",
        "EndStation Id": "end_station",
        "Start Date": "start_date",
        "StartStation Id": "start_station",
    },
    drops=("Duration", "EndStation Name", "StartStation Name"),
)
