"""Set operations (SURVEY.md §2.7, U1-U2; M2).

Semantics trap the reference walks straight into: SQL ``UNION`` dedups
(journey-data-transformation.py:81) while ``DataFrame.union`` is UNION
ALL *by position* (:147). This engine exposes both with explicit names
and resolves columns by NAME, killing the positional-mismatch bug
class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all_by_name(*dfs: DataFrame) -> DataFrame:
    """U2 — UNION ALL, columns matched by name."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """U1 — SQL UNION (dedup). The distinct is a hash aggregate; at
    scale it shuffles on all columns, so project to the needed columns
    first."""
    return union_all_by_name(*dfs).distinct()
