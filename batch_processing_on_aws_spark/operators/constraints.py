"""Declarative data-quality constraints as DataFrame operators.

The reference enforces uniqueness and referential integrity only at
the warehouse boundary — Redshift PK/FK DDL (CyclingERD.sql:60-68) and
UPSERT keys — and its in-zone checks are manual notebook eyeballing
(SURVEY.md §5). This module makes those contracts first-class engine
operators: each check RETURNS the violating rows as a DataFrame (empty
⇒ pass), so callers can assert, quarantine, or route violations
without re-scanning.

Scale: every check is a single aggregate or join the optimizer already
knows how to distribute — uniqueness is a hash agg with map-side
partials, FK checks are broadcast anti-joins when the parent's key set
is small and shuffle anti-joins otherwise (AQE decides). Nothing
collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unique_violations(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key tuples appearing more than once, with their multiplicity —
    the engine-side statement of the warehouse PK contract."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > 1)
    )


def foreign_key_violations(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
) -> DataFrame:
    """Distinct child keys with no matching parent — the FK contract
    as a left-anti join (same plan family as the reference's NOT-IN
    new-station discovery, SURVEY §2.4 J1). Null FKs are not
    violations (SQL FK semantics: null references nothing)."""
    return (
        child.where(F.col(fk).isNotNull())
        .select(F.col(fk).alias("orphan_key"))
        .distinct()
        .join(
            parent.select(F.col(pk).alias("orphan_key")).distinct(),
            "orphan_key",
            "left_anti",
        )
    )


def accepted_values_violations(
    df: DataFrame, col: str, allowed: Sequence[str]
) -> DataFrame:
    """Distinct values outside the allowed domain (nulls excluded —
    pair with not_null_violations for presence)."""
    return (
        df.where(F.col(col).isNotNull())
        .where(~F.col(col).isin(list(allowed)))
        .select(F.col(col).alias("bad_value"))
        .distinct()
    )


def not_null_violations(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column null counts, only for columns that have any — one
    pass over the table (the audit-operator shape, SURVEY §2.5 A1)."""
    counts = df.agg(
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(c)
            for c in cols
        ]
    ).collect()[0]
    rows = [(c, int(counts[c])) for c in cols if counts[c]]
    return df.sparkSession.createDataFrame(
        rows or [], "column string, n_nulls long"
    )


def assert_constraints(
    checks: dict[str, DataFrame], max_show: int = 20
) -> None:
    """Run named violation checks; raise listing every non-empty one.
    The test-suite entry point for pipeline gates."""
    failures = {}
    for name, df in checks.items():
        rows = df.limit(max_show).collect()
        if rows:
            failures[name] = [r.asDict() for r in rows]
    if failures:
        raise AssertionError(f"constraint violations: {failures}")


def quarantine_split(
    df: DataFrame, rules: dict
) -> tuple[DataFrame, DataFrame]:
    """Route rows through named validity rules in ONE pass: returns
    ``(clean, quarantined)`` where quarantined rows carry a
    ``violations`` column naming every failed rule (comma-joined, in
    rule order) — the badRecordsPath / dead-letter pattern as an
    engine operator, composing with the checks above (which REPORT
    violations; this REMOVES them from the flow without losing them).

    NULL semantics: a rule whose predicate evaluates to NULL counts
    as a VIOLATION — a row that cannot prove validity is quarantined
    (the conservative mirror of ANSI DELETE, which KEEPS
    NULL-predicate rows precisely because it cannot prove the delete
    condition).

    Cross-engine: the violation tag is ``concat_ws`` over per-rule
    CASE names — both engines skip NULLs in concat_ws, so the tag
    (and the split) replays in SQL exactly. Plan shape: pure
    projections + filters over one scan, fused by codegen; the two
    sides are two filters of the same subtree, no shuffle anywhere.

    ``rules``: ``{name: Column}`` where the Column is the predicate a
    VALID row satisfies (insertion order = tag order).
    """
    checks = [
        F.when(
            ~F.coalesce(cond.cast("boolean"), F.lit(False)), F.lit(name)
        )
        for name, cond in rules.items()
    ]
    tagged = df.withColumn("violations", F.concat_ws(",", *checks))
    clean = tagged.where(F.col("violations") == "").drop("violations")
    quarantined = tagged.where(F.col("violations") != "")
    return clean, quarantined
