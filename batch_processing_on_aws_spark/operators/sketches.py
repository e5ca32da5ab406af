"""Mergeable distinct-count sketches (extension surface; M-ops).

Incremental corpus statistics at 100 TB can't re-scan history: the
scale pattern is a MERGEABLE sketch per batch/partition — persist the
sketch, union sketches to answer "distinct across all batches so far"
in O(sketch) instead of O(data). Spark ships Apache DataSketches HLL
natively (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``, SQL functions since 3.5), so the whole path
stays JVM-side: one hash-agg producing a fixed-size binary per group,
then unions over those binaries.

vs ``approx_count_distinct``: that returns only the final number —
the sketch column is what makes the count COMPOSABLE (persist
per-source/per-day sketches, union any subset later: any
source-set × date-range distinct count without touching the data).

Estimates are implementation-defined (lgK-dependent), so the golden
query registers WITHOUT a DuckDB oracle (rows-only driver check);
the accuracy window is pinned by pytest against exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    key_col: str,
    group_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One row per group: (group, sketch, est_distinct). The sketch
    is the persistable artifact (write it next to the batch); the
    estimate is derived from it. ``lg_k=12`` ⇒ ~1.6 % relative
    standard error at 4 KiB per sketch."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch")
    ).select(
        group_col,
        "sketch",
        F.hll_sketch_estimate("sketch").alias("est_distinct"),
    )


def union_distinct_estimate(
    sketches: DataFrame,
    sketch_col: str = "sketch",
    allow_different_lg_k: bool = True,
) -> DataFrame:
    """Merge previously materialized sketches into one global distinct
    estimate — O(#sketches × sketch size) work, zero data re-scan.
    This is the query you run over a season of persisted per-batch
    sketches. ``allow_different_lg_k`` tolerates sketches built at
    different precisions (the union downgrades to the coarsest)."""
    return sketches.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(allow_different_lg_k))
        ).alias("est_distinct")
    )
