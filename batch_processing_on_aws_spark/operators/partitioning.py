"""Partitioning control (SURVEY.md §2.2 K5, generalized).

The reference hand-rolls output parallelism with a hardcoded
``repartition(10)`` (`airflow/dags/scripts/init-data-transformation.py:90`).
Our engine replaces the magic number with two explicit, documented
knobs:

- ``fan_out``: raise the parallelism of a *compute-heavy* projection
  whose upstream scan yields fewer partitions than cores. A single
  small parquet file (one row group) scans as ONE task, so an
  expensive per-row expression (shingling, hashing, cosine) serializes
  no matter how many cores exist. Round-robin repartitioning the
  narrow input first costs one shuffle of pointer-sized rows — trivial
  next to the compute it parallelizes. At 100 TB the lake has
  thousands of splits and the scan itself provides parallelism; then
  ``fan_out`` degrades to an unnecessary (but proportionally tiny)
  shuffle, or is skipped by passing ``partitions=0``.
- ``size_output``: cap output file count before a write (the
  reference's K5 use case) — prefer ``coalesce`` (no shuffle) when
  reducing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to ``partitions`` (default: the
    cluster's ``defaultParallelism``). ``partitions=0`` ⇒ no-op, for
    callers on already-well-partitioned inputs."""
    if partitions == 0:
        return df
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def size_output(df: DataFrame, n_files: int) -> DataFrame:
    """Bound output file count before a write without a full shuffle."""
    return df.coalesce(n_files)
