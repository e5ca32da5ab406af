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
  thousands of splits and the scan itself provides parallelism, so the
  default is ADAPTIVE: ``fan_out`` estimates the scan's split count
  from file metadata (Spark's own ``FilePartition`` packing formula —
  a driver-side calculation, no job) and becomes a no-op when the
  input already meets the cluster's ``defaultParallelism``. Callers
  can still force a width (``partitions=n``) or an unconditional
  no-op (``partitions=0``).
- ``size_output``: cap output file count before a write (the
  reference's K5 use case) — prefer ``coalesce`` (no shuffle) when
  reducing.

Why not probe ``df.rdd.getNumPartitions()``: with AQE enabled,
converting a DataFrame to an RDD materializes its shuffle stages —
the "probe" would execute the query. The metadata estimate below is
exact for the bare-scan inputs these operators receive and never
launches a job.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame

# analyzed-plan node classes that mean "the caller already chose a
# partitioning for this frame" — respect it, don't stack a second
# exchange (CollapseRepartition would merge them anyway, but the
# no-op keeps the contract visible in the plan)
_REPARTITION_NODES = {"Repartition", "RepartitionByExpression", "RebalancePartitions"}


def _bytes_conf(spark, key: str, default: int) -> int:
    raw = spark.conf.get(key, str(default))
    try:
        s = str(raw).strip().lower()
        for suffix, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
            if s.endswith(suffix):
                return int(float(s[: -len(suffix)]) * mult)
        return int(s)
    except (ValueError, TypeError):
        return default


def _caller_partitioned(df: DataFrame) -> bool:
    """True when the analyzed plan's top node is an explicit
    repartition/rebalance — i.e. the caller already picked a width."""
    try:
        node = df._jdf.queryExecution().analyzed().getClass().getSimpleName()
        return node in _REPARTITION_NODES
    except Exception:  # pragma: no cover - py4j shape drift
        return False


def scan_split_estimate(df: DataFrame) -> int | None:
    """Estimated partition count of ``df``'s file scan, from driver-side
    file metadata only (no job). Mirrors Spark's
    ``FilePartition.maxSplitBytes`` packing: splittable files are cut at
    ``min(maxPartitionBytes, max(openCostInBytes, totalBytes/parallelism))``
    and bin-packed. Returns None when the inputs aren't local files
    (remote object stores: fall back to the caller's policy rather than
    issue listing RPCs here)."""
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - e.g. pure in-memory relations
        return None
    if not files:
        return None
    sizes = []
    for uri in files:
        path = uri
        if path.startswith("file:"):
            path = path[len("file:") :]
            # file:///p and file:/p both normalize to /p
            while path.startswith("//"):
                path = path[1:]
        elif "://" in path:
            return None
        if not os.path.isfile(path):
            return None
        sizes.append(os.path.getsize(path))
    spark = df.sparkSession
    max_pb = _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    parallelism = max(1, spark.sparkContext.defaultParallelism)
    total = sum(s + open_cost for s in sizes)
    max_split = min(max_pb, max(open_cost, total // parallelism))
    if max_split <= 0:
        return 1
    return max(1, math.ceil(total / max_split))


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to the cluster's ``defaultParallelism``
    — ADAPTIVELY: a no-op when the input scan already yields at least
    that many splits (the 100-TB case), or when the caller already
    applied an explicit repartition/rebalance. Explicit ``partitions=n``
    forces a repartition to ``n``; ``partitions=0`` forces a no-op."""
    if partitions == 0:
        return df
    if partitions is not None:
        return df.repartition(partitions)
    target = df.sparkSession.sparkContext.defaultParallelism
    if getattr(df, "isStreaming", False):
        return df.repartition(target)
    if _caller_partitioned(df):
        return df
    est = scan_split_estimate(df)
    if est is not None and est >= target:
        return df
    return df.repartition(target)


def size_output(df: DataFrame, n_files: int) -> DataFrame:
    """Bound output file count before a write without a full shuffle."""
    return df.coalesce(n_files)
