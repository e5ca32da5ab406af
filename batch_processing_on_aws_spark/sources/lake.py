"""Lake layout: Hive-partitioned writes, partition-pruned reads,
small-file compaction, and the ingestion manifest.

The reference lays its lake out by month (``raw/cycling-journey/
{MonYYYY}/``, proc_0_ingestion_to_s3_dag.py:17) but then scans it
with a ``*/*`` glob every week (journey-data-transformation.py:28) —
the whole history re-read per increment. The fix at scale is the
standard one: Hive-style partition columns so a partition predicate
prunes the scan to the touched directories (verify: the plan's
``PartitionFilters`` carries the predicate and ``ReadSchema`` drops
the partition column from file contents).

The manifest replaces ``links_dictionary.json``
(init_3_web_scraping_dag.py:89-98): the scrape/discovery control
plane emits {logical_key → source_url}; the engine diffs it against
the processed log with an anti-join to find pending work — the same
"what's new" question the reference answers by Airflow catchup
scheduling, asked of data instead of of a scheduler.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet write. ``overwrite`` replaces
    only the partitions present in ``df`` — the idempotent re-run
    shape. The dynamic mode is pinned as a write-level option so the
    contract holds on ANY session (a static overwrite on a foreign
    session would erase the partitions the increment didn't touch)."""
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_pruned(
    spark: SparkSession, path: str, **partition_values
) -> DataFrame:
    """Read with partition predicates applied immediately so Catalyst
    prunes directories before listing file contents."""
    df = spark.read.parquet(path)
    for col, val in partition_values.items():
        df = df.where(F.col(col) == F.lit(val))
    return df


def compact(
    spark: SparkSession,
    path: str,
    target_files: int,
    partition_cols: Sequence[str] | None = None,
) -> None:
    """Small-file compaction: rewrite a table (or its partitions) into
    ``target_files`` files each. Streaming/incremental appends leave
    file counts growing unboundedly; at scale, listing overhead and
    tiny-row-group reads dominate — periodic compaction restores scan
    efficiency. ``coalesce`` avoids a full shuffle."""
    df = spark.read.parquet(path).coalesce(target_files)
    tmp = path.rstrip("/") + "__compacting"
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    # atomic-ish swap via filesystem rename (object stores: copy+delete)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)


def land_file(url: str, lake_path: str, timeout: int = 60) -> str:
    """S5 — land one external file into the lake (reference:
    init_0_ingestion_to_s3_dag.py:85-88; proc_0_ingestion_to_s3_dag.py:
    37,67-74 fetch TfL extracts and push them to S3).

    Control-plane utility, deliberately driver-side: ingest fetches are
    few and sequential (one file per manifest entry), so distributing
    them buys nothing — the engine-side work starts at the scan. The
    write goes through a temp name + atomic rename so a half-fetched
    file is never visible to a concurrent scan. Returns the landed
    path. ``file://`` URLs work for tests/local lakes."""
    import os
    import shutil
    import urllib.request

    d = os.path.dirname(lake_path)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = lake_path + ".__landing"
    with urllib.request.urlopen(url, timeout=timeout) as r, open(tmp, "wb") as f:
        shutil.copyfileobj(r, f)
    os.replace(tmp, lake_path)
    return lake_path


def manifest_from_links(
    spark: SparkSession, links: Mapping[str, str]
) -> DataFrame:
    """Control-plane manifest: {logical_key: source_url} → DataFrame
    (the engine-side twin of the reference's links_dictionary.json)."""
    return spark.createDataFrame(
        [(k, v) for k, v in links.items()], "logical_key string, source_url string"
    )


def pending_entries(manifest: DataFrame, processed: DataFrame) -> DataFrame:
    """Manifest rows whose logical_key has not been processed yet —
    a left anti-join, the same shape as new-dimension-key discovery
    (SURVEY.md §2.4 J1)."""
    return manifest.join(
        processed.select("logical_key").distinct(), "logical_key", "left_anti"
    )
