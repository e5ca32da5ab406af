"""Lake layout: partition pruning reaches the scan, dynamic overwrite
replaces only touched partitions, compaction bounds file counts,
manifest diffing finds pending work."""

import glob
import os
import re

from pyspark.sql import functions as F

from batch_processing_on_aws_spark.sources.lake import (
    compact,
    manifest_from_links,
    pending_entries,
    read_pruned,
    write_partitioned,
)


def _events(spark, months=("2021-01", "2021-02", "2021-03")):
    rows = [(m, i, float(i)) for m in months for i in range(50)]
    return spark.createDataFrame(rows, "month string, id int, v double")


def test_partition_pruning_reaches_scan(spark, tmp_path):
    path = str(tmp_path / "lake")
    write_partitioned(_events(spark), path, ["month"])
    df = read_pruned(spark, path, month="2021-02")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the predicate lands in PartitionFilters (directory pruning), not
    # as a data filter, and the partition column leaves the file schema
    assert re.search(r"PartitionFilters: \[isnotnull\(month#\d+\), \(month#\d+ = 2021-02\)\]", plan), plan[:800]
    assert "DataFilters: []" in plan
    assert re.search(r"ReadSchema: struct<id:int,v:double>", plan)
    assert df.count() == 50


def test_dynamic_overwrite_touches_only_written_partition(spark, tmp_path):
    path = str(tmp_path / "lake2")
    write_partitioned(_events(spark), path, ["month"])
    # rewrite February with different values; Jan/Mar must survive
    feb = spark.createDataFrame(
        [("2021-02", 999, 1.0)], "month string, id int, v double"
    )
    write_partitioned(feb, path, ["month"], mode="overwrite")
    out = spark.read.parquet(path)
    assert out.where(F.col("month") == "2021-02").count() == 1
    assert out.where(F.col("month") == "2021-01").count() == 50
    assert out.where(F.col("month") == "2021-03").count() == 50


def test_compact_bounds_file_count(spark, tmp_path):
    path = str(tmp_path / "many")
    df = spark.range(1000).repartition(16)
    df.write.parquet(path)
    assert len(glob.glob(os.path.join(path, "*.parquet"))) >= 16
    compact(spark, path, target_files=2)
    assert len(glob.glob(os.path.join(path, "*.parquet"))) <= 2
    assert spark.read.parquet(path).count() == 1000


def test_manifest_pending_diff(spark):
    manifest = manifest_from_links(
        spark,
        {"05Jan2021": "https://x/1.csv", "12Jan2021": "https://x/2.csv",
         "19Jan2021": "https://x/3.csv"},
    )
    processed = spark.createDataFrame(
        [("05Jan2021",), ("12Jan2021",)], "logical_key string"
    )
    pending = pending_entries(manifest, processed).collect()
    assert [(r["logical_key"], r["source_url"]) for r in pending] == [
        ("19Jan2021", "https://x/3.csv")
    ]


def test_land_file_fetches_and_lands_atomically(tmp_path):
    from batch_processing_on_aws_spark.sources.lake import land_file

    src = tmp_path / "remote.csv"
    src.write_bytes(b"a,b\n1,2\n")
    dest = str(tmp_path / "lake" / "raw" / "landed.csv")
    out = land_file(src.as_uri(), dest)
    assert out == dest
    with open(dest, "rb") as f:
        assert f.read() == b"a,b\n1,2\n"
    # no landing temp left behind
    assert not os.path.exists(dest + ".__landing")
