"""Hash-split/sample properties: determinism under repartitioning,
split disjointness/coverage, and approximate fractions."""

from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    train_val_test_split,
)


def _ids(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("k"))


def test_split_covers_and_partitions(spark):
    df = train_val_test_split(_ids(spark), "k", val_pct=10, test_pct=10)
    counts = {r["split"]: r["n"] for r in
              df.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    # md5 buckets are uniform: 10% targets land within a loose band
    assert 120 < counts["val"] < 280
    assert 120 < counts["test"] < 280


def test_split_stable_under_repartition(spark):
    df = _ids(spark)
    a = {(r["k"], r["split"]) for r in
         train_val_test_split(df, "k").collect()}
    b = {(r["k"], r["split"]) for r in
         train_val_test_split(df.repartition(13), "k").collect()}
    assert a == b


def test_hash_sample_is_subset_filter(spark):
    df = _ids(spark)
    pct10 = {r["k"] for r in hash_sample(df, "k", 10).collect()}
    pct20 = {r["k"] for r in hash_sample(df, "k", 20).collect()}
    # monotone: growing the fraction only ADDS rows (stable dev slices)
    assert pct10 <= pct20
    assert 100 < len(pct10) < 320


def test_bucket_matches_python_md5(spark):
    import hashlib

    rows = _ids(spark, 50).select(
        "k", hash_bucket(F.col("k"), 100).alias("b")
    ).collect()
    for r in rows:
        expect = int(hashlib.md5(str(r["k"]).encode()).hexdigest()[:8], 16) % 100
        assert r["b"] == expect, r
