from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.dedup import (
    dedup_deterministic,
    dedup_exact,
)
from batch_processing_on_aws_spark.operators.setops import (
    union_all_by_name,
    union_distinct,
)


def test_union_distinct_vs_union_all(spark):
    """SQL UNION dedups; DataFrame.union does not — the semantics trap
    at reference journey-data-transformation.py:81 vs :147."""
    a = spark.createDataFrame([(1,), (2,)], ["k"])
    b = spark.createDataFrame([(2,), (3,)], ["k"])
    assert union_all_by_name(a, b).count() == 4
    assert union_distinct(a, b).count() == 3


def test_union_by_name_not_position(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "v"])
    b = spark.createDataFrame([("y", 2)], ["v", "k"])  # swapped order
    out = union_all_by_name(a, b).collect()
    assert {(r["k"], r["v"]) for r in out} == {(1, "x"), (2, "y")}


def test_dedup_deterministic_picks_declared_winner(spark):
    df = spark.createDataFrame(
        [(1, "old", 10), (1, "new", 20), (2, "only", 5)], ["k", "tag", "ts"]
    )
    out = dedup_deterministic(df, ["k"], [F.col("ts").desc()])
    rows = {r["k"]: r["tag"] for r in out.collect()}
    assert rows == {1: "new", 2: "only"}


def test_dedup_exact_subset(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["k", "v"])
    assert dedup_exact(df, ["k"]).count() == 2
    assert dedup_exact(df).count() == 3
