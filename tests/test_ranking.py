"""Scale-safe global ranking (operators/ranking.py): the two-pass
range-partitioned rank must (a) byte-match the global-window answer on
awkward inputs (ties, empty buckets, N not divisible by k), and (b)
plan ZERO unpartitioned windows — the single-reducer pattern it exists
to remove."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.ranking import (
    cume_dist_from_rn,
    global_row_numbers,
    ntile_from_rn,
    percent_rank_from_rn,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _tied_df(spark, n=501):
    # v has heavy ties (37 distinct values over 501 rows) so range
    # buckets must keep equal values together; id is the tie-breaker.
    rows = [((i * 7919) % 37 / 3.0, i) for i in range(n)]
    return spark.createDataFrame(rows, ["v", "id"])


@pytest.mark.parametrize("ascending", [True, False])
@pytest.mark.parametrize("k", [4, 7])
def test_matches_global_window(spark, ascending, k):
    df = _tied_df(spark)
    order = [
        F.col("v").asc() if ascending else F.col("v").desc(),
        F.col("id").asc(),
    ]
    ranked, n = global_row_numbers(
        df, "v", order, ascending=ascending, num_buckets=8
    )
    assert n == 501
    got = ranked.select(
        "id",
        F.col("__global_rn").alias("rn"),
        ntile_from_rn(F.col("__global_rn"), n, k).alias("tile"),
        F.round(percent_rank_from_rn(F.col("__global_rn"), n), 9).alias("pr"),
        F.round(cume_dist_from_rn(F.col("__global_rn"), n), 9).alias("cd"),
    )
    w = Window.orderBy(*order)
    want = df.select(
        "id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(k).over(w).cast("long").alias("tile"),
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_fewer_rows_than_tiles(spark):
    df = spark.createDataFrame([(1.0, 1), (2.0, 2)], ["v", "id"])
    ranked, n = global_row_numbers(
        df, "v", [F.col("v").asc(), F.col("id").asc()], num_buckets=4
    )
    got = {
        r["id"]: r["t"]
        for r in ranked.select(
            "id", ntile_from_rn(F.col("__global_rn"), n, 5).alias("t")
        ).collect()
    }
    assert got == {1: 1, 2: 2}  # tile == rn when N < k


def _window_nodes(df):
    """(class_name, partition_spec_size) for every window exec node."""
    out = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if "Window" in name and hasattr(node, "partitionSpec"):
            out.append((name, node.partitionSpec().size()))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        # AQE / query stages wrap their subtree in a field, not children
        for accessor in ("executedPlan", "initialPlan", "plan", "child"):
            try:
                walk(getattr(node, accessor)())
                break
            except Exception:
                pass

    walk(df._jdf.queryExecution().executedPlan())
    return out


def test_no_unpartitioned_window_in_quartiles_plan(spark):
    from batch_processing_on_aws_spark.plans.golden import QUERIES

    fn = {q.name: q.fn for q in QUERIES}["customer_spend_quartiles"]
    df = fn(spark, SF_SMOKE)
    nodes = _window_nodes(df)
    assert nodes, "expected a Window node in the plan"
    empty = [n for n, size in nodes if size == 0]
    assert not empty, f"single-reducer global window(s) back: {empty}"
