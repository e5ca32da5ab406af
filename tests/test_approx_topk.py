"""Approximate distinct: bounded error vs exact. Top-k: plans as
TakeOrderedAndProject, not a global sort."""

from pyspark.sql import functions as F

from batch_processing_on_aws_spark.plans.golden import (
    approx_distinct_users,
    top_revenue_orders,
)
from batch_processing_on_aws_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_approx_distinct_within_tolerance(spark):
    # The query's own contract: HLL++ estimate within 5% of exact,
    # and the exact counts it reports agree with an independent agg.
    out = {
        r["event_type"]: (r["n_users_exact"], r["approx_within_5pct"])
        for r in approx_distinct_users(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(out) == set(exact)
    for k, n in exact.items():
        assert out[k][0] == n, (k, out[k], n)
        assert out[k][1], (k, out[k], n)


def test_topk_plans_as_take_ordered(spark):
    df = top_revenue_orders(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
