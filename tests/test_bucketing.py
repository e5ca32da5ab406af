"""Bucketed tables co-locate join keys at write time: a join between
two tables bucketed on the key plans with ZERO Exchange — at 100 TB
that's the difference between re-shuffling the fact table every run
and never shuffling it (pay the shuffle once at load, reuse forever).
"""

import pytest

from batch_processing_on_aws_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-based planning so the bucket effect is visible
    (tiny test tables would otherwise broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")

    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "orders_b"))
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "lineitem_b"))
        .mode("overwrite")
        .saveAsTable("lineitem_bucketed")
    )
    try:
        ob = spark.table("orders_bucketed")
        lb = spark.table("lineitem_bucketed")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        assert "SortMergeJoin" in plan

        # and the co-located join returns the same rows as the plain one
        plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_unbucketed_join_needs_exchange(spark, no_broadcast):
    """Control: the same join over plain parquet must shuffle both
    sides — this is the cost bucketing removes."""
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    joined = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
