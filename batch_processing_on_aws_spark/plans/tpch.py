"""TPC-H-shaped analytics over the synthetic tables.

These exercise the aggregate/join machinery the dashboard queries
don't: multi-aggregate scans (Q1 pricing summary), top-k per group
(window), and a selective join with pushdown. All group keys are
low-cardinality → the shuffles move only partial-aggregate rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources import load_table


def money_sum(expr, scale_in: int = 6, scale_out: int = 2):
    """Exact monetary sum: cast each term to DECIMAL before summing so
    the result is independent of accumulation order (a float sum's low
    bits depend on partitioning — unacceptable for a correctness
    contract), then round once to cents. Matches the DuckDB oracle
    bit-for-bit because decimal arithmetic is exact in both engines.

    The FINAL value is cast to double: a 2-dp amount below 2^53 maps to
    exactly one float64 in every engine, whereas decimal wire formats
    differ (Spark emits Decimal('41425.50'), DuckDB's pandas bridge
    emits 41425.5), which breaks representation-sensitive value hashes
    even when the numbers are equal. Exactness is preserved because the
    summation itself stays decimal; only the finished cents value is
    re-typed.
    """
    # round() before the final cast: both engines round decimals
    # HALF_UP, while a bare decimal→decimal CAST truncates in DuckDB.
    return F.round(F.sum(expr.cast(f"decimal(30,{scale_in})")), scale_out).cast(
        "double"
    )


def pricing_summary(spark, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one scan, 8 aggregates, two group keys.

    Whole-stage-codegen'd partial aggregation does the heavy lifting
    map-side; the final shuffle carries ≤ (flags × statuses) rows per
    partition. Monetary aggregates are rounded for stable cross-engine
    comparison.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_parts_per_brand(spark, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-K per group via row_number window — the deterministic-dedup
    machinery (operators/dedup.py) generalized to K>1. One shuffle on
    the partition key."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("price_rank", F.row_number().over(w).cast("long"))
        .where(F.col("price_rank") <= k)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "price_rank")
        .orderBy("p_brand", "price_rank")
    )


def priority_revenue(spark, sf_dir: str) -> DataFrame:
    """Selective fact-fact join: lineitem ⋈ orders with a date filter on
    the orders side, grouped by order priority (TPC-H Q4/Q12 flavor).

    orders is ~4× smaller than lineitem; at bench scale AQE picks a
    broadcast for the filtered side. The o_orderdate predicate pushes
    to the orders scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )
