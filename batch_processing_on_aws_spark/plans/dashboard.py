"""The four dashboard questions (SURVEY.md §2.5 A5; M6).

The reference serves four analytical questions from Metabase over the
Redshift star schema (reference: README.md:35-41; join keys
CyclingERD.sql:60-68):

  Q1 average rentals per hour of day
  Q2 rentals by area (join the station dimension)
  Q3 rentals by day of week
  Q4 daily rentals across the year (trend)

Re-expressed over the synthetic star schema (FIXTURES.md §B):
``events`` plays the timestamped fact for Q1 (the only table with
intra-day times), ``orders ⋈ customer ⋈ nation ⋈ region`` plays
fact ⋈ dim_station for Q2, and ``orders`` / ``lineitem`` carry Q3/Q4.

Scale notes, per query, after reading the physical plans:
- dims (nation 25 / region 5 / customer 150·sf rows) are broadcast —
  no shuffle on the fact side for the joins.
- the aggregations are partial+final hash aggregates; the only full
  shuffles are on the (tiny) group keys.
- Q4's year filter pushes down to the parquet scan (PushedFilters on
  l_shipdate), so a 100 TB multi-year table reads ~one year.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources import load_table
from .tpch import money_sum


def q1_avg_events_per_hour(spark, sf_dir: str) -> DataFrame:
    """Q1 — two-level aggregate: count per (day, hour), then average
    per hour-of-day. The reference's 'average rentals per hour' is the
    same shape: count per (date, hour) from dim_datetime, then avg per
    hour (README.md:36, CyclingERD.sql:50-58)."""
    events = load_table(spark, sf_dir, "events")
    per_day_hour = events.groupBy(
        F.to_date("ts").alias("d"), F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        per_day_hour.groupBy("hour_of_day")
        .agg(F.round(F.avg("n"), 2).alias("avg_events"))
        .orderBy("hour_of_day")
    )


def q2_orders_by_region(spark, sf_dir: str) -> DataFrame:
    """Q2 — fact ⋈ dims rollup: order count and revenue by nation and
    region (the 'rentals per area' star join, README.md:37). Dims are
    broadcast explicitly; at sf100k customer would exceed the broadcast
    threshold and AQE would fall back to shuffle join on its own."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(nation.n_name.alias("nation"), region.r_name.alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("nation")
    )


def q3_orders_by_weekday(spark, sf_dir: str) -> DataFrame:
    """Q3 — count by day-of-week. Preserves Spark's 1=Sunday
    convention, which the reference's weekday chart depends on
    (journey-data-transformation.py:121; README.md:38)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.dayofweek("o_orderdate").cast("long").alias("week_day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("week_day")
    )


def q4_daily_shipments_1996(spark, sf_dir: str) -> DataFrame:
    """Q4 — daily trend across one year (README.md:39-41). The year
    predicate pushes down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy(F.to_date("l_shipdate").alias("ship_day"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("ship_day")
    )


def q4_rolling_7day(spark, sf_dir: str) -> DataFrame:
    """Q4b — 7-day rolling average of daily revenue: the 'trend'
    variant SURVEY §2.8 adds via a stock window (range-based frame over
    the daily rollup — the window input is already one row per day, so
    the frame is rows-based 6 preceding).

    Scale note: the window has no partitionBy, but its input is the
    per-day rollup — ≤366 rows regardless of fact size (the heavy
    aggregation below IS distributed). Calendar-bounded cardinality
    makes the single-partition window safe at any data scale; only a
    multi-decade frame would warrant partitioning by year with frame
    stitching."""
    from pyspark.sql import Window

    daily = q4_daily_shipments_1996(spark, sf_dir)
    w = Window.orderBy("ship_day").rowsBetween(-6, 0)
    # Average over the *double* cast of the exact cents values: the
    # ≤7-element window sums in frame order in both engines, and at
    # 4-decimal rounding a 2-decimal sum divided by k ≤ 7 can never
    # land on a rounding tie (terminating divisions stop at 4 decimals).
    return daily.select(
        "ship_day",
        "n_items",
        "revenue",
        F.round(F.avg(F.col("revenue").cast("double")).over(w), 4).alias(
            "revenue_7d_avg"
        ),
    ).orderBy("ship_day")
