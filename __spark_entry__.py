"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``batch_processing_on_aws_spark``; this module
is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from batch_processing_on_aws_spark.plans import golden


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the dashboard-Q1 shape
    (average events per hour-of-day via a two-level aggregate —
    reference README.md:36)."""
    return golden.dashboard.q1_avg_events_per_hour(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return golden.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query."""
    return golden.oracle_sql()
