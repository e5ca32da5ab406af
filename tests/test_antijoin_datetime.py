from pyspark.sql import Row
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.functions.datetime_parts import (
    datetime_parts,
    parse_timestamp,
)
from batch_processing_on_aws_spark.operators.antijoin import new_keys, unknown_keys


def test_unknown_keys_basic_and_null_contract(spark):
    fact = spark.createDataFrame(
        [(1,), (2,), (3,), (None,), (3,)], "k: int"
    )
    dim = spark.createDataFrame([(1,), (2,)], "id: int")
    out = unknown_keys(fact, "k", dim, "id").collect()
    # 3 is unknown; null fact keys are excluded (NOT IN semantics:
    # a null key makes the predicate unknown → row dropped)
    assert [r["k"] for r in out] == [3]


def test_new_keys_two_columns_union_dedup(spark):
    """Reproduces the reference's start/end-station discovery
    (journey-data-transformation.py:65-90): union both key columns,
    dedup, anti-join the dimension."""
    fact = spark.createDataFrame(
        [(10, 20), (11, 10), (12, 20)], ["start", "end"]
    )
    dim = spark.createDataFrame([(10,), (11,)], ["station_id"])
    out = sorted(r["key"] for r in new_keys(fact, ["start", "end"], dim, "station_id").collect())
    assert out == [12, 20]


def test_equivalence_with_sql_not_in(spark):
    """The left_anti rewrite must equal Catalyst's NOT IN plan when the
    dim key is non-null — the J1 contract (SURVEY.md §2.4)."""
    fact = spark.createDataFrame([(i % 7,) for i in range(50)], "k: int")
    dim = spark.createDataFrame([(0,), (1,), (2,)], "id: int")
    fact.createOrReplaceTempView("t_fact")
    dim.createOrReplaceTempView("t_dim")
    via_sql = {
        r["k"]
        for r in spark.sql(
            "SELECT DISTINCT k FROM t_fact WHERE k NOT IN (SELECT id FROM t_dim)"
        ).collect()
    }
    via_op = {r["k"] for r in unknown_keys(fact, "k", dim, "id").collect()}
    assert via_op == via_sql == {3, 4, 5, 6}


def test_parse_timestamp_reference_format(spark):
    """'dd/MM/yyyy HH:mm' — the reference's journey format
    (journey-data-transformation.py:41-43, modulo its 3-'y' typo)."""
    df = spark.createDataFrame([("31/01/2021 13:05",)], ["s"])
    r = df.select(parse_timestamp("s").alias("ts")).collect()[0]
    assert (r["ts"].year, r["ts"].month, r["ts"].day, r["ts"].hour, r["ts"].minute) == (
        2021, 1, 31, 13, 5,
    )


def test_dayofweek_sunday_is_one(spark):
    """2021-01-31 was a Sunday; dim_datetime's week_day must be 1
    (CyclingERD.sql:56; dashboard Q3 depends on the convention)."""
    df = spark.createDataFrame([("2021-01-31 13:05:07",)], ["s"])
    parts = datetime_parts(df.select(F.to_timestamp("s").alias("ts")), "ts")
    row = parts.collect()[0]
    assert row["week_day"] == 1
    assert (row["second"], row["minute"], row["hour"]) == (7, 5, 13)
    assert (row["day"], row["month"], row["year"]) == (31, 1, 2021)
    assert parts.columns == [
        "datetime_id", "second", "minute", "hour", "day", "month", "week_day", "year",
    ]
