"""Explicit schema registry.

The reference infers every schema at read time (``inferSchema=True`` —
reference: airflow/dags/scripts/init-data-transformation.py:23,
journey-data-transformation.py:28), which costs an extra full scan of
CSV input and is a correctness hazard. This engine declares every table
schema up front (SURVEY.md §1.2): inference stays available only as a
dev convenience on the CSV/JSON readers.

Two schema families live here:

1. ``TESTDATA`` — the driver's synthetic star-schema tables
   (/root/testdata/sf*/..., see TESTDATA.md) that the correctness
   harness and benchmarks run on.
2. Reference-domain raw schemas (journey / stations / weather) so the
   conformance operators can be tested against the exact shapes the
   reference ingests (FIXTURES.md §A).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# ---------------------------------------------------------------------------
# 1. Driver-provided synthetic tables (TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA: dict[str, T.StructType] = {
    "region": _struct(
        ("r_regionkey", T.IntegerType()),
        ("r_name", T.StringType()),
    ),
    "nation": _struct(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _struct(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _struct(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _struct(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _struct(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _struct(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampType()),
    ),
    "events": _struct(
        ("event_id", T.LongType()),
        ("ts", T.TimestampType()),
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
    "documents": _struct(
        ("doc_id", T.LongType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
        ("source", T.StringType()),
        ("n_chars", T.LongType()),
    ),
    "embeddings": _struct(
        ("vec_id", T.LongType()),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", T.IntegerType()),
    ),
}

TABLE_NAMES = tuple(TESTDATA)


# ---------------------------------------------------------------------------
# 2. Reference-domain raw schemas (FIXTURES.md §A; citations in reference)
# ---------------------------------------------------------------------------

# Weekly journey CSV — columns evidenced by the rename map
# (reference: journey-data-transformation.py:38) and drops (:110).
JOURNEY_RAW = _struct(
    ("Rental Id", T.LongType()),
    ("Duration", T.IntegerType()),
    ("Bike Id", T.IntegerType()),
    ("End Date", T.StringType()),  # 'dd/MM/yyyy HH:mm' → timestamp
    ("EndStation Id", T.IntegerType()),
    ("EndStation Name", T.StringType()),
    ("Start Date", T.StringType()),
    ("StartStation Id", T.IntegerType()),
    ("StartStation Name", T.StringType()),
)

# Docking-stations CSV (reference: init-data-transformation.py:32-35;
# CyclingERD.sql:16-23).
STATIONS_RAW = _struct(
    ("Station.Id", T.IntegerType()),
    ("StationName", T.StringType()),
    ("longitude", T.DoubleType()),
    ("latitude", T.DoubleType()),
    ("easting", T.DoubleType()),
    ("northing", T.DoubleType()),
)

# Daily-weather JSON after envelope unnest: one row per element of the
# raw object's `days` array (reference: init_0_ingestion_to_s3_dag.py:41-55).
# Kept columns mirror CyclingERD.sql:25-47; sparse columns the reference
# drops (init-data-transformation.py:82-85) are included so the audit
# operator has something to audit.
WEATHER_DAY = _struct(
    ("datetime", T.StringType()),  # ISO date string → weather_date
    ("tempmax", T.DoubleType()),
    ("tempmin", T.DoubleType()),
    ("temp", T.DoubleType()),
    ("feelslikemax", T.DoubleType()),
    ("feelslikemin", T.DoubleType()),
    ("feelslike", T.DoubleType()),
    ("humidity", T.DoubleType()),
    ("precip", T.DoubleType()),
    ("precipprob", T.DoubleType()),
    ("snow", T.DoubleType()),
    ("snowdepth", T.DoubleType()),
    ("windgust", T.DoubleType()),
    ("windspeed", T.DoubleType()),
    ("winddir", T.DoubleType()),
    ("pressure", T.DoubleType()),
    ("visibility", T.DoubleType()),
    ("solarradiation", T.DoubleType()),
    ("solarenergy", T.DoubleType()),
    ("uvindex", T.DoubleType()),
    ("sunrise", T.StringType()),
    ("sunset", T.StringType()),
    ("moonphase", T.DoubleType()),
    ("tzoffset", T.DoubleType()),
)

WEATHER_ENVELOPE = T.StructType(
    [
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("timezone", T.StringType(), True),
        T.StructField("days", T.ArrayType(WEATHER_DAY), True),
    ]
)
