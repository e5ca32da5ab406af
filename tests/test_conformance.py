from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.conformance import (
    JOURNEY_SPEC,
    STATIONS_SPEC,
    ConformanceSpec,
    conform,
)


def test_rename_drop_cast_derive_single_projection(spark):
    df = spark.createDataFrame(
        [(1, "a", "2.5"), (2, "b", "3.5")], ["id", "name", "score"]
    )
    spec = ConformanceSpec(
        renames={"id": "key"},
        drops=("name",),
        casts={"score": "double", "score2x": "double"},
        derived={"score2x": F.col("score").cast("double") * 2},
    )
    out = conform(df, spec)
    assert out.columns == ["key", "score", "score2x"]
    rows = {r["key"]: r for r in out.collect()}
    assert rows[1]["score"] == 2.5 and rows[1]["score2x"] == 5.0
    # single Project node — no Exchange anywhere in the plan
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_journey_spec_matches_reference_shape(spark):
    # Raw journey header columns (FIXTURES.md §A1)
    df = spark.createDataFrame(
        [(10, 300, 5, "31/01/2021 13:05", 101, "A St", "31/01/2021 12:55", 100, "B St")],
        [
            "Rental Id", "Duration", "Bike Id", "End Date", "EndStation Id",
            "EndStation Name", "Start Date", "StartStation Id", "StartStation Name",
        ],
    )
    out = conform(df, JOURNEY_SPEC)
    assert out.columns == [
        "rental_id", "bike_id", "end_date", "end_station", "start_date", "start_station",
    ]


def test_stations_spec(spark):
    df = spark.createDataFrame(
        [(1, "Kings Cross", -0.1, 51.5, 530000.0, 182000.0)],
        ["Station.Id", "StationName", "longitude", "latitude", "easting", "northing"],
    )
    out = conform(df, STATIONS_SPEC)
    assert out.columns == [
        "station_id", "station_name", "longitude", "latitude", "easting", "northing",
    ]
