"""Source readers (SURVEY.md §2.1): CSV with explicit schema, JSON
with envelope-unnest (the reference's weather shape), schema-asserted
parquet loads."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from batch_processing_on_aws_spark.sources.readers import (
    load_table,
    read_csv,
    read_json,
)


def test_read_csv_explicit_schema(spark, tmp_path):
    p = tmp_path / "stations.csv"
    p.write_text("station_id,station_name,longitude,latitude\n"
                 "1,River Street,-0.1,51.5\n"
                 "2,Phillimore Gardens,-0.2,51.6\n")
    schema = T.StructType(
        [
            T.StructField("station_id", T.IntegerType()),
            T.StructField("station_name", T.StringType()),
            T.StructField("longitude", T.DoubleType()),
            T.StructField("latitude", T.DoubleType()),
        ]
    )
    df = read_csv(spark, str(p), schema=schema)
    assert df.schema == schema
    rows = {r["station_id"]: r["station_name"] for r in df.collect()}
    assert rows == {1: "River Street", 2: "Phillimore Gardens"}


def test_read_csv_inference_is_opt_in(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,2\n")
    # without schema or infer, columns come back as strings (no
    # surprise full-scan at 100 TB)
    df = read_csv(spark, str(p))
    assert [f.dataType for f in df.schema.fields] == [T.StringType()] * 2
    inferred = read_csv(spark, str(p), infer=True)
    assert isinstance(inferred.schema["a"].dataType, T.IntegerType)


def test_read_json_envelope_unnest(spark, tmp_path):
    """The reference extracts the weather envelope's `days` array in
    driver-side Python (init_0_ingestion_to_s3_dag.py:41-55); here the
    unnest runs distributed via explode."""
    p = tmp_path / "weather.json"
    envelope = {
        "queryCost": 1,
        "days": [
            {"datetime": "2021-01-01", "temp": 3.6},
            {"datetime": "2021-01-02", "temp": 4.1},
        ],
    }
    p.write_text(json.dumps(envelope))
    df = read_json(spark, str(p), explode_field="days")
    assert set(df.columns) == {"datetime", "temp"}
    assert df.count() == 2
    assert {r["datetime"] for r in df.collect()} == {"2021-01-01", "2021-01-02"}


def test_load_table_rejects_unknown(spark):
    with pytest.raises(KeyError):
        load_table(spark, "/root/testdata/sf0.001", "nope")


def test_load_table_converts_nanos(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    assert ev.count() > 0


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_table_normalizes_timestamp_arrival_types(spark, tmp_path, unit):
    """load_table's contract: declared TimestampType fields come out as
    TIMESTAMP regardless of how the parquet writer encoded them —
    INT64 TIMESTAMP(NANOS) (arrives as long under nanosAsLong) or
    TIMESTAMP(MICROS) without isAdjustedToUTC (arrives as
    TIMESTAMP_NTZ under inferTimestampNTZ). Both fixtures carry the
    same instant; under the UTC session tz the values must agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000], pa.timestamp(unit="us")).cast(
                pa.timestamp(unit)
            ),
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.5], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"), version="2.6")
    ev = load_table(spark, str(tmp_path), "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    [row] = ev.select(F.unix_micros("ts").alias("us")).collect()
    assert row["us"] == 1_700_000_000_000_000


def test_read_csv_failfast_raises_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("k,v\n1,a\nnot_an_int,b\n")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_csv(spark, str(p), schema=schema).collect()


def test_read_csv_permissive_quarantines(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("k,v\n1,a\nnot_an_int,b\n2,c\n")
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    df = read_csv(
        spark, str(p), schema=schema, mode="PERMISSIVE", corrupt_col="_bad"
    )
    rows = {r["k"]: (r["v"], r["_bad"]) for r in df.collect()}
    assert rows[1] == ("a", None) and rows[2] == ("c", None)
    # the malformed row survives with its raw line quarantined
    assert rows[None][1] == "not_an_int,b"


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    """ORC scan: schema round-trips and predicates reach the file
    source (same pushdown contract as parquet)."""
    from batch_processing_on_aws_spark.sources import read_orc

    path = str(tmp_path / "t.orc")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    ).write.orc(path)
    df = read_orc(spark, path).where(F.col("k") > 1)
    assert {r.v for r in df.collect()} == {"b", "c"}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,1)]" in plan


def test_pandas_round_trip_arrow(spark):
    """S8 — pandas → Spark → pandas round-trips values and dtypes
    through Arrow (reference Exploration.ipynb cells 4, 14)."""
    import pandas as pd

    from batch_processing_on_aws_spark.sources import from_pandas, to_pandas

    pdf = pd.DataFrame(
        {
            "k": pd.array([1, 2, 3], dtype="int64"),
            "v": ["a", "b", "c"],
            "x": [1.5, 2.5, float("nan")],
        }
    )
    df = from_pandas(spark, pdf)
    assert [f.name for f in df.schema.fields] == ["k", "v", "x"]
    back = to_pandas(df.orderBy("k"))
    assert back["k"].tolist() == [1, 2, 3]
    assert back["v"].tolist() == ["a", "b", "c"]
    assert back["x"][0] == 1.5 and pd.isna(back["x"][2])


def test_to_pandas_limit_guard(spark):
    from batch_processing_on_aws_spark.sources import to_pandas

    df = spark.range(10)
    with pytest.raises(ValueError, match="limit"):
        to_pandas(df, limit=5)
    assert len(to_pandas(df, limit=None)) == 10


def test_read_text_lines_and_whole(spark, tmp_path):
    """Raw text front door: per-line rows by default, one row per file
    in wholetext mode."""
    from batch_processing_on_aws_spark.sources import read_text

    (tmp_path / "a.txt").write_text("first line\nsecond line\n")
    (tmp_path / "b.txt").write_text("third line\n")
    lines = read_text(spark, str(tmp_path))
    assert lines.columns == ["value"]
    assert sorted(r["value"] for r in lines.collect()) == [
        "first line", "second line", "third line",
    ]
    whole = read_text(spark, str(tmp_path), whole=True)
    assert whole.count() == 2
    assert any("first line\nsecond line" in r["value"] for r in whole.collect())


def test_read_binary_files_glob_and_payload(spark, tmp_path):
    """binaryFile source: payload bytes intact, glob filters by name —
    the scan feeding the multimodal mapInPandas extractors."""
    from batch_processing_on_aws_spark.operators.multimodal import (
        extract_media_features,
    )
    from batch_processing_on_aws_spark.sources import read_binary_files
    from pyspark.sql import functions as F

    payload = bytes(range(256))
    (tmp_path / "x.bin").write_bytes(payload)
    (tmp_path / "skip.dat").write_bytes(b"nope")
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = df.collect()
    assert len(rows) == 1
    assert bytes(rows[0]["content"]) == payload
    assert rows[0]["length"] == 256
    # end-to-end into the multimodal extractor: binary scan -> features
    media = df.select(
        F.lit(1).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("content").alias("data"),
    )
    feats = extract_media_features(media).collect()
    assert feats[0]["n_bytes"] == 256
