"""Unit tests: as-of join and bucketed range join on literal frames."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.asof import asof_join
from batch_processing_on_aws_spark.operators.rangejoin import range_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 100.0),
            ("A", _ts("2024-01-01T10:00:05"), 101.0),
            ("A", _ts("2024-01-01T10:00:10"), 102.0),
            ("B", _ts("2024-01-01T10:00:03"), 50.0),
        ],
        "sym string, ts timestamp, px double",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:07"), 1),
            ("A", _ts("2024-01-01T10:00:05"), 2),  # equal to a quote ts
            ("B", _ts("2024-01-01T10:00:01"), 3),  # before any B quote
            ("C", _ts("2024-01-01T10:00:09"), 4),  # no quotes at all
        ],
        "sym string, ts timestamp, trade_id int",
    )


def test_asof_backward(spark, quotes, trades):
    out = asof_join(trades, quotes, on="sym", payload=["px", "ts"]).collect()
    got = {r["trade_id"]: (r["px_matched"], r["ts_matched"]) for r in out}
    assert got[1] == (101.0, _ts("2024-01-01T10:00:05"))  # latest <= 10:00:07
    assert got[2] == (101.0, _ts("2024-01-01T10:00:05"))  # equal ts matches
    assert got[3] == (None, None)  # left-outer: no earlier quote
    assert got[4] == (None, None)  # key absent entirely


def test_asof_backward_strict(spark, quotes, trades):
    out = asof_join(trades, quotes, on="sym", payload=["px"], strict=True).collect()
    got = {r["trade_id"]: r["px_matched"] for r in out}
    assert got[2] == 100.0  # equal ts excluded under strict <


def test_asof_forward(spark, quotes, trades):
    out = asof_join(trades, quotes, on="sym", payload=["px"], direction="forward").collect()
    got = {r["trade_id"]: r["px_matched"] for r in out}
    assert got[1] == 102.0  # earliest >= 10:00:07
    assert got[2] == 101.0  # equal ts matches forward too
    assert got[3] == 50.0


def test_asof_tiebreak(spark):
    left = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:00:10"))], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 1),
            ("A", _ts("2024-01-01T10:00:00"), 9),
        ],
        "k string, ts timestamp, v int",
    )
    out = asof_join(left, right, on="k", payload=["v"], tiebreak="v").collect()
    assert out[0]["v_matched"] == 9  # greatest tiebreak wins deterministically


def test_range_join_matches_theta_join(spark):
    import random

    rng = random.Random(7)
    rows = [
        ("u%d" % rng.randint(0, 5), _ts("2024-01-01T00:00:00"), i)
        for i in range(0, 0)
    ]
    left = spark.createDataFrame(
        [
            ("u%d" % rng.randint(0, 4), datetime.fromtimestamp(1704067200 + rng.randint(0, 7200)), i)
            for i in range(60)
        ],
        "k string, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [
            ("u%d" % rng.randint(0, 4), datetime.fromtimestamp(1704067200 + rng.randint(0, 7200)), i)
            for i in range(80)
        ],
        "k string, ts timestamp, rid int",
    )
    got = {
        (r["lid"], r["rid_r"])
        for r in range_join(
            left, right, on="k", lower_s=-600, upper_s=300, payload=["rid"]
        ).collect()
    }
    l, r = left.alias("l"), right.alias("r")
    expected = {
        (row["lid"], row["rid"])
        for row in l.join(
            r,
            (F.col("l.k") == F.col("r.k"))
            & (
                F.unix_micros(F.col("r.ts")).between(
                    F.unix_micros(F.col("l.ts")) - 600 * 1_000_000,
                    F.unix_micros(F.col("l.ts")) + 300 * 1_000_000,
                )
            ),
        )
        .select(F.col("l.lid"), F.col("r.rid"))
        .collect()
    }
    assert got == expected
    assert len(got) > 0


def test_asof_tolerance_voids_stale_matches(spark, quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", payload=["px", "ts"],
        tolerance=F.expr("INTERVAL 2 SECONDS"),
    ).collect()
    got = {r["trade_id"]: (r["px_matched"], r["ts_matched"]) for r in out}
    # trade 1 @10:00:07: nearest quote @10:00:05 is 2s back -> in tolerance
    assert got[1] == (101.0, _ts("2024-01-01T10:00:05"))
    # trade 2 @10:00:05: exact match, trivially in tolerance
    assert got[2] == (101.0, _ts("2024-01-01T10:00:05"))
    assert got[3] == (None, None)
    assert got[4] == (None, None)


def test_asof_tolerance_forward(spark, quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", payload=["px"], direction="forward",
        tolerance=F.expr("INTERVAL 1 SECOND"),
    ).collect()
    got = {r["trade_id"]: r["px_matched"] for r in out}
    assert got[1] is None      # next quote @10:00:10 is 3s ahead: voided
    assert got[2] == 101.0     # exact
    assert got[3] is None      # B quote @10:00:03 is 2s ahead: voided
