"""Constraint checks and date-spine/gap-fill operators."""

import pytest
from pyspark.sql import functions as F

from batch_processing_on_aws_spark.operators.constraints import (
    accepted_values_violations,
    assert_constraints,
    foreign_key_violations,
    not_null_violations,
    unique_violations,
)
from batch_processing_on_aws_spark.operators.timeseries import (
    date_spine,
    densify_daily,
    fill_forward,
)


def test_unique_violations(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, v string")
    got = unique_violations(df, ["k"]).collect()
    assert [(r["k"], r["n_rows"]) for r in got] == [(1, 2)]


def test_fk_violations_null_fk_ok(spark):
    child = spark.createDataFrame([(1,), (3,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    got = {r["orphan_key"] for r in
           foreign_key_violations(child, parent, "fk", "pk").collect()}
    assert got == {3}  # null fk is not a violation


def test_accepted_and_not_null(spark):
    df = spark.createDataFrame(
        [("O",), ("F",), ("X",), (None,)], "status string"
    )
    bad = {r["bad_value"] for r in
           accepted_values_violations(df, "status", ["O", "F", "P"]).collect()}
    assert bad == {"X"}
    nulls = {(r["column"], r["n_nulls"]) for r in
             not_null_violations(df, ["status"]).collect()}
    assert nulls == {("status", 1)}


def test_assert_constraints_raises_with_names(spark):
    df = spark.createDataFrame([(1,), (1,)], "k long")
    with pytest.raises(AssertionError, match="pk_unique"):
        assert_constraints({"pk_unique": unique_violations(df, ["k"])})
    # empty checks pass silently
    assert_constraints({"ok": unique_violations(df.distinct(), ["k"])})


def test_spine_densify_fill(spark):
    daily = spark.createDataFrame(
        [("2024-01-01", 2, 10.0), ("2024-01-04", 1, 40.0)],
        "day string, n long, rev double",
    ).select(F.col("day").cast("date").alias("day"), "n", "rev")
    assert date_spine(spark, "2024-01-01", "2024-01-05").count() == 5
    dense = densify_daily(daily, "2024-01-01", "2024-01-05", zero_fill=("n",))
    filled = {
        str(r["day"]): (r["n"], r["rev"])
        for r in fill_forward(dense, ("rev",), bounded_input=True).collect()
    }
    assert filled == {
        "2024-01-01": (2, 10.0),
        "2024-01-02": (0, 10.0),  # zero-filled count, carried revenue
        "2024-01-03": (0, 10.0),
        "2024-01-04": (1, 40.0),
        "2024-01-05": (0, 40.0),
    }


def test_fill_forward_keyed_partitions(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("b", 1, None), ("b", 2, 5.0)],
        "k string, t long, v double",
    )
    got = {(r["k"], r["t"]): r["v"] for r in
           fill_forward(df, ("v",), order_col="t", partition_cols=("k",)).collect()}
    assert got == {("a", 1): 1.0, ("a", 2): 1.0,
                   ("b", 1): None, ("b", 2): 5.0}  # no cross-key leakage


# ------------------------------------------------------- interpolation

def test_interpolate_linear_basic(spark):
    from batch_processing_on_aws_spark.operators.timeseries import (
        interpolate_linear,
    )

    df = spark.createDataFrame(
        [
            ("a", 0, 10.0),
            ("a", 1, None),
            ("a", 2, None),
            ("a", 3, 40.0),
            ("a", 4, None),   # trailing: stays NULL
            ("b", 0, None),   # leading: stays NULL
            ("b", 1, 5.0),
            ("b", 3, 9.0),
        ],
        "k string, x long, y double",
    )
    out = {
        (r["k"], r["x"]): r["y"]
        for r in interpolate_linear(
            df, "y", "x", partition_cols=("k",)
        ).collect()
    }
    assert out[("a", 0)] == 10.0
    assert out[("a", 1)] == 20.0
    assert out[("a", 2)] == 30.0
    assert out[("a", 3)] == 40.0
    assert out[("a", 4)] is None
    assert out[("b", 0)] is None
    assert out[("b", 1)] == 5.0
    assert out[("b", 3)] == 9.0


def test_interpolate_linear_uneven_spacing_and_round(spark):
    from batch_processing_on_aws_spark.operators.timeseries import (
        interpolate_linear,
    )

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 3, None), ("a", 7, 2.0)],
        "k string, x long, y double",
    )
    out = {
        r["x"]: r["y"]
        for r in interpolate_linear(
            df, "y", "x", partition_cols=("k",), round_digits=6
        ).collect()
    }
    assert out[3] == round(1.0 + (2.0 - 1.0) * 3 / 7, 6)


def test_interpolate_linear_observed_values_untouched(spark):
    """Observed points pass through even when neighbours would give a
    different line; only NULLs are synthesized."""
    from batch_processing_on_aws_spark.operators.timeseries import (
        interpolate_linear,
    )

    df = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 1, 100.0), ("a", 2, 0.0)],
        "k string, x long, y double",
    )
    out = {
        r["x"]: r["y"]
        for r in interpolate_linear(df, "y", "x", ("k",)).collect()
    }
    assert out == {0: 0.0, 1: 100.0, 2: 0.0}


def test_interpolate_linear_duplicate_x_with_observation(spark):
    """A NULL row sharing x with an observed row resolves to that
    observation (0/0 guard), not a divide-by-zero NULL/NaN."""
    from batch_processing_on_aws_spark.operators.timeseries import (
        interpolate_linear,
    )

    df = spark.createDataFrame(
        [("a", 5, None), ("a", 5, 7.0)], "k string, x long, y double"
    )
    rows = interpolate_linear(df, "y", "x", ("k",)).collect()
    assert sorted(r["y"] for r in rows) == [7.0, 7.0]


# ---------------------------------------------------- multires rollup

def test_multires_rollup_merge_equals_direct(spark):
    """Every coarser level, computed by merging the finer level's
    partials, must equal aggregating the raw data directly at that
    grain — the losslessness that makes partial reuse legitimate."""
    import hashlib
    from datetime import datetime

    from pyspark.sql import functions as F

    from batch_processing_on_aws_spark.operators.timeseries import (
        multires_rollup,
    )

    def u(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    rows = [
        (
            "g" + str(u(f"g{i}") % 3),
            datetime(2024, 1 + u(f"m{i}") % 3, 1 + u(f"d{i}") % 28, u(f"h{i}") % 24, u(f"mi{i}") % 60),
            u(f"v{i}") % 1000,
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v long")
    out = multires_rollup(
        df,
        "ts",
        {
            "n": (None, "count"),
            "v_sum": ("v", "sum"),
            "v_min": ("v", "min"),
            "v_max": ("v", "max"),
        },
        levels=("hour", "day", "month"),
        group_cols=("g",),
    )
    got = {
        (r["level"], r["g"], r["bucket"]): (
            r["n"], r["v_sum"], r["v_min"], r["v_max"]
        )
        for r in out.collect()
    }
    for lvl in ("hour", "day", "month"):
        direct = df.groupBy(
            "g", F.date_trunc(lvl, "ts").alias("bucket")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").alias("v_sum"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        )
        want = {
            (lvl, r["g"], r["bucket"]): (
                r["n"], r["v_sum"], r["v_min"], r["v_max"]
            )
            for r in direct.collect()
        }
        assert {k: v for k, v in got.items() if k[0] == lvl} == want, lvl


def test_multires_rollup_rejects_non_mergeable(spark):
    from batch_processing_on_aws_spark.operators.timeseries import (
        multires_rollup,
    )

    df = spark.createDataFrame([("a", None, 1)], "g string, ts timestamp, v long")
    with pytest.raises(ValueError, match="mergeable"):
        multires_rollup(df, "ts", {"m": ("v", "median")})


# ----------------------------------------------------- rolling z-score

def test_rolling_zscore_matches_python(spark):
    import math

    from batch_processing_on_aws_spark.operators.timeseries import (
        rolling_zscore,
    )

    ys = [10, 12, 11, 9, 10, 11, 10, 12, 50, 10]  # index 8 spikes
    df = spark.createDataFrame(
        [("a", i, y) for i, y in enumerate(ys)], "k string, x long, y long"
    )
    out = {
        r["x"]: (r["z_micro"], r["is_anomaly"])
        for r in rolling_zscore(
            df, "y", "x", ("k",), window=24, min_points=4
        ).collect()
    }
    for i, y in enumerate(ys):
        hist = ys[max(0, i - 24):i]
        n, s1, s2 = len(hist), sum(hist), sum(v * v for v in hist)
        if n < 4 or n * s2 - s1 * s1 <= 0:
            assert out[i][0] is None, i
            assert out[i][1] is False, i
        else:
            want = round((y * n - s1) / math.sqrt(n * s2 - s1 * s1) * 1e6)
            assert out[i] == (want, abs(want) > 3_000_000), i
    assert out[8][1] is True  # the planted spike flags


def test_rolling_zscore_zero_variance_history_is_null(spark):
    from batch_processing_on_aws_spark.operators.timeseries import (
        rolling_zscore,
    )

    df = spark.createDataFrame(
        [("a", i, 5) for i in range(6)], "k string, x long, y long"
    )
    rows = rolling_zscore(df, "y", "x", ("k",), min_points=3).collect()
    assert all(r["z_micro"] is None for r in rows)
    assert all(r["is_anomaly"] is False for r in rows)


def test_rolling_zscore_magnitude_guard_fails_loudly(spark):
    """|y| beyond ⌊√2⁶³⌋/window would silently wrap the BIGINT
    variance term n·Σy² − (Σy)² under non-ANSI Spark — the op must
    raise, not emit garbage z-scores (ADVICE round-8)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from batch_processing_on_aws_spark.operators.timeseries import (
        rolling_zscore,
    )

    big = 10**12  # the docstring's old micro-quantized scale: overflows
    df = spark.createDataFrame(
        [("a", i, big + i) for i in range(30)], "k string, x long, y long"
    )
    with pytest.raises(SparkRuntimeException, match="exact-BIGINT bound"):
        rolling_zscore(df, "y", "x", ("k",), window=24).collect()
    # in-bounds magnitudes keep working
    ok = 3_037_000_499 // 24
    df2 = spark.createDataFrame(
        [("a", i, ok - i) for i in range(30)], "k string, x long, y long"
    )
    assert rolling_zscore(df2, "y", "x", ("k",), window=24).count() == 30


def test_unkeyed_series_ops_require_bounded_input_declaration(spark):
    """partition_cols=() without bounded_input=True must raise for all
    three window-backed series ops — the silent global single-reducer
    window is no longer reachable from the public API."""
    from batch_processing_on_aws_spark.operators.timeseries import (
        interpolate_linear,
        rolling_zscore,
    )

    df = spark.createDataFrame(
        [(i, i * 2) for i in range(5)], "x long, y long"
    )
    with pytest.raises(ValueError, match="single-reducer"):
        fill_forward(df, ("y",), order_col="x")
    with pytest.raises(ValueError, match="single-reducer"):
        interpolate_linear(df, "y", "x")
    with pytest.raises(ValueError, match="single-reducer"):
        rolling_zscore(df, "y", "x")
    # the declaration unlocks the bounded unkeyed form
    assert fill_forward(
        df, ("y",), order_col="x", bounded_input=True
    ).count() == 5
    assert interpolate_linear(df, "y", "x", bounded_input=True).count() == 5
    assert rolling_zscore(df, "y", "x", bounded_input=True).count() == 5


def test_mad_anomaly_hand_computed(spark):
    from batch_processing_on_aws_spark.operators.timeseries import mad_anomaly

    # series: 12 quiet points around 10 plus one 100x spike
    ys = [10, 11, 9, 10, 12, 10, 8, 10, 11, 10, 9, 1000]
    rows = [("a", i, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = {r["x"]: r for r in mad_anomaly(
        df, "y", "x", ("grp",), k=5, min_points=12).collect()}
    # sorted ys: 8,9,9,10,10,10,10,10,11,11,12,1000 -> lower median
    # is the 6th element = 10; deviations sorted:
    # 0,0,0,0,0,1,1,1,1,2,2,990 -> lower median (6th) = 1
    assert out[0]["median"] == 10 and out[0]["mad"] == 1
    flagged = {x for x, r in out.items() if r["is_anomaly"]}
    # |y-10| > 5*1 flags only the spike
    assert flagged == {11}
    # robustness: the spike did not drag the baseline (z-score would
    # have sigma ~ 285 here and flag nothing)


def test_mad_anomaly_min_points_and_zero_mad(spark):
    from batch_processing_on_aws_spark.operators.timeseries import mad_anomaly

    rows = [("s", i, 5) for i in range(6)] + [("s", 6, 7)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    # 7 points < min_points=12: flags are NULL, stats still reported
    out = mad_anomaly(df, "y", "x", ("grp",), min_points=12).collect()
    assert all(r["is_anomaly"] is None for r in out)
    assert all(r["median"] == 5 and r["mad"] == 0 for r in out)
    # with min_points met, MAD=0 flags every off-median point (Hampel
    # with zero spread)
    out2 = {r["x"]: r for r in mad_anomaly(
        df, "y", "x", ("grp",), min_points=5).collect()}
    assert {x for x, r in out2.items() if r["is_anomaly"]} == {6}


def test_mad_anomaly_requires_partitioning_declaration(spark):
    import pytest

    from batch_processing_on_aws_spark.operators.timeseries import mad_anomaly

    df = spark.createDataFrame([(1, 1)], ["x", "y"])
    with pytest.raises(ValueError, match="GLOBAL single-reducer"):
        mad_anomaly(df, "y", "x", ())


def test_quarantine_split_routes_and_tags(spark):
    from batch_processing_on_aws_spark.operators.constraints import (
        quarantine_split,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, 10, "ok"),          # clean
        (2, -5, "ok"),          # fails v_nonneg
        (3, None, "ok"),        # NULL predicate -> quarantined
        (4, -1, None),          # fails both
    ]
    df = spark.createDataFrame(rows, ["id", "v", "s"])
    clean, bad = quarantine_split(
        df,
        {"v_nonneg": F.col("v") >= 0, "s_known": F.col("s") == "ok"},
    )
    assert [r["id"] for r in clean.orderBy("id").collect()] == [1]
    got = {r["id"]: r["violations"] for r in bad.collect()}
    assert got == {
        2: "v_nonneg",
        3: "v_nonneg",
        4: "v_nonneg,s_known",
    }
    # conservation: every input row lands on exactly one side
    assert clean.count() + bad.count() == df.count()


def test_mad_anomaly_invariant_under_repartition(spark):
    from batch_processing_on_aws_spark.operators.timeseries import mad_anomaly

    rows = [("g%d" % (i % 3), i, (i * 7919) % 100) for i in range(90)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    a = sorted(
        tuple(r)
        for r in mad_anomaly(df, "y", "x", ("grp",), min_points=5).collect()
    )
    b = sorted(
        tuple(r)
        for r in mad_anomaly(
            df.repartition(13), "y", "x", ("grp",), min_points=5
        ).collect()
    )
    assert a == b and len(a) == 90


def test_seasonal_decompose_recovers_planted_weekly_pattern(spark):
    from batch_processing_on_aws_spark.operators.timeseries import (
        seasonal_decompose,
    )

    # planted series: base 100, +50 on phase 0 days, one spike at x=17
    rows = []
    for x in range(28):
        y = 100 + (50 if x % 7 == 0 else 0) + (900 if x == 17 else 0)
        rows.append(("s", x, y))
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = {r["x"]: r for r in seasonal_decompose(
        df, "y", "x", ("grp",), period=7, trend_window=7).collect()}
    assert len(out) == 28
    # additivity invariant holds on every row
    for r in out.values():
        assert r["y"] == r["trend"] + r["seasonal"] + r["residual"]
    # the weekly +50 is absorbed by the seasonal component, not the
    # residual: phase-0 rows (except edge effects) have residual 0
    assert out[7]["seasonal"] - out[8]["seasonal"] == 50
    assert out[7]["residual"] == 0
    # the one-off spike survives into the residual (the anomaly signal)
    assert out[17]["residual"] >= 800
    # a quiet mid-series day decomposes exactly: trend 100, flat phase
    assert out[10]["trend"] == 100 and out[10]["residual"] == 0
